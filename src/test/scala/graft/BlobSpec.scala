package graft

import org.apache.spark.sql.functions._
import graft.blob.Blob

/** Scalar surface semantics that the DuckDB oracles can't reach: codecs,
  * syslog parse_log, XML, duration parsing, and assorted Bloblang-parity
  * behaviors (capitalize vs initcap, 0-based index, pipe operator).
  */
class BlobSpec extends SparkTestBase {
  import spark.implicits._

  test("gzip round-trips and actually compresses") {
    val text = ("spark " * 200).trim
    val out = Seq(text).toDF("t")
      .select(
        length(Blob.gzipCompress(col("t"))).as("clen"),
        Blob.gzipDecompress(Blob.gzipCompress(col("t"))).cast("string").as("rt"))
      .as[(Int, String)].head()
    assert(out._2 == text)
    assert(out._1 < text.length / 10)
  }

  test("parseSyslog3164 extracts priority, timestamp, host, app, message") {
    val line = "<13>Oct 11 22:14:15 web01 nginx[772]: upstream timed out"
    val got = Seq(line).toDF("l").select(Blob.parseSyslog3164(col("l")).as("s"))
      .select("s.priority", "s.timestamp", "s.hostname", "s.appname", "s.message")
      .as[(Integer, String, String, String, String)].head()
    assert(got == ((13, "Oct 11 22:14:15", "web01", "nginx", "upstream timed out")))
  }

  test("parseXml converts a document to a typed struct") {
    val xml = "<doc><id>7</id><name>alpha</name></doc>"
    val got = Seq(xml).toDF("x")
      .select(Blob.parseXml(col("x"), "id INT, name STRING").as("d"))
      .select("d.id", "d.name").as[(Int, String)].head()
    assert(got == ((7, "alpha")))
  }

  test("parseDuration handles Go-style compound durations") {
    val got = Seq("1h2m3s450ms", "150ms", "2.5s", "junk").toDF("d")
      .select(Blob.parseDuration(col("d"))).as[java.lang.Long].collect().toSeq
    assert(got == Seq(3723450000000L, 150000000L, 2500000000L, null))
  }

  test("capitalize uppercases only the first rune (not initcap)") {
    val got = Seq("hello world").toDF("t")
      .select(Blob.capitalize(col("t"))).as[String].head()
    assert(got == "Hello world") // initcap would yield "Hello World"
  }

  test("index is 0-based like Bloblang; pipe coalesces nulls") {
    val got = Seq((Seq("a", "b", "c"), null: String, "fallback")).toDF("arr", "l", "r")
      .select(Blob.index(col("arr"), lit(1)).as("i"), Blob.pipe(col("l"), col("r")).as("p"))
      .as[(String, String)].head()
    assert(got == (("b", "fallback")))
  }

  test("range is exclusive of stop like Bloblang") {
    val got = Seq(1).toDF("x").select(Blob.range(lit(0), lit(5), lit(1)))
      .as[Seq[Int]].head()
    assert(got == Seq(0, 1, 2, 3, 4))
  }

  test("hash dispatches to the right algorithm") {
    val got = Seq("abc").toDF("t").select(
      Blob.hash(col("t"), "md5"), Blob.hash(col("t"), "sha256"), Blob.hash(col("t"), "crc32"))
      .as[(String, String, Long)].head()
    assert(got._1 == "900150983cd24fb0d6963f7d28e17f72")
    assert(got._2 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(got._3 == 891568578L)
  }
}
