package graft

import org.apache.spark.sql.functions._
import graft.blob.Blob
import graft.ops.GroupOps

/** The archive/unarchive format family beyond json_array (reference
  * archive.go footnotes: concatenate, lines, binary, tar, zip) and the
  * full compress algorithm set (compress.go:38-42).
  */
class ArchiveFormatsSpec extends SparkTestBase {
  import spark.implicits._

  private val parts = Seq(Seq("alpha", "beta", "gamma")).toDF("parts")

  test("lines joins with newline and round-trips") {
    val got = parts.select(
      GroupOps.archiveLines(col("parts")).as("blob"))
      .select(GroupOps.unarchiveLines(col("blob")))
      .as[Seq[String]].head()
    assert(got == Seq("alpha", "beta", "gamma"))
  }

  test("concatenate joins raw bytes") {
    val got = parts.select(
      GroupOps.archiveConcatenate(col("parts")).cast("string"))
      .as[String].head()
    assert(got == "alphabetagamma")
  }

  test("binary format is big-endian framed and round-trips") {
    val bin = parts.select(transform(col("parts"), p => p.cast("binary")).as("p"))
      .select(GroupOps.archiveBinary(col("p")).as("blob"))
    val blob = bin.select(col("blob")).as[Array[Byte]].head()
    // 4-byte BE count = 3, then len("alpha") = 5
    assert(blob.take(4).toSeq == Seq[Byte](0, 0, 0, 3))
    assert(blob.slice(4, 8).toSeq == Seq[Byte](0, 0, 0, 5))
    val rt = bin.select(GroupOps.unarchiveBinary(col("blob")).as("p"))
      .select(transform(col("p"), x => x.cast("string")))
      .as[Seq[String]].head()
    assert(rt == Seq("alpha", "beta", "gamma"))
  }

  test("tar and zip archive (path, content) entries and round-trip in order") {
    val df = Seq((Seq("a.json", "b.json"), Seq("one", "two"))).toDF("paths", "texts")
      .select(col("paths"), transform(col("texts"), t => t.cast("binary")).as("contents"))
    for ((arc, unarc) <- Seq(
        (GroupOps.archiveTar, GroupOps.unarchiveTar),
        (GroupOps.archiveZip, GroupOps.unarchiveZip))) {
      val got = df.select(arc(col("paths"), col("contents")).as("blob"))
        .select(unarc(col("blob")).as("entries"))
        .select(transform(col("entries"),
          e => struct(e.getField("_1"), e.getField("_2").cast("string"))))
        .as[Seq[(String, String)]].head()
      assert(got == Seq(("a.json", "one"), ("b.json", "two")))
    }
  }

  test("json_documents decodes a concatenated stream with Go-sorted re-marshal") {
    val blob = """{"b":1,"a":{"z":2,"y":[1,2]}} "x"
                 |[true,null] 3.5""".stripMargin
    val got = Seq(blob).toDF("blob")
      .select(GroupOps.unarchiveJsonDocuments(col("blob")))
      .as[Seq[String]].head()
    // each document re-marshaled compact with object keys sorted at every
    // level — the reference's SetJSON + Go json.Marshal shape
    assert(got == Seq("""{"a":{"y":[1,2],"z":2},"b":1}""", "\"x\"", "[true,null]", "3.5"))
    // malformed stream fails the whole part (error-flag contract)
    val bad = Seq("""{"a":1} {"b":""").toDF("blob")
      .select(GroupOps.unarchiveJsonDocuments(col("blob")).as("d"))
    assert(bad.filter(col("d").isNull).count() == 1)
  }

  test("json_map explodes entries with raw JSON slices and archive_key") {
    val got = Seq("""{"b":{"x":1},"a":[1,2],"c":"s"}""").toDF("blob")
      .select(explode(GroupOps.unarchiveJsonMap(col("blob"))).as("e"))
      .select(col("e.key"), col("e.value"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("b", """{"x":1}"""), ("a", "[1,2]"), ("c", "s")))
    // a non-object blob is the reference's invalid-type error → null
    val bad = Seq("[1,2]").toDF("blob")
      .select(GroupOps.unarchiveJsonMap(col("blob")).as("e"))
    assert(bad.filter(col("e").isNull).count() == 1)
  }

  test("csv parses RFC 4180 with header; ragged/bare-quote rows fail the part") {
    val blob = "id,name,note\r\n" +
      "1,\"al,pha\",plain\n" +
      "\n" + // blank line skipped
      "2,beta,\"say \"\"hi\"\"\"\n" +
      "3,gamma,\"line1\nline2\"\n"
    val got = Seq(blob).toDF("blob")
      .select(posexplode(GroupOps.unarchiveCsv(col("blob"))))
      .select(col("pos"), col("col")("id"), col("col")("name"), col("col")("note"))
      .as[(Int, String, String, String)].collect().toSeq
    assert(got == Seq(
      (0, "1", "al,pha", "plain"),
      (1, "2", "beta", "say \"hi\""),
      (2, "3", "gamma", "line1\nline2")))
    // reference error contract: ragged row / bare quote / trailing chars
    // after a closing quote each fail the WHOLE part
    for (bad <- Seq("a,b\n1,2,3\n", "a,b\n1,x\"y\n", "a,b\n1,\"x\"y\n", "a,b\n1,\"x\n"))
      assert(Seq(bad).toDF("blob")
        .select(GroupOps.unarchiveCsv(col("blob")).as("r"))
        .filter(col("r").isNull).count() == 1, s"expected null for: $bad")
    // empty blob → zero parts (EOF before the header row)
    assert(Seq("").toDF("blob")
      .select(size(GroupOps.unarchiveCsv(col("blob")))).as[Int].head() == 0)
    // CRLF collapses to LF even INSIDE quoted fields (Go encoding/csv
    // reader semantics) — the q_unarchive_csv oracle states this collapse
    assert(Seq("h\n\"a\r\nb\"\n").toDF("blob")
      .select(posexplode(GroupOps.unarchiveCsv(col("blob"))))
      .select(col("col")("h")).as[String].head() == "a\nb")
  }

  test("every compress algorithm round-trips; zlib/gzip carry their magic") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val df = Seq(text).toDF("t")
    for (algo <- Seq("gzip", "zlib", "flate", "snappy", "lz4")) {
      val rt = df.select(
        Blob.decompressAlgo(Blob.compressAlgo(col("t"), algo), algo).cast("string"))
        .as[String].head()
      assert(rt == text, s"round-trip failed for $algo")
    }
    val zlibHead = df.select(Blob.compressAlgo(col("t"), "zlib")).as[Array[Byte]].head()
    assert((zlibHead(0) & 0xff) == 0x78) // zlib CMF
    val gzipHead = df.select(Blob.compressAlgo(col("t"), "gzip")).as[Array[Byte]].head()
    assert((gzipHead(0) & 0xff) == 0x1f && (gzipHead(1) & 0xff) == 0x8b)
    // compression actually compresses the repetitive payload
    assert(zlibHead.length < text.length / 4)
  }

  test("chunker codec slices fixed-size chunks, short tail (codec/reader.go:245)") {
    import spark.implicits._
    val df = Seq("abcdefgh", "ab", "").toDF("t")
    val got = df.select(transform(GroupOps.chunker(col("t"), 3), b => b.cast("string")))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("abc", "def", "gh"))
    assert(got(1) == Seq("ab"))
    assert(got(2) == Seq.empty)
  }

  test("regex codec segments before each match (codec/reader.go:254)") {
    import spark.implicits._
    val log = "12:00:01 first line\n12:00:02 second\n12:00:03 third"
    val got = Seq(log).toDF("t")
      .select(GroupOps.regexSegments(col("t"), "(?m)^\\d\\d:\\d\\d:\\d\\d"))
      .as[Seq[String]].head()
    assert(got == Seq("12:00:01 first line\n", "12:00:02 second\n", "12:00:03 third"))
  }

  test("chunker counts bytes, not chars; regex codec preserves NUL bytes") {
    import spark.implicits._
    // "ééé" is 3 chars but 6 UTF-8 bytes → two 3-byte chunks
    val chunks = Seq("ééé").toDF("t")
      .select(GroupOps.chunker(col("t"), 3)).as[Seq[Array[Byte]]].head()
    assert(chunks.map(_.length) == Seq(3, 3))
    assert(chunks.flatten.toSeq == "ééé".getBytes("UTF-8").toSeq)
    // a NUL inside the blob is data, not a segment boundary
    val seg = Seq("a\u0000b\n12:00:00 x").toDF("t")
      .select(GroupOps.regexSegments(col("t"), "(?m)^\\d\\d:\\d\\d:\\d\\d"))
      .as[Seq[String]].head()
    assert(seg == Seq("a\u0000b\n", "12:00:00 x"))
  }

  test("avro to_json/from_json round-trips against a record schema") {
    val schema =
      """{"type":"record","name":"T","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val json = """{"id":7,"name":"grace"}"""
    val df = Seq(json).toDF("j")
    val rt = df.select(
      Blob.avroToJson(Blob.avroFromJson(col("j"), schema), schema))
      .as[String].head()
    assert(rt == json)
    // binary form is the compact Avro encoding, not JSON bytes
    val bin = df.select(Blob.avroFromJson(col("j"), schema)).as[Array[Byte]].head()
    assert(bin.length < json.length)
  }
}
