package graft

import org.apache.spark.sql.functions._
import graft.ops.{Errors, Subprocess}

/** subprocess processor (reference: internal/old/processor/subprocess.go;
  * subprocess_test.go TestSubprocessWithSed/TestSubprocessWithErrors,
  * TestSubprocessLineBreaks): replace-on-stdout, fail-on-stderr, per-line
  * round-trips for multi-line messages, and the three framing codecs.
  */
class SubprocessSpec extends SparkTestBase {
  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")

  test("stdout reply replaces the message (subprocess_test.go sed case)") {
    val out = Subprocess.pipe(df("hello", "world"),
      Seq("awk", "-W", "interactive", "{ print toupper($0); fflush(); }"))
      .orderBy("id").select("text", Errors.ErrCol).as[(String, String)].collect()
    assert(out.toSeq == Seq(("HELLO", null), ("WORLD", null)))
  }

  test("stderr reply marks the row failed and keeps content (TestSubprocessWithErrors)") {
    val prog = """{ if ($0 ~ /bad/) { print "oh no" > "/dev/stderr"; fflush("/dev/stderr") }
                  |  else { print toupper($0); fflush() } }""".stripMargin
    val out = Subprocess.pipe(df("fine", "bad thing", "also fine"), Seq("awk", "-W", "interactive", prog))
      .orderBy("id").select("text", Errors.ErrCol).as[(String, String)].collect()
    assert(out(0) == (("FINE", null)))
    assert(out(1)._1 == "bad thing" && out(1)._2 == "oh no")
    assert(out(2) == (("ALSO FINE", null)))
  }

  test("multi-line message round-trips per line, preserving a trailing empty line (TestSubprocessLineBreaks)") {
    val out = Subprocess.pipe(df("foo\nbar", "tail\n", "one"),
      Seq("awk", "-W", "interactive", "{ print toupper($0); fflush(); }"))
      .orderBy("id").select("text").as[String].collect()
    assert(out.toSeq == Seq("FOO\nBAR", "TAIL\n", "ONE"))
  }

  test("netstring codec round-trips through cat (netstringSplitFunc)") {
    val out = Subprocess.pipe(df("hello world", "x,y:z", ""),
      Seq("cat"), codecSend = "netstring", codecRecv = "netstring")
      .orderBy("id").select("text").as[String].collect()
    assert(out.toSeq == Seq("hello world", "x,y:z", ""))
  }

  test("length_prefixed_uint32_be codec round-trips through cat") {
    val out = Subprocess.pipe(df("hello", "with\nnewline inside", ""),
      Seq("cat"), codecSend = "length_prefixed_uint32_be",
      codecRecv = "length_prefixed_uint32_be")
      .orderBy("id").select("text").as[String].collect()
    assert(out.toSeq == Seq("hello", "with\nnewline inside", ""))
  }

  test("null text passes through without a round-trip") {
    val in = Seq((0, "a"), (1, null.asInstanceOf[String])).toDF("id", "text")
    val out = Subprocess.pipe(in, Seq("cat"))
      .orderBy("id").select("text").as[String].collect()
    assert(out.toSeq == Seq("a", null))
  }

  test("unknown codec is rejected (subprocess.go:176)") {
    intercept[IllegalArgumentException] {
      Subprocess.pipe(df("a"), Seq("cat"), codecSend = "nope")
    }
  }
}
