package graft

import org.apache.spark.sql.functions._
import graft.ops.{Awk, Errors}

/** awk processor (reference: internal/old/processor/awk.go; portable cases
  * from awk_test.go — the goawk custom-function cases are out of scope,
  * see Awk.scala scaladoc).
  */
class AwkSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String, program: String, codec: String,
      meta: Map[String, String] = Map.empty): (String, String) = {
    val df0 = Seq(text).toDF("text")
    val df = if (meta.isEmpty) df0 else df0.withColumn("meta",
      map(meta.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*))
    val out = Awk.proc(df, program, codec,
      metaCol = if (meta.isEmpty) None else Some("meta"))
    val r = out.select(col("text"), col(Errors.ErrCol)).head()
    (r.getString(0), r.getString(1))
  }

  test("""text codec: program output replaces the message (awk_test.go "print 2nd word plus meta")""") {
    assert(one("hello world", """{ print $2 " " meta_foo }""", "text",
      Map("meta.foo" -> "12")) == (("world 12", null)))
  }

  test("""json codec: flattened variables (awk_test.go "json codec" cases)""") {
    assert(one("""{"obj":{"foo":"hello"}}""", "{ print obj_foo }", "json") == (("hello", null)))
    assert(one("""{"obj":{"foo":"hello"}}""", """{ print obj_foo " " meta_foo }""", "json",
      Map("meta.foo" -> "12")) == (("hello 12", null)))
    // arrays overwrite at the parent path (flattenForAWK awk.go:625-630)
    assert(one("""{"obj":[{"foo":11},{"foo":12}]}""", "{ print obj_foo }", "json")
      == (("12", null)))
  }

  test("empty output leaves the message unchanged; a bare newline replaces with empty (awk.go:838-846)") {
    assert(one("hello world", "{ }", "text") == (("hello world", null)))
    assert(one("hello world", """{ print "" }""", "text") == (("", null)))
  }

  test("multi-line stdout replaces as a whole with one trailing newline stripped") {
    assert(one("a b", """{ print $1; print $2 }""", "text") == (("a\nb", null)))
  }

  test("json parse failure marks the row failed and keeps content (awk.go:793-797)") {
    val (t, e) = one("not json content", "{ print 1 }", "json")
    assert(t == "not json content" && e != null && e.contains("json"))
  }

  test("awk syntax error marks the row failed") {
    val (t, e) = one("x", "{ this is not awk", "text")
    assert(t == "x" && e != null)
  }

  test("BEGIN/END run per message (fresh interpreter per part)") {
    val df = Seq("a", "b").toDF("text")
    val out = Awk.proc(df, """END { print NR " lines" }""", "text")
      .select("text").as[String].collect().sorted
    assert(out.toSeq == Seq("1 lines", "1 lines"))
  }
}
