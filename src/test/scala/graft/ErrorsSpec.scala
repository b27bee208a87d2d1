package graft

import org.apache.spark.sql.functions._
import graft.ops.Errors

/** Error-flag routing semantics (SURVEY.md §2.9): mark, try skips failed,
  * catch handles-and-clears, switch first-match, DLQ split — mirroring
  * internal/old/processor/{try,catch,switch}.go.
  */
class ErrorsSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(("r1", 5), ("r2", 50), ("r3", 7)).toDF("id", "v")

  test("markError sets the flag only on failing rows and keeps existing errors") {
    val once = Errors.markError(rows, col("v") > 10, lit("too big"))
    val twice = Errors.markError(once, col("v") > 6, lit("second"))
    val got = twice.select("id", "error").as[(String, String)].collect().toMap
    assert(got == Map("r1" -> null, "r2" -> "too big", "r3" -> "second"))
  }

  test("try applies only to healthy rows; catch handles failed and clears the flag") {
    val marked = Errors.markError(rows, col("v") > 10, lit("boom"))
    val tried = Errors.tryProc(marked, "v", col("v") * 2)
    assert(tried.select("id", "v").as[(String, Int)].collect().toMap ==
      Map("r1" -> 10, "r2" -> 50, "r3" -> 14)) // r2 untouched
    val caught = Errors.catchProc(tried, "v", lit(-1))
    val got = caught.select("id", "v", "error").as[(String, Int, String)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == Map("r1" -> 10, "r2" -> -1, "r3" -> 14))
    assert(got.forall(_._3 == null)) // catch.go:146-149 — flag reset
  }

  test("splitDlq partitions rows by error flag") {
    val marked = Errors.markError(rows, col("v") === 50, lit("dead"))
    val (ok, dlq) = Errors.splitDlq(marked)
    assert(ok.select("id").as[String].collect().toSet == Set("r1", "r3"))
    assert(dlq.select("id").as[String].collect().toSet == Set("r2"))
  }

  test("switch routes to the first matching case with default fallthrough") {
    val df = rows.withColumn("route", lit("default"))
    val out = Errors.switchProc(df, "route", Seq(
      (col("v") < 6) -> lit("small"),
      (col("v") < 10) -> lit("medium")))
      .select("id", "route").as[(String, String)].collect().toMap
    assert(out == Map("r1" -> "small", "r2" -> "default", "r3" -> "medium"))
  }
}
