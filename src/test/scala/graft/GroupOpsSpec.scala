package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model.Turn
import graft.ops.GroupOps

/** Golden tests ported from the reference corpus (FIXTURES.md §2):
  * the windowed.yaml batch-reduce values, select_parts negative indexing,
  * archive/unarchive round-trip, group_by first-match routing,
  * bounds_check.
  */
class GroupOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def turn(c: String, i: Int, text: String): Turn =
    Turn(c, i, "user", text, null, new Timestamp(1704067200000L + i * 1000))

  test("windowed.yaml golden: counts {243,71,10,333,164} -> sum 821, max 333") {
    // reference: config/test/bloblang/windowed.yaml:1-28 — a batch of 5
    // docs with `count` values reduced by from_all().sum() / .max()
    val counts = Seq(243, 71, 10, 333, 164)
    val df = counts.zipWithIndex.map { case (v, i) => ("g", i, v) }
      .toDF("key", "idx", "count")
    val out = GroupOps.reduceBatch(df, col("key"), col("count"))
      .select("sum", "max", "min", "n").as[(Long, Int, Int, Long)].head()
    assert(out == ((821L, 333, 10, 5L)))
  }

  test("selectParts keeps positions 0, 1 and -1 (negative = from end)") {
    val df = (0 until 6).map(i => turn("c1", i, s"t$i")).toDF()
    val kept = GroupOps.selectParts(df, col("conv_id"), col("turn_idx"), Seq(0, 1, -1))
      .select("turn_idx").as[Int].collect().sorted
    assert(kept.toSeq == Seq(0, 1, 5))
  }

  test("selectParts on a single-row group does not duplicate the row") {
    val df = Seq(turn("c1", 0, "only")).toDF()
    assert(GroupOps.selectParts(df, col("conv_id"), col("turn_idx"), Seq(0, -1)).count() == 1)
  }

  test("archive/unarchive round-trips to the original rows in order") {
    val df = (0 until 5).map(i => turn("c1", i, s"payload-$i")).toDF()
    val packed = GroupOps.archive(df, col("conv_id"), col("turn_idx"), col("text"))
    assert(packed.select(col("archived")).head.getSeq[String](0) ==
      (0 until 5).map(i => s"payload-$i"))
    val back = GroupOps.unarchive(packed.select("conv_id", "archived"), col("archived"))
      .select("turn_idx", "payload").as[(Int, String)].collect().sortBy(_._1)
    assert(back.toSeq == (0 until 5).map(i => (i, s"payload-$i")))
  }

  test("groupBy routes to the FIRST matching check and drops unmatched") {
    // reference: internal/old/processor/group_by.go:90-92 (first match),
    // :148-199 (unmatched rows go to no group)
    val df = Seq(
      ("a", 1), ("b", 2), ("ab", 3), ("x", 4)
    ).toDF("tag", "v")
    val got = GroupOps.groupBy(df, Seq(
      "has_a" -> col("tag").contains("a"),
      "has_b" -> col("tag").contains("b")))
      .select("tag", "group").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "has_a", "b" -> "has_b", "ab" -> "has_a"))
    // "x" dropped entirely
  }

  test("boundsCheck drops whole groups and oversized rows") {
    val small = (0 until 2).map(i => turn("small", i, "x" * 20))
    val ok = (0 until 4).map(i => turn("ok", i, "y" * 20))
    val bigRow = turn("ok2", 0, "z" * 500) +: (1 until 4).map(i => turn("ok2", i, "w" * 20))
    val df = (small ++ ok ++ bigRow).toDF()
    val kept = GroupOps.boundsCheck(df, col("conv_id"), col("text"), 3, 10, 1, 100)
      .select("conv_id").as[String].collect()
    assert(!kept.contains("small")) // group too small
    assert(kept.count(_ == "ok") == 4)
    assert(kept.count(_ == "ok2") == 3) // oversized row dropped, group kept
  }
}
