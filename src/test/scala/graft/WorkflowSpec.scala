package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Transforms
import graft.ops.Transforms.Branch

/** Workflow automatic DAG resolution (reference
  * internal/old/processor/workflow_branch_map.go:273-302
  * resolveDynamicBranchDAG; branch.go:271-318 targets): tier inference
  * from read/write targets, cycle rejection, duplicate-target rejection,
  * and equality with the explicit-order form.
  */
class WorkflowSpec extends SparkTestBase {
  import spark.implicits._

  private def b(name: String, reads: Set[String], writes: String): Branch =
    Branch(name, reads, writes, _ => lit(1))

  test("resolveDag layers branches by dependency, input-column reads impose no order") {
    val tiers = Transforms.resolveDag(Seq(
      b("d", Set("c1"), "d1"),
      b("c", Set("a1", "b1"), "c1"),
      b("a", Set("text"), "a1"),
      b("b", Set("text"), "b1")))
      .map(_.map(_.name).toSet)
    assert(tiers == Seq(Set("a", "b"), Set("c"), Set("d")))
  }

  test("circular dependencies are rejected with the offending branch names") {
    val e = intercept[IllegalArgumentException] {
      Transforms.resolveDag(Seq(
        b("x", Set("y1"), "x1"),
        b("y", Set("x1"), "y1"),
        b("ok", Set("text"), "z1")))
    }
    assert(e.getMessage.contains("circular dependencies"))
    assert(e.getMessage.contains("x") && e.getMessage.contains("y"))
    assert(!e.getMessage.contains("ok"))
  }

  test("a branch reading its own write target is a cycle") {
    val e = intercept[IllegalArgumentException] {
      Transforms.resolveDag(Seq(b("selfy", Set("s1"), "s1")))
    }
    assert(e.getMessage.contains("selfy"))
  }

  test("two branches writing one target are rejected") {
    val e = intercept[IllegalArgumentException] {
      Transforms.resolveDag(Seq(b("p", Set(), "t"), b("q", Set(), "t")))
    }
    assert(e.getMessage.contains("t"))
  }

  test("workflowAuto equals the explicit-tier workflow on scrambled branches") {
    val df = Seq(("c0", "one two three"), ("c1", "four")).toDF("id", "text")
    val auto = Transforms.workflowAuto(df, Seq(
      Branch("ratio", Set("len", "words"), "ratio",
        _ => round(col("len") / col("words"), 2)),
      Branch("len", Set("text"), "len", _ => length(col("text"))),
      Branch("words", Set("text"), "words", _ => size(split(col("text"), " ")))))
    val explicit = Transforms.workflow(df, Seq(
      Seq("len" -> ((_: DataFrame) => length(col("text"))),
        "words" -> ((_: DataFrame) => size(split(col("text"), " ")))),
      Seq("ratio" -> ((_: DataFrame) => round(col("len") / col("words"), 2)))))
    assert(auto.select("id", "len", "words", "ratio").collect().toSet ==
      explicit.select("id", "len", "words", "ratio").collect().toSet)
  }
}
