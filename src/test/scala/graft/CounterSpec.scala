package graft

import org.apache.spark.sql.functions._
import graft.ops.Transforms

/** count(name) function (reference: internal/bloblang/query/functions.go:233
  * — "a counter starting at 1 which increments after each time it is
  * called"): the distributed ordinal over an explicit total order.
  */
class CounterSpec extends SparkTestBase {
  import spark.implicits._

  test("counter stamps 1..N in the named order, independent of input partitioning") {
    val df = (1 to 100).map(i => (s"k-${100 - i}", i)).toDF("k", "v").repartition(7)
    val out = Transforms.counter(df, Seq(col("v")), "cnt")
      .select("v", "cnt").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == (1L to 100L))
    // order named by a different key reverses the ordinals
    val byK = Transforms.counter(df, Seq(col("k")), "cnt")
      .select("k", "cnt").as[(String, Long)].collect().sortBy(_._1)
    assert(byK.map(_._2).toSeq == (1L to 100L))
  }

  test("counter shuffles by RANGE, never a single-partition window") {
    val df = (1 to 1000).map(i => (i, i % 13)).toDF("v", "g").repartition(8)
    // the shape counter builds internally: range exchange + local sort —
    // AQE may coalesce tiny inputs, but the partitioning is never Single
    val plan = df.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert(!plan.contains("SinglePartition"))
    val out = Transforms.counter(df, Seq(col("v")), "cnt")
    assert(out.agg(max(col("cnt")), min(col("cnt"))).as[(Long, Long)].head() == ((1000L, 1L)))
  }
}
