package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Sharded-join collision strategies and flush types from the reference's
  * sequence input (internal/impl/pure/input_sequence.go:153,190-218,
  * 372-399), plus the hydration join.
  */
class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private val first = Seq(("k1", 10L), ("k2", 20L)).toDF("id", "v")
  private val last = Seq(("k2", 200L), ("k3", 300L)).toDF("id", "v")

  test("full-outter + replace: later input wins on collision, all keys flush") {
    val out = Joins.shardedJoin(first, last, Seq("id"), Seq("v"), Joins.Replace)
      .as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 10L, "k2" -> 200L, "k3" -> 300L))
  }

  test("full-outter + keep: earlier input wins on collision") {
    val out = Joins.shardedJoin(first, last, Seq("id"), Seq("v"), Joins.Keep)
      .as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 10L, "k2" -> 20L, "k3" -> 300L))
  }

  test("full-outter + array: collisions collect both, in input order") {
    val out = Joins.shardedJoin(first, last, Seq("id"), Seq("v"), Joins.Collect)
      .select(col("id"), col("v")).as[(String, Seq[String])].collect().toMap
    assert(out == Map("k1" -> Seq("10"), "k2" -> Seq("20", "200"), "k3" -> Seq("300")))
  }

  test("outter flush type: only keys touched by the LAST input") {
    val out = Joins.shardedJoinOutter(first, last, Seq("id"), Seq("v"), Joins.Replace)
      .as[(String, Long)].collect().toMap
    assert(out == Map("k2" -> 200L, "k3" -> 300L))
  }

  test("hydrate: children carry parent payload; orphans keep nulls") {
    val children = Seq((1L, "c-a"), (1L, "c-b"), (9L, "orphan")).toDF("pid", "ctext")
    val parents = Seq((1L, "parent-one")).toDF("pid", "ptitle")
    val out = Joins.hydrate(children, parents, Seq("pid"), Map("ptitle" -> "title"))
      .select("ctext", "title").as[(String, String)].collect().toMap
    assert(out("c-a") == "parent-one" && out("c-b") == "parent-one")
    assert(out("orphan") == null)
  }
}
