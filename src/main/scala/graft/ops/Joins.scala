package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes (SURVEY.md §2.5). The reference has no general relational
  * join; its three restricted shapes are all keyed equi-joins, which Spark
  * covers natively. We keep the reference's merge-strategy semantics.
  */
object Joins {

  /** Collision strategies of the `sequence` input's sharded join
    * (reference: internal/impl/pure/input_sequence.go:190-218): when a key
    * exists in both inputs, `replace` keeps the later input's value, `keep`
    * keeps the earlier one, `array` collects both.
    */
  sealed trait Merge
  case object Replace extends Merge
  case object Keep extends Merge
  case object Collect extends Merge

  /** sharded join, `type: full-outter` (input_sequence.go:153,230-291):
    * all keys from both inputs flush; value columns merged per strategy.
    * The reference shards the key space over `iterations` passes to bound
    * single-process memory — unnecessary here: the shuffle hash-partitions
    * the key space across executors, which IS the sharding, done once.
    *
    * `valueCols` are the columns to merge (same names on both sides);
    * remaining non-key columns must be disjoint.
    */
  def shardedJoin(
      first: DataFrame,
      last: DataFrame,
      key: Seq[String],
      valueCols: Seq[String],
      merge: Merge,
      joinType: String = "full_outer"): DataFrame = {
    val l = valueCols.foldLeft(first) { (d, c) => d.withColumnRenamed(c, s"__l_$c") }
    val r = valueCols.foldLeft(last) { (d, c) => d.withColumnRenamed(c, s"__r_$c") }
    val joined = l.join(r, key, joinType)
    valueCols.foldLeft(joined) { (d, c) =>
      val (lc, rc) = (col(s"__l_$c"), col(s"__r_$c"))
      val merged = merge match {
        case Replace => coalesce(rc, lc)
        case Keep => coalesce(lc, rc)
        case Collect =>
          filter(array(lc.cast("string"), rc.cast("string")), _.isNotNull)
      }
      d.withColumn(c, merged).drop(s"__l_$c", s"__r_$c")
    }
  }

  /** sharded join, `type: outter` (input_sequence.go:372-399): only keys
    * touched by the LAST input flush — a right-outer join with the same
    * merge strategies.
    */
  def shardedJoinOutter(
      first: DataFrame,
      last: DataFrame,
      key: Seq[String],
      valueCols: Seq[String],
      merge: Merge): DataFrame =
    shardedJoin(first, last, key, valueCols, merge, "right_outer")

  /** Hydration join (cookbook config/examples/joining_streams.yaml:23-56):
    * child rows joined to their parent's payload by key. Batch form; the
    * streaming form is graft.streaming.SessionJoin (stateful, same output).
    *
    * `broadcastParents` — set when the parent side is dimension-sized
    * (fits executor memory): the fact side is then never shuffled. Left
    * off, AQE may still pick a broadcast at runtime from observed sizes;
    * the explicit knob is for parents known small a priori.
    */
  def hydrate(
      children: DataFrame,
      parents: DataFrame,
      key: Seq[String],
      parentPayload: Map[String, String],
      broadcastParents: Boolean = false): DataFrame = {
    val dim = parents.select(key.map(col) ++
      parentPayload.map { case (from, to) => col(from).as(to) }: _*)
    children.join(if (broadcastParents) broadcast(dim) else dim, key, "left")
  }
}
