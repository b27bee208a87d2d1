package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Windowing (SURVEY.md §2.8): the reference's `system_window` buffer
  * (reference: internal/impl/pure/buffer_system_window.go) as event-time
  * windows. Works identically on batch DataFrames and streaming ones (add
  * `withWatermark` upstream for streaming state eviction).
  *
  * Scale note: every aggregation here shuffles once on (key, window) — the
  * same hash partitioning AQE reuses downstream. Sliding windows multiply
  * rows by size/slide BEFORE the shuffle (Spark's `window()` is a
  * generator), which is the correct trade at 100 TB: the expansion is
  * map-side and pipelined, never materialized.
  */
object Windows {

  /** Tumbling window (buffer_system_window.go:236-266 alignment math):
    * aligned to the UTC epoch rounded by `size`, optional `offset`.
    */
  def tumbling(df: DataFrame, ts: Column, size: String, offset: String = "0 seconds"): DataFrame =
    df.withColumn("window", window(ts, size, size, offset))

  /** Sliding window (docs lines 33-35): slide < size, a row enters
    * size/slide windows.
    */
  def sliding(df: DataFrame, ts: Column, size: String, slide: String): DataFrame =
    df.withColumn("window", window(ts, size, slide))

  /** The reference stamps every flushed row with `window_end_timestamp`
    * metadata (buffer_system_window.go line 376); we expose the same as a
    * real column.
    */
  def stampWindowEnd(df: DataFrame): DataFrame =
    df.withColumn("window_end_timestamp", col("window").getField("end"))

  /** Sessionization in batch form: a new session starts when the gap to the
    * previous turn in the conversation exceeds `gapSeconds`. This is the
    * batch-equivalent of `session_window()` / the stateful session join
    * (streaming variant in graft.streaming.SessionJoin) and is what the
    * cross-engine oracles verify.
    *
    * One shuffle on conv_id; both window functions and the later groupBy
    * reuse the same partitioning.
    */
  def sessionize(
      df: DataFrame,
      key: Column,
      ts: Column,
      gapSeconds: Long,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts +: tieBreak: _*)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull || unix_timestamp(ts) - unix_timestamp(prev) > gapSeconds, 1)
      .otherwise(0)
    df.withColumn(
      "session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - lit(1))
  }

  /** Watermark + tumbling aggregation — the full streaming shape of the
    * reference's window buffer + windowed reduce example
    * (buffer_system_window.go:96-127). `lateness` maps the reference's
    * `allowed_lateness` (config lines 71-74); Spark's watermark is
    * data-driven rather than wall-clock (SURVEY.md §7.4 risk 2).
    */
  def windowedAgg(
      df: DataFrame,
      key: Column,
      tsCol: String,
      size: String,
      lateness: String,
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(key, window(col(tsCol), size))
      .agg(aggs.head, aggs.tail: _*)
}
