package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every operator family from SURVEY.md §2 gets a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql` (prefixed
  * with Tables.TranscriptsCte when they run over the derived transcripts
  * table). Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing.
  */
object SparkEntry {
  private val T = Tables.TranscriptsCte

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Per-conversation 1h tumbling window: turn count, distinct tools, char
    * volume (the reference's system_window traffic-light example transposed,
    * internal/impl/pure/buffer_system_window.go:96-127).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_tumbling_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.7 reduce pattern over a tumbling event-time window.
    "q_tumbling_agg" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"), window(col("ts"), "1 hour").getField("start").as("w"))
        .agg(
          count(lit(1)).as("n_turns"),
          count(col("tool")).as("n_tool_turns"),
          sum(length(col("text"))).as("sum_chars"))
        .select(col("conv_id"), unix_timestamp(col("w")).as("window_start"),
          col("n_turns"), col("n_tool_turns"), col("sum_chars"))
    }),
    // §2.7 group_by_value: canonical groupBy(conv_id) reduce.
    "q_group_by_value" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          count(lit(1)).as("n_turns"),
          countDistinct(col("tool")).as("n_tools"),
          max(col("turn_idx")).as("max_idx"),
          sum(length(col("text"))).as("sum_chars"))
    }),
    // TPC-H-ish pricing summary: plain hash aggregate (map-side combine).
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_tumbling_agg" ->
      (T + """SELECT conv_id,
        |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  count(*) AS n_turns,
        |  count(tool) AS n_tool_turns,
        |  sum(length(text)) AS sum_chars
        |FROM transcripts GROUP BY 1, 2""".stripMargin),
    "q_group_by_value" ->
      (T + """SELECT conv_id, count(*) AS n_turns,
        |  count(DISTINCT tool) AS n_tools,
        |  max(turn_idx) AS max_idx,
        |  sum(length(text)) AS sum_chars
        |FROM transcripts GROUP BY 1""".stripMargin),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
