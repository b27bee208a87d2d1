package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every operator family from SURVEY.md §2 gets a `queries` entry; the
  * SQL-expressible ones also get a DuckDB oracle in `oracleSql` (prefixed
  * with Tables.TranscriptsCte when they run over the derived transcripts
  * table). Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing. Queries without an oracle
  * (xxhash64-based signatures, LSH probes, top-k float boundaries) get the
  * driver's rows-only check and carry their semantic assertions in the
  * ScalaTest suites instead.
  */
object SparkEntry {
  private val T = Tables.TranscriptsCte

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The session join of user turns to assistant/tool replies — the
    * north_star pipeline's core operator, in its batch form.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_session_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    base ++ TransformQueries.queries ++ GroupQueries.queries ++
      WindowQueries.queries ++ JoinQueries.queries ++ DedupeQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++ MultimodalQueries.queries ++
      CacheQueries.queries ++ IntegrationQueries.queries ++ TrainQueries.queries ++
      CepQueries.queries

  def oracleSql: Map[String, String] =
    baseOracles ++ TransformQueries.oracles ++ GroupQueries.oracles ++
      WindowQueries.oracles ++ JoinQueries.oracles ++ DedupeQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      CacheQueries.oracles ++ IntegrationQueries.oracles ++ TrainQueries.oracles ++
      CepQueries.oracles

  /** §2.7 group_by_value + the TPC-H pricing summary (plain hash aggs). */
  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_group_by_value" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(
          count(lit(1)).as("n_turns"),
          countDistinct(col("tool")).as("n_tools"),
          max(col("turn_idx")).as("max_idx"),
          sum(length(col("text"))).as("sum_chars"))
    }),
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    })
  )

  private def baseOracles: Map[String, String] = Map(
    "q_group_by_value" ->
      (T + """SELECT conv_id, count(*) AS n_turns,
        |  count(DISTINCT tool) AS n_tools,
        |  max(turn_idx) AS max_idx,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM transcripts GROUP BY 1""".stripMargin),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
