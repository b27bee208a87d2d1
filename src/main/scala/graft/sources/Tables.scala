package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Table readers over the driver-provided parquet dirs (TESTDATA.md) plus
  * the deterministic `transcripts` derivation.
  *
  * The engine's mandated input (BASELINE.json `input_hint`) is a table of
  * multi-turn transcripts (conv_id, turn_idx, role, text, tool, ts). The
  * sandbox test dirs don't ship one, so we derive it deterministically from
  * `events.parquet` with pure relational ops that DuckDB can replicate
  * verbatim — giving every transcript query a cross-engine oracle. The
  * derivation is total-ordered (ts is unique per user in the data; we still
  * tie-break on event_id) so `turn_idx` is stable in both engines.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) derived from events.
    *
    * Scale note: conv_id is computed BEFORE the row_number window and the
    * window partitions by conv_id itself — so the derivation's single
    * hash shuffle carries exactly the partitioning every downstream
    * conv_id-keyed op (sessionize, session join, group_by_value) reuses.
    * Partitioning by user_id instead would force Catalyst to re-shuffle
    * (it cannot prove `conv-{user_id}` preserves co-partitioning).
    */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
      .withColumn("conv_id", concat(lit("conv-"), lpad(col("user_id").cast("string"), 6, "0")))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("turn_idx", (row_number().over(w) - lit(1)).cast("int"))
      .withColumn(
        "role",
        when(col("event_type").isin("click", "view"), "user")
          .when(col("event_type").isin("purchase", "signup"), "assistant")
          .otherwise("tool"))
      .withColumn(
        "tool",
        when(
          col("role") === "tool",
          element_at(array(lit("search"), lit("python"), lit("browser")),
            (pmod(col("event_id"), lit(3)) + lit(1)).cast("int")))
          .otherwise(lit(null).cast("string")))
      .withColumn(
        "text",
        concat(lit("["), col("role"), lit(" "), col("turn_idx").cast("string"), lit("] "),
          col("event_type"), lit(" "), col("props")))
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** DuckDB CTE that reconstructs the same transcripts table; prefix for
    * every transcript oracle: `s"$TranscriptsCte SELECT ... FROM transcripts"`.
    */
  val TranscriptsCte: String =
    """WITH transcripts AS (
      |  SELECT
      |    'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |    CASE WHEN event_type IN ('click','view') THEN 'user'
      |         WHEN event_type IN ('purchase','signup') THEN 'assistant'
      |         ELSE 'tool' END AS role,
      |    '[' || (CASE WHEN event_type IN ('click','view') THEN 'user'
      |                 WHEN event_type IN ('purchase','signup') THEN 'assistant'
      |                 ELSE 'tool' END)
      |        || ' ' || CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS VARCHAR)
      |        || '] ' || event_type || ' ' || props AS text,
      |    CASE WHEN event_type NOT IN ('click','view','purchase','signup')
      |         THEN ['search','python','browser'][CAST(event_id % 3 AS INT) + 1]
      |         ELSE NULL END AS tool,
      |    ts
      |  FROM events
      |)
      |""".stripMargin
}
