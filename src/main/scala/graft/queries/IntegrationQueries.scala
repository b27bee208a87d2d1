package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Errors, Subprocess}
import graft.sources.Tables

/** Oracle-checked queries for the integration processor family
  * (SURVEY.md §2.4 `subprocess`): operators that bridge to the world
  * outside the JVM while keeping the plan distributed.
  */
object IntegrationQueries {
  private val T = Tables.TranscriptsCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // subprocess processor (internal/old/processor/subprocess.go): pipe
    // every turn's text through one awk per partition; stdout replaces the
    // message. awk's toupper over ASCII matches DuckDB's upper exactly.
    "q_subprocess" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Subprocess.pipe(df, Seq("awk", "-W", "interactive", "{ print toupper($0); fflush(); }"))
        .select(col("conv_id"), col("turn_idx"), col("text").as("text_up"),
          col(Errors.ErrCol).as("err"))
    }))

  val oracles: Map[String, String] = Map(
    "q_subprocess" -> (T +
      """SELECT conv_id, turn_idx, upper(text) AS text_up,
        |  CAST(NULL AS VARCHAR) AS err
        |FROM transcripts""".stripMargin))
}
