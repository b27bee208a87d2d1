package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.sources.Tables

/** Text-analysis queries over `documents` (training-data pipeline ops):
  * token counting (whitespace + BPE-ish), language-ID by stopword voting,
  * quality scoring, document fingerprinting. All pure column math — they
  * run at scan speed map-side with zero shuffles.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_count" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("tok_ws"),
        TextOps.tokenCountBpe(col("text")).as("tok_bpe"))
    }),

    "q_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
    }),

    "q_quality" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))
    }),

    // the SAME token count through the native codegen'd Expression
    // (graft.functions.TokenCount) — one fused pass, no array
    // materialization; validated against the identical DuckDB oracle.
    "q_token_count_native" -> ((s, dir) => {
      graft.functions.GraftExtensions.ensure(s)
      Tables.documents(s, dir).select(
        col("doc_id"),
        expr("graft_token_count(text)").as("tok_ws"))
    }),

    // rolling polynomial fingerprint (xxhash64-based → rows-only check;
    // stability/sensitivity asserted in TextOpsSpec).
    "q_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.fingerprint(regexp_replace(upper(col("text")), " ", "  ")).as("fp_noisy"))
    }))

  private val wordsSql =
    "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}'']+'), w -> len(w) > 0)"

  private def hitsSql(stops: Seq[String]) =
    s"len(list_intersect($wordsSql, [${stops.map(w => s"'$w'").mkString(",")}]))"

  private val lex: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "para", "con", "que", "por"),
    "it" -> Seq("il", "la", "di", "e", "che", "per", "con", "una", "sono", "del"))

  val oracles: Map[String, String] = Map(
    "q_token_count_native" ->
      s"""SELECT doc_id, CAST(len($wordsSql) AS INT) AS tok_ws
         |FROM documents""".stripMargin,
    "q_token_count" ->
      s"""SELECT doc_id,
         |  len($wordsSql) AS tok_ws,
         |  CAST(coalesce(list_sum(list_transform(
         |    list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0),
         |    w -> CAST(ceil(len(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS tok_bpe
         |FROM documents""".stripMargin,
    "q_lang_id" -> {
      val hitCols = lex.map { case (l, st) => s"${hitsSql(st)} AS h_$l" }.mkString(",\n  ")
      // first-max-wins in lexicon order = the Spark reduceLeft semantics
      val caseChain = lex.map { case (l, _) => s"WHEN h_$l = m THEN '$l'" }.mkString(" ")
      s"""SELECT doc_id, lang,
         |  CASE WHEN m = 0 THEN 'und' $caseChain END AS lang_pred
         |FROM (
         |  SELECT doc_id, lang,
         |    greatest(${lex.map("h_" + _._1).mkString(", ")}) AS m,
         |    ${lex.map("h_" + _._1).mkString(", ")}
         |  FROM (SELECT doc_id, lang,
         |    $hitCols
         |  FROM documents))""".stripMargin
    },
    "q_quality" -> {
      val allStops = lex.flatMap(_._2).distinct.map(w => s"'$w'").mkString(",")
      s"""SELECT doc_id, round((
         |    least(len0 / 200.0, 1.0)
         |  + CASE WHEN len0 > 0 THEN alpha / len0 ELSE 0.0 END
         |  + (1.0 - least(CASE WHEN len0 > 0 THEN punct / len0 * 10 ELSE 1.0 END, 1.0))
         |  + least(CASE WHEN nw > 0 THEN stop_hits / nw * 5 ELSE 0.0 END, 1.0)
         |  + CASE WHEN (CASE WHEN nw > 0 THEN alpha / nw ELSE 0.0 END) BETWEEN 3 AND 10
         |         THEN 1.0 ELSE 0.5 END
         |  ) / 5.0, 4) AS quality
         |FROM (
         |  SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS len0,
         |    CAST(len($wordsSql) AS DOUBLE) AS nw,
         |    CAST(length(regexp_replace(text, '[^\\p{L}]', '', 'g')) AS DOUBLE) AS alpha,
         |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         |    CAST(len(list_intersect($wordsSql, [$allStops])) AS DOUBLE) AS stop_hits
         |  FROM documents)""".stripMargin
    }
  )
}
