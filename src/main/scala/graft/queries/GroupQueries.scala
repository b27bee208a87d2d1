package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GroupOps
import graft.sources.Tables

/** Oracle-checked queries for grouping / batch-shaping (SURVEY.md §2.7,
  * §2.4): group_by routing, group_by_value reduce, archive/unarchive
  * round-trip, select_parts, bounds_check, insert_part, top-k.
  */
object GroupQueries {
  private val T = Tables.TranscriptsCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // group_by: route rows to the FIRST matching predicate group; unmatched
    // dropped (reference: internal/old/processor/group_by.go:90-92,148-199).
    "q_group_by" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      GroupOps.groupBy(df, Seq(
        "tools" -> (col("role") === "tool"),
        "openers" -> (col("turn_idx") === 0),
        "long" -> (length(col("text")) > 50)))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_chars"))
    }),

    // split: re-batch each conversation into chunks of 5 turns; the chunk
    // is a derived batch identity (reference: internal/old/processor/
    // split.go:46-54; physical batching is the trigger's job).
    "q_split" -> ((s, dir) => {
      GroupOps.splitBatches(Tables.transcripts(s, dir), col("conv_id"),
        struct(col("ts"), col("turn_idx")), 5)
        .select(col("conv_id"), col("turn_idx"), col("batch_id"))
    }),

    // archive(json_array): pack each conversation into one ordered row
    // (reference: internal/old/processor/archive.go:59,117).
    "q_archive" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      GroupOps.archive(df, col("conv_id"), col("turn_idx"), col("text"))
        .select(col("conv_id"), size(col("archived")).as("n_parts"),
          array_join(col("archived"), "|").as("joined"))
    }),

    // unarchive: archive → explode back; round-trips to the original rows
    // (reference: internal/old/processor/unarchive.go:50,321-335).
    "q_unarchive" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      val packed = GroupOps.archive(df, col("conv_id"), col("turn_idx"), col("text"))
      GroupOps.unarchive(packed.select("conv_id", "archived"), col("archived"))
        .select(col("conv_id"), col("turn_idx"), col("payload").as("text_rt"))
    }),

    // unarchive(json_map): one JSON object per conversation ("t<idx>" →
    // {role,text}), exploded back to entries — value is the raw JSON slice,
    // key is the reference's archive_key metadata (unarchive.go:242-263).
    "q_unarchive_json_map" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      val packed = df.groupBy(col("conv_id"))
        .agg(sort_array(collect_list(struct(col("turn_idx").as("ord"),
          concat(lit("\"t"), col("turn_idx").cast("string"), lit("\":"),
            to_json(struct(col("role"), col("text")))).as("entry")))).as("es"))
        .withColumn("blob", concat(lit("{"), array_join(col("es.entry"), ","), lit("}")))
      packed.select(col("conv_id"), explode(GroupOps.unarchiveJsonMap(col("blob"))).as("e"))
        .select(col("conv_id"), col("e.key").as("archive_key"),
          get_json_object(col("e.value"), "$.role").as("role"),
          get_json_object(col("e.value"), "$.text").as("text"))
    }),

    // unarchive(json_documents): a stream of concatenated JSON docs per
    // conversation, decoded back to one row per document
    // (unarchive.go:206-221; Go-style sorted-key re-marshal).
    "q_unarchive_json_docs" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      val packed = df.groupBy(col("conv_id"))
        .agg(sort_array(collect_list(struct(col("turn_idx").as("ord"),
          to_json(struct(col("role"), col("text"), col("turn_idx"))).as("doc")))).as("ds"))
        .withColumn("blob", array_join(col("ds.doc"), "\n"))
      packed.select(col("conv_id"),
          posexplode(GroupOps.unarchiveJsonDocuments(col("blob"))))
        .select(col("conv_id"), col("pos").cast("int").as("doc_idx"),
          get_json_object(col("col"), "$.role").as("role"),
          get_json_object(col("col"), "$.turn_idx").cast("int").as("turn_idx"),
          get_json_object(col("col"), "$.text").as("text"))
    }),

    // unarchive(csv): an RFC 4180 csv blob per conversation (header row +
    // one quoted row per turn), parsed back to header→value maps
    // (unarchive.go:265-303). Exercises quote/comma escaping round-trip.
    "q_unarchive_csv" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      def quoted(c: Column): Column = when(c.rlike("[\",\n\r]"),
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))).otherwise(c)
      val packed = df
        .select(col("conv_id"), col("turn_idx"),
          concat_ws(",", col("turn_idx").cast("string"), quoted(col("role")),
            quoted(col("text"))).as("line"))
        .groupBy(col("conv_id"))
        .agg(sort_array(collect_list(struct(col("turn_idx").as("ord"),
          col("line").as("l")))).as("ls"))
        .withColumn("blob",
          concat(lit("turn_idx,role,text\n"), array_join(col("ls.l"), "\n")))
      packed.select(col("conv_id"), posexplode(GroupOps.unarchiveCsv(col("blob"))))
        .select(col("conv_id"), col("pos").cast("int").as("row_idx"),
          col("col")("turn_idx").as("turn_val"),
          col("col")("role").as("role"), col("col")("text").as("text"))
    }),

    // select_parts with negative indexing: first two and last turn of each
    // conversation (reference: internal/old/processor/select_parts.go:55,
    // negative indexes internal/message/message.go:50-56).
    "q_select_parts" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      GroupOps.selectParts(df, col("conv_id"), col("turn_idx"), Seq(0, 1, -1))
        .select("conv_id", "turn_idx", "role")
    }),

    // bounds_check: conversations with 5..60 turns, rows 10..200 chars
    // (reference: internal/old/processor/bounds_check.go:45).
    "q_bounds_check" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      GroupOps.boundsCheck(df, col("conv_id"), col("text"), 5, 60, 10, 200)
        .select("conv_id", "turn_idx")
    }),

    // windowed.yaml reduce shape: collapse each group to one summary row
    // (reference: config/test/bloblang/windowed.yaml:1-28).
    "q_reduce_batch" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      GroupOps.reduceBatch(df, col("conv_id"), length(col("text")))
    }),

    // insert_part: append a constructed summary row per conversation
    // (reference: internal/old/processor/insert_part.go:56).
    "q_insert_part" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "text")
      val synthetic = df.groupBy(col("conv_id"))
        .agg(max(col("turn_idx")).as("mx"), count(lit(1)).as("n"))
        .select(col("conv_id"), (col("mx") + 1).cast("int").as("turn_idx"),
          lit("system").as("role"),
          format_string("[summary] %d turns", col("n")).as("text"))
      GroupOps.insertPart(df, synthetic)
    }),

    // top-k: conversations by turn volume (Catalyst TakeOrderedAndProject —
    // no full sort at scale; not in the reference, free from Spark).
    "q_topk_convs" -> ((s, dir) => {
      Tables.transcripts(s, dir)
        .groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("conv_id"))
        .limit(10)
    }))

  val oracles: Map[String, String] = Map(
    "q_split" -> (T +
      """SELECT conv_id, turn_idx,
        |  CAST((row_number() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) - 1) // 5 AS INT) AS batch_id
        |FROM transcripts""".stripMargin),
    "q_group_by" -> (T +
      """SELECT g AS "group", count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM (SELECT *, CASE WHEN role = 'tool' THEN 'tools'
        |                     WHEN turn_idx = 0 THEN 'openers'
        |                     WHEN length(text) > 50 THEN 'long' END AS g
        |      FROM transcripts)
        |WHERE g IS NOT NULL GROUP BY 1""".stripMargin),
    "q_archive" -> (T +
      """SELECT conv_id, count(*) AS n_parts,
        |  string_agg(text, '|' ORDER BY turn_idx) AS joined
        |FROM transcripts GROUP BY 1""".stripMargin),
    "q_unarchive" -> (T +
      "SELECT conv_id, turn_idx, text AS text_rt FROM transcripts"),
    "q_unarchive_json_map" -> (T +
      """SELECT conv_id, 't' || CAST(turn_idx AS VARCHAR) AS archive_key,
        |  role, text FROM transcripts""".stripMargin),
    "q_unarchive_json_docs" -> (T +
      """SELECT conv_id,
        |  CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS doc_idx,
        |  role, turn_idx, text FROM transcripts""".stripMargin),
    "q_unarchive_csv" -> (T +
      // the csv codec collapses CRLF to LF even inside quoted fields (Go
      // encoding/csv reader semantics) — the oracle states that collapse
      // explicitly so the contract holds for CRLF-bearing text too
      """SELECT conv_id,
        |  CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS INT) AS row_idx,
        |  CAST(turn_idx AS VARCHAR) AS turn_val, role,
        |  replace(text, chr(13) || chr(10), chr(10)) AS text FROM transcripts""".stripMargin),
    "q_select_parts" -> (T +
      """SELECT conv_id, turn_idx, role FROM (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS idx,
        |            count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM transcripts)
        |WHERE idx = 0 OR idx = 1 OR idx = n - 1""".stripMargin),
    "q_bounds_check" -> (T +
      """SELECT conv_id, turn_idx FROM (
        |  SELECT *, count(*) OVER (PARTITION BY conv_id) AS n FROM transcripts)
        |WHERE n BETWEEN 5 AND 60 AND length(text) BETWEEN 10 AND 200""".stripMargin),
    "q_reduce_batch" -> (T +
      """SELECT conv_id, CAST(sum(length(text)) AS BIGINT) AS "sum", max(length(text)) AS "max",
        |  min(length(text)) AS "min", count(*) AS n
        |FROM transcripts GROUP BY 1""".stripMargin),
    "q_insert_part" -> (T +
      """SELECT conv_id, turn_idx, role, text FROM transcripts
        |UNION ALL
        |SELECT conv_id, CAST(max(turn_idx) + 1 AS INT), 'system',
        |  printf('[summary] %d turns', count(*))
        |FROM transcripts GROUP BY conv_id""".stripMargin),
    "q_topk_convs" -> (T +
      """SELECT conv_id, count(*) AS n FROM transcripts GROUP BY 1
        |ORDER BY n DESC, conv_id LIMIT 10""".stripMargin)
  )
}
