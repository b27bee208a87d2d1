package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.blob.Blob
import graft.ops.{Errors, Transforms}
import graft.sources.Tables

/** Oracle-checked queries for the per-row transform family (SURVEY.md §2.4,
  * §2.6, §2.9): bloblang mapping, deleted() filtering, branch enrichment,
  * workflow tiers, grok extraction, scalar function surface, and
  * try/catch/switch error routing.
  */
object TransformQueries {
  private val T = Tables.TranscriptsCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // bloblang mapping processor: ordered computed-field assignments
    // (reference: internal/old/processor/bloblang.go:130-181).
    "q_map_proc" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Transforms.mapProc(df,
        "role_up" -> Blob.uppercase(col("role")),
        "text_len" -> length(col("text")),
        "content_md5" -> Blob.hash(col("text"), "md5"),
        "tag" -> Blob.format("%s#%d", col("conv_id"), col("turn_idx")))
        .select("conv_id", "turn_idx", "role_up", "text_len", "content_md5", "tag")
    }),

    // The Bloblang TEXT engine (blob/Bloblang.scala): an actual reference
    // mapping program, compiled from source, per-row over the transcript
    // JSON — match/method-chain surface vs plain SQL.
    "q_bloblang" -> ((s, dir) => {
      val program =
        """root.shout = this.text.uppercase()
          |root.n_words = this.text.split(" ").length()
          |root.role_tag = match this.role { "user" => "U", "assistant" => "A", _ => "T" }""".stripMargin
      val m = graft.blob.Bloblang.procColumn(program)
      Tables.transcripts(s, dir)
        .select(col("conv_id"), col("turn_idx"),
          m(to_json(struct(col("role"), col("text")))).as("r"))
        .select(col("conv_id"), col("turn_idx"),
          get_json_object(col("r.content"), "$.shout").as("shout"),
          get_json_object(col("r.content"), "$.n_words").cast("int").as("n_words"),
          get_json_object(col("r.content"), "$.role_tag").as("role_tag"))
    }),

    // The SAME program text through the Bloblang → Catalyst translator
    // (BloblangCompiler): native when-chains/string functions, no UDF —
    // cross-validated against q_bloblang by sharing one DuckDB oracle.
    "q_bloblang_compiled" -> ((s, dir) => {
      val program =
        """root.shout = this.text.uppercase()
          |root.n_words = this.text.split(" ").length()
          |root.role_tag = match this.role { "user" => "U", "assistant" => "A", _ => "T" }""".stripMargin
      val df = Tables.transcripts(s, dir)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"))
      val stage = graft.blob.BloblangCompiler.stage(program, df.schema)
        .getOrElse(throw new IllegalStateException("q_bloblang_compiled: program fell out of the compiled subset"))
      stage(df).select(col("conv_id"), col("turn_idx"), col("shout"),
        col("n_words").cast("int").as("n_words"), col("role_tag"))
    }),

    // root = deleted() filtering (bloblang functions.go:277).
    "q_filter_proc" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Transforms.filterProc(df, col("role") === "tool" || length(col("text")) < 24)
        .select("conv_id", "turn_idx", "role", "text")
    }),

    // branch processor with a lookup child = broadcast enrichment join
    // (reference: internal/old/processor/branch.go:327-480).
    "q_branch_enrich" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val dim = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      Transforms.enrich(cust, dim, Seq("c_nationkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "n_name")
    }),

    // workflow processor: tiered DAG of computed columns, later tiers
    // reading earlier ones (reference: internal/old/processor/workflow.go:48-116).
    "q_workflow" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Transforms.workflow(df, Seq(
        Seq(
          "t_len" -> ((d: DataFrame) => length(col("text"))),
          "t_words" -> ((d: DataFrame) => size(split(col("text"), " ")))),
        Seq(
          "chars_per_word" -> ((d: DataFrame) => round(col("t_len") / col("t_words"), 3)))))
        .select("conv_id", "turn_idx", "t_len", "t_words", "chars_per_word")
    }),

    // workflow with AUTOMATIC dependency ordering: branches given in
    // scrambled order, tiers inferred from declared read/write targets
    // (reference: workflow_branch_map.go:273-302 resolveDynamicBranchDAG).
    "q_workflow_auto" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      import Transforms.Branch
      Transforms.workflowAuto(df, Seq(
        Branch("cpw", Set("t_len", "t_words"), "chars_per_word",
          _ => round(col("t_len") / col("t_words"), 3)),
        Branch("verdict", Set("chars_per_word"), "wordy",
          _ => col("chars_per_word") > 5),
        Branch("len", Set("text"), "t_len", _ => length(col("text"))),
        Branch("words", Set("text"), "t_words",
          _ => size(split(col("text"), " ")))))
        .select("conv_id", "turn_idx", "t_len", "t_words", "chars_per_word", "wordy")
    }),

    // grok processor: regex-dictionary extraction to typed fields
    // (reference: internal/old/processor/grok.go:91).
    "q_grok" -> ((s, dir) => {
      Tables.transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"),
        regexp_extract(col("text"), "^\\[(\\w+) (\\d+)\\]", 1).as("g_role"),
        regexp_extract(col("text"), "^\\[(\\w+) (\\d+)\\]", 2).cast("int").as("g_idx"),
        get_json_object(regexp_extract(col("text"), "\\{.*\\}$", 0), "$.k")
          .cast("int").as("prop_k"))
    }),

    // Scalar expression surface (Bloblang → Catalyst, SURVEY.md §2.6):
    // one projection exercising encode/hash/string/json functions.
    "q_blob_scalars" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        Blob.encodeBase64(substring(col("text"), 1, 12)).as("b64"),
        Blob.encodeHex(substring(col("text"), 1, 6)).as("hexed"),
        Blob.indexOf(col("text"), "the").as("idx_the"),
        Blob.hasPrefix(col("text"), lit("the ")).as("pref"),
        Blob.capitalize(col("text")).substr(1, 20).as("cap20"),
        Blob.reReplaceAll(col("text"), "[aeiou]", "_").substr(1, 20).as("devow20"),
        reverse(substring(col("text"), 1, 10)).as("rev10"),
        Blob.hash(col("text"), "sha256").as("sha"),
        Blob.parseDuration(lit("1h2m3s450ms")).as("dur_ns"),
        Blob.splitStr(col("text"), " ").getItem(0).as("first_word"),
        Blob.trim_(Blob.replaceAll(col("text"), "the", "-")).substr(1, 20).as("repl20"))
    }),

    // Scalar surface, part 2: timestamp formatting + the structured
    // (array) method family from SURVEY §2.6 (sort, slice, unique,
    // reverse, fold/sum, join), all through Blob combinators.
    "q_blob_scalars2" -> ((s, dir) => {
      val words = split(col("text"), " ")
      Tables.transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"),
        Blob.formatTimestamp(col("ts"), "yyyy-MM-dd").as("day"),
        Blob.formatTimestampUnix(date_trunc("hour", col("ts"))).as("hour_unix"),
        Blob.joinArr(Blob.sortArr(words), ",").as("words_sorted"),
        Blob.joinArr(Blob.slice(words, 0, 3), " ").as("first3"),
        Blob.length_(Blob.unique(words)).as("n_uniq"),
        Blob.sum_(transform(words, w => length(w))).cast("long").as("chars_sum"),
        Blob.joinArr(reverse(words), " ").as("rev_words"))
    }),

    // Scalar surface, part 3 (round-2 Bloblang tail): strftime/strptime
    // dialect timestamps, ISO-8601 durations, unquote∘quote and
    // ascii85-decode∘encode round-trips, comparator sort_by.
    "q_blob_scalars3" -> ((s, dir) => {
      val fmt = "%Y-%m-%dT%H:%M:%S"
      val words = split(col("text"), " ")
      Tables.transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"),
        Blob.formatTimestampStrftime(col("ts"), fmt).as("stamped"),
        unix_timestamp(Blob.parseTimestampStrptime(
          Blob.formatTimestampStrftime(col("ts"), fmt), fmt)).as("rt_unix"),
        Blob.parseDurationIso8601(
          format_string("PT%dM", col("turn_idx") + 1)).as("iso_ns"),
        Blob.unquote(Blob.quote(col("text"))).as("unq"),
        Blob.decodeAscii85(Blob.encodeAscii85(col("text"))).cast("string").as("a85_rt"),
        Blob.joinArr(Blob.sortBy(words, w => struct(length(w), w)), ",").as("by_len"))
    }),

    // metadata map plumbing (SURVEY §1.3: Part.metadata → MAP<STRING,
    // STRING> column; reference internal/message/part.go:209-245): build,
    // overlay (meta set wins), read back.
    "q_meta_map" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
        .withColumn("meta", map(
          lit("source"), lit("events"),
          lit("role"), col("role"),
          lit("idx"), col("turn_idx").cast("string")))
        .withColumn("meta", map_concat(
          map_filter(col("meta"), (k, _) => k =!= "role"),
          map(lit("role"), upper(col("role"))))) // overlay wins
      df.select(col("conv_id"), col("turn_idx"),
        Blob.meta(col("meta"), "source").as("m_source"),
        Blob.meta(col("meta"), "role").as("m_role"),
        Blob.meta(col("meta"), "idx").as("m_idx"),
        size(Blob.keys(col("meta"))).as("n_keys"))
    }),

    // batch-context access: from(i) reads a field at batch position i,
    // from_all() the whole batch as an ordered array (query/methods.go:
    // 153,195) — window forms over the conversation batch.
    "q_from_batch" -> ((s, dir) => {
      val ord = struct(col("ts"), col("turn_idx"))
      Tables.transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"),
        Blob.from(col("text"), col("conv_id"), ord, 0).as("first_text"),
        Blob.from(col("text"), col("conv_id"), ord, 2).as("third_text"),
        size(Blob.fromAll(col("text"), col("conv_id"), ord)).as("n_batch"))
    }),

    // jmespath processor (internal/old/processor/jmespath.go:143-161):
    // the query compiles once, runs per document, and the result replaces
    // the document. The program below exercises filters, projections,
    // sort/join/max_by/sum functions and pipes over a real per-conversation
    // JSON document (the doc-example shape: filter → sort → join).
    "q_jmespath" -> ((s, dir) => {
      val doc = Tables.transcripts(s, dir)
        .groupBy(col("conv_id"))
        .agg(array_sort(collect_list(struct(
          col("turn_idx").as("i"), col("role").as("role"),
          col("tool").as("tool"), length(col("text")).as("n")))).as("turns"))
        .withColumn("doc", to_json(struct(col("conv_id").as("conv"), col("turns"))))
      import graft.blob.JsonQuery
      doc.select(
        col("conv_id"),
        JsonQuery.jmespath(col("doc"), "turns[?role=='assistant'] | length(@)")
          .cast("int").as("n_assistant"),
        Blob.unquote(JsonQuery.jmespath(col("doc"),
          "join(',', sort(turns[?role=='tool'].tool))")).as("tools_csv"),
        JsonQuery.jmespath(col("doc"), "max_by(turns, &n).n").cast("int").as("max_len"),
        JsonQuery.jmespath(col("doc"), "sum(turns[*].n)").cast("bigint").as("sum_chars"))
    }),

    // jq processor (internal/old/processor/jq.go; jq_test.go:58 tests
    // `{foo: .foo} | .foo.bar = "baz"`): paths, object construction and
    // path assignment over per-row JSON.
    "q_jq" -> ((s, dir) => {
      import graft.blob.JsonQuery
      val df = Tables.transcripts(s, dir).withColumn("doc",
        to_json(struct(col("conv_id"), col("turn_idx"), col("role"),
          split(col("text"), " ").as("words"))))
      df.select(
        col("conv_id"), col("turn_idx"),
        Blob.unquote(JsonQuery.jq(col("doc"), ".role")).as("jq_role"),
        Blob.unquote(JsonQuery.jq(col("doc"), ".words[0]")).as("jq_word0"),
        JsonQuery.jq(col("doc"), "{conv: .conv_id} | .seen = true").as("jq_obj"))
    }),

    // while processor (internal/old/processor/while.go:147-186): halve
    // every oversized document until none exceeds the bound — a
    // do-until-fixpoint loop whose iteration count is O(log max_len).
    "q_while" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Transforms.whileLoop(docs,
        length(col("text")) > 64,
        d => d.withColumn("text",
          when(length(col("text")) > 64,
            col("text").substr(lit(1), ceil(length(col("text")) / 2).cast("int")))
            .otherwise(col("text"))),
        maxLoops = 32)
        .select(col("doc_id"), length(col("text")).as("len_final"),
          col("text").as("text_final"))
    }),

    // try/catch error routing (reference: internal/old/processor/try.go:83-153,
    // catch.go:120-152 — catch clears the error flag after handling).
    "q_try_catch" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      val marked = Errors.markError(df, length(col("text")) > 60, lit("too long"))
      val tried = Errors.tryProc(marked, "text", upper(col("text")))
      val caught = Errors.catchProc(tried, "text", lit("REDACTED"))
      caught.select(col("conv_id"), col("turn_idx"), col("text").as("text_out"),
        col(Errors.ErrCol).as("err_after"))
    }),

    // switch processor first-match routing (reference: switch.go:94-105).
    "q_switch" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir).withColumn("category", lit("other"))
      Errors.switchProc(df, "category", Seq(
        (col("role") === "user") -> lit("question"),
        (col("role") === "assistant") -> lit("answer"),
        (col("role") === "tool") -> concat(lit("tool:"), col("tool"))))
        .select("conv_id", "turn_idx", "category")
    }))

  val oracles: Map[String, String] = Map(
    "q_bloblang" -> (T +
      """SELECT conv_id, turn_idx, upper(text) AS shout,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words,
        |  CASE role WHEN 'user' THEN 'U' WHEN 'assistant' THEN 'A' ELSE 'T' END AS role_tag
        |FROM transcripts""".stripMargin),
    "q_bloblang_compiled" -> (T +
      """SELECT conv_id, turn_idx, upper(text) AS shout,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_words,
        |  CASE role WHEN 'user' THEN 'U' WHEN 'assistant' THEN 'A' ELSE 'T' END AS role_tag
        |FROM transcripts""".stripMargin),
    "q_map_proc" -> (T +
      """SELECT conv_id, turn_idx, upper(role) AS role_up,
        |  length(text) AS text_len, md5(text) AS content_md5,
        |  printf('%s#%d', conv_id, turn_idx) AS tag
        |FROM transcripts""".stripMargin),
    "q_filter_proc" -> (T +
      """SELECT conv_id, turn_idx, role, text FROM transcripts
        |WHERE NOT (role = 'tool' OR length(text) < 24)""".stripMargin),
    "q_branch_enrich" ->
      """SELECT c_custkey, c_name, c_mktsegment, n_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q_workflow" -> (T +
      """SELECT conv_id, turn_idx,
        |  length(text) AS t_len,
        |  len(string_split(text, ' ')) AS t_words,
        |  round(length(text) / len(string_split(text, ' ')), 3) AS chars_per_word
        |FROM transcripts""".stripMargin),
    "q_workflow_auto" -> (T +
      """SELECT conv_id, turn_idx,
        |  length(text) AS t_len,
        |  len(string_split(text, ' ')) AS t_words,
        |  round(length(text) / len(string_split(text, ' ')), 3) AS chars_per_word,
        |  round(length(text) / len(string_split(text, ' ')), 3) > 5 AS wordy
        |FROM transcripts""".stripMargin),
    "q_grok" -> (T +
      """SELECT conv_id, turn_idx,
        |  regexp_extract(text, '^\[(\w+) (\d+)\]', 1) AS g_role,
        |  CAST(regexp_extract(text, '^\[(\w+) (\d+)\]', 2) AS INT) AS g_idx,
        |  CAST(regexp_extract(text, '\{.*\}$', 0)->>'$.k' AS INT) AS prop_k
        |FROM transcripts""".stripMargin),
    "q_blob_scalars" ->
      """SELECT doc_id,
        |  to_base64(encode(substr(text, 1, 12))) AS b64,
        |  lower(hex(encode(substr(text, 1, 6)))) AS hexed,
        |  strpos(text, 'the') - 1 AS idx_the,
        |  starts_with(text, 'the ') AS pref,
        |  substr(upper(substr(text, 1, 1)) || substr(text, 2), 1, 20) AS cap20,
        |  substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 20) AS devow20,
        |  reverse(substr(text, 1, 10)) AS rev10,
        |  sha256(text) AS sha,
        |  CAST(3723450000000 AS BIGINT) AS dur_ns,
        |  string_split(text, ' ')[1] AS first_word,
        |  substr(trim(replace(text, 'the', '-')), 1, 20) AS repl20
        |FROM documents""".stripMargin,
    "q_blob_scalars2" -> (T +
      """SELECT conv_id, turn_idx,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_unix,
        |  array_to_string(list_sort(string_split(text, ' ')), ',') AS words_sorted,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '), w -> len(w))), 0) AS BIGINT) AS chars_sum,
        |  array_to_string(list_reverse(string_split(text, ' ')), ' ') AS rev_words
        |FROM transcripts""".stripMargin),
    "q_blob_scalars3" -> (T +
      """SELECT conv_id, turn_idx,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS stamped,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS rt_unix,
        |  CAST(turn_idx + 1 AS BIGINT) * 60000000000 AS iso_ns,
        |  text AS unq,
        |  text AS a85_rt,
        |  array_to_string(list_transform(
        |    list_sort(list_transform(string_split(text, ' '),
        |      w -> printf('%05d|%s', len(w), w))),
        |    x -> substr(x, 7)), ',') AS by_len
        |FROM transcripts""".stripMargin),
    "q_meta_map" -> (T +
      """SELECT conv_id, turn_idx,
        |  'events' AS m_source,
        |  upper(role) AS m_role,
        |  CAST(turn_idx AS VARCHAR) AS m_idx,
        |  3 AS n_keys
        |FROM transcripts""".stripMargin),
    "q_from_batch" -> (T +
      """SELECT conv_id, turn_idx,
        |  first_value(text) OVER w AS first_text,
        |  nth_value(text, 3) OVER w AS third_text,
        |  CAST(count(*) OVER (PARTITION BY conv_id) AS INT) AS n_batch
        |FROM transcripts
        |WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),
    "q_jmespath" -> (T +
      """SELECT conv_id,
        |  CAST(count(*) FILTER (WHERE role = 'assistant') AS INT) AS n_assistant,
        |  coalesce(array_to_string(list_sort(list(tool) FILTER (WHERE role = 'tool')), ','), '') AS tools_csv,
        |  CAST(max(length(text)) AS INT) AS max_len,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM transcripts GROUP BY conv_id""".stripMargin),
    "q_jq" -> (T +
      """SELECT conv_id, turn_idx,
        |  role AS jq_role,
        |  string_split(text, ' ')[1] AS jq_word0,
        |  printf('{"conv":"%s","seen":true}', conv_id) AS jq_obj
        |FROM transcripts""".stripMargin),
    "q_while" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, substr(text, 1, CAST(ceil(length(text) / 2.0) AS INT))
        |  FROM w WHERE length(text) > 64
        |)
        |SELECT doc_id, length(text) AS len_final, text AS text_final
        |FROM w WHERE length(text) <= 64""".stripMargin,
    "q_try_catch" -> (T +
      """SELECT conv_id, turn_idx,
        |  CASE WHEN length(text) > 60 THEN 'REDACTED' ELSE upper(text) END AS text_out,
        |  CAST(NULL AS VARCHAR) AS err_after
        |FROM transcripts""".stripMargin),
    "q_switch" -> (T +
      """SELECT conv_id, turn_idx,
        |  CASE WHEN role = 'user' THEN 'question'
        |       WHEN role = 'assistant' THEN 'answer'
        |       WHEN role = 'tool' THEN 'tool:' || tool
        |       ELSE 'other' END AS category
        |FROM transcripts""".stripMargin)
  )
}
