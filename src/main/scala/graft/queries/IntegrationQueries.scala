package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Awk, Errors, Subprocess, Transforms}
import graft.sources.{Http, Tables}

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
      // one long-lived child per partition; the per-row round-trip is
      // synchronous, so node width (not the scan's file count) must set the
      // parallelism — same shape as q_http_enrich below
      val df = Tables.transcripts(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
      Subprocess.pipe(df, Seq("awk", "-W", "interactive", "{ print toupper($0); fflush(); }"))
        .select(col("conv_id"), col("turn_idx"), col("text").as("text_up"),
          col(Errors.ErrCol).as("err"))
    }),

    // http processor (internal/old/processor/http.go:103-113): per-row
    // enrichment request against a service (here the JVM-lifetime uppercase
    // echo); the 2xx body replaces the document. One client per partition —
    // the reference's `parallel` mode is partition parallelism, so the
    // single-file scan is repartitioned to node width first (sequential
    // loopback requests pay ~45 ms each to delayed-ACK; width-32 hides it).
    "q_http_enrich" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
        .repartition(s.sparkContext.defaultParallelism)
      Http.enrich(docs, Http.echoUpperUrl)
        .select(col("doc_id"), col("text").as("text_up"),
          col(Errors.ErrCol).as("err"))
    }),

    // count(name) monotonic counter (bloblang functions.go:233) over the
    // explicit total order (ts, conv_id, turn_idx) — the distributed
    // ordinal via range partition + zipWithIndex, no single-task window.
    "q_count" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Transforms.counter(df, Seq(col("ts"), col("conv_id"), col("turn_idx")), "msg_count")
        .select(col("conv_id"), col("turn_idx"), col("msg_count"))
    }),

    // msgpack methods (internal/impl/msgpack/bloblang.go): format → parse
    // round-trip preserves the document, and the packed length follows the
    // msgpack.org spec arithmetic exactly (fixmap + fixstr + compact int),
    // which DuckDB recomputes per row.
    "q_msgpack" -> ((s, dir) => {
      import graft.blob.MsgPack
      val df = Tables.transcripts(s, dir).withColumn("doc",
        to_json(struct(col("conv_id"), col("turn_idx"), col("role"))))
      val rt = MsgPack.parseMsgpack(MsgPack.formatMsgpack(col("doc")))
      df.select(col("conv_id"), col("turn_idx"),
        get_json_object(rt, "$.role").as("rt_role"),
        get_json_object(rt, "$.turn_idx").cast("int").as("rt_idx"),
        length(MsgPack.formatMsgpack(col("doc"))).as("packed_len"))
    }),

    // sql_insert output → partitioned sql_select input round-trip through
    // embedded Derby (internal/impl/sql/): every transcript turn lands in
    // the database via per-partition batched inserts and comes back via 8
    // disjoint range predicates on turn_idx — the parallel-scan shape a
    // real warehouse connector uses at scale. The oracle is the identity
    // projection over the parquet source.
    "q_sql_roundtrip" -> ((s, dir) => {
      import graft.sources.Sql
      val dsn = "jdbc:derby:memory:graftq" +
        java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
      val t = Tables.transcripts(s, dir).select(
        col("conv_id"), col("turn_idx"), col("role"),
        length(col("text")).as("n_chars"))
      Sql.createAndInsert(t, dsn, "turns", "conv_id VARCHAR(64), role VARCHAR(16)")
      // bounds need not cover the data — Spark's edge strides catch rows
      // outside [lower, upper)
      Sql.selectPartitioned(s, dsn, "turns",
        Seq("conv_id", "turn_idx", "role", "n_chars"), "turn_idx", 0, 512, 8)
    }),

    // protobuf processor (internal/old/processor/protobuf.go): from_json →
    // to_json round-trip through the hand-written wire codec, plus the wire
    // length — which DuckDB recomputes from the encoding spec's arithmetic
    // (tag byte + length byte + payload per string field; varint width for
    // the int32; proto3 omits zero values, so turn_idx=0 rows drop the
    // field on the wire AND in the canonical JSON).
    "q_protobuf" -> ((s, dir) => {
      import graft.blob.Proto
      val fs = Proto.compile(Seq(
        """syntax = "proto3";
          |package graft;
          |message Turn {
          |  string conv_id = 1;
          |  int32 turn_idx = 2;
          |  string role = 3;
          |}""".stripMargin))
      val from = Proto.fromJson(fs, "graft.Turn")
      val to = Proto.toJson(fs, "graft.Turn")
      val df = Tables.transcripts(s, dir).withColumn("doc",
        to_json(struct(col("conv_id"), col("turn_idx"), col("role"))))
      val wire = from(col("doc"))
      df.select(col("conv_id"), col("turn_idx"),
        get_json_object(to(wire), "$.role").as("rt_role"),
        get_json_object(to(wire), "$.turnIdx").cast("int").as("rt_idx"),
        length(wire).as("wire_len"))
    }),

    // schema_registry_encode → schema_registry_decode round trip
    // (internal/impl/confluent/): every turn marshals to standard JSON,
    // encodes to confluent-framed Avro under the registry's latest "turns"
    // schema, and decodes back to Avro JSON (union-wrapped `tool`). The
    // oracle recomputes the decoded fields AND the wire length from the
    // Avro 1.11 binary spec arithmetic (5-byte frame + varint-length
    // strings + zigzag-varint long + 1-byte union indexes). The registry is
    // a JVM-lifetime loopback service; schemas are fetched once per
    // executor, so rows never wait on the network.
    "q_schema_registry" -> ((s, dir) => {
      import graft.ops.SchemaRegistry
      val url = SchemaRegistry.turnsRegistryUrl
      val df = Tables.transcripts(s, dir)
        .withColumn("doc", to_json(struct(
          col("conv_id"), col("turn_idx"), col("role"), col("tool"))))
      val enc = SchemaRegistry.encodeProc(df, url, "turns", jsonCol = "doc")
      val dec = SchemaRegistry.decodeProc(enc, url)
      dec.select(col("conv_id"), col("turn_idx"),
        get_json_object(col("decoded"), "$.role").as("rt_role"),
        get_json_object(col("decoded"), "$.tool.string").as("rt_tool"),
        length(col("wire")).as("wire_len"),
        col(Errors.ErrCol).as("err"))
    }),

    // awk processor, json codec (internal/old/processor/awk.go:792-801):
    // the document flattens into AWK variables; the program's stdout
    // replaces it. One interpreter per message by construction — fork cost
    // is spread across node width by repartitioning the single-file scan
    // (the subprocess processor is the long-lived streaming shape).
    "q_awk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("text", to_json(struct(col("doc_id"),
          col("lang"), length(col("text")).as("nchars"))))
      Awk.proc(docs, """{ print lang "#" doc_id ": " nchars " chars" }""", "json")
        .select(col("doc_id"), col("text").as("awk_out"),
          col(Errors.ErrCol).as("err"))
    }))

  val oracles: Map[String, String] = Map(
    "q_subprocess" -> (T +
      """SELECT conv_id, turn_idx, upper(text) AS text_up,
        |  CAST(NULL AS VARCHAR) AS err
        |FROM transcripts""".stripMargin),
    "q_http_enrich" ->
      """SELECT doc_id, upper(text) AS text_up, CAST(NULL AS VARCHAR) AS err
        |FROM documents""".stripMargin,
    "q_count" -> (T +
      """SELECT conv_id, turn_idx,
        |  row_number() OVER (ORDER BY ts, conv_id, turn_idx) AS msg_count
        |FROM transcripts""".stripMargin),
    // packed_len: 1 (fixmap:3) + 8 ('conv_id' fixstr key) + 1+len(conv_id)
    // + 9 ('turn_idx' key) + compact-int(turn_idx) + 5 ('role' key)
    // + 1+len(role)
    "q_msgpack" -> (T +
      """SELECT conv_id, turn_idx, role AS rt_role, turn_idx AS rt_idx,
        |  CAST(25 + length(conv_id) + length(role) +
        |    (CASE WHEN turn_idx < 128 THEN 1
        |          WHEN turn_idx < 256 THEN 2 ELSE 3 END) AS INT) AS packed_len
        |FROM transcripts""".stripMargin),
    "q_sql_roundtrip" -> (T +
      """SELECT conv_id, turn_idx, role, length(text) AS n_chars
        |FROM transcripts""".stripMargin),
    // wire_len: conv_id (tag 1 + len 1 + bytes) + role (tag 1 + len 1 +
    // bytes) + turn_idx (0 if default, else tag 1 + varint 1-2)
    "q_protobuf" -> (T +
      """SELECT conv_id, turn_idx, role AS rt_role,
        |  CASE WHEN turn_idx = 0 THEN NULL ELSE turn_idx END AS rt_idx,
        |  CAST(4 + length(conv_id) + length(role) +
        |    CASE WHEN turn_idx = 0 THEN 0
        |         WHEN turn_idx < 128 THEN 2 ELSE 3 END AS INT) AS wire_len
        |FROM transcripts""".stripMargin),
    // wire_len: 5 (magic + schema id) + conv_id (1-byte varint len + bytes)
    // + turn_idx (zigzag varint: 2*ti < 2^7 → 1B, < 2^14 → 2B, else 3B)
    // + role (1-byte len + bytes) + tool union index (1B) + optional
    // (1-byte len + bytes). All strings are ASCII so chars == octets.
    "q_schema_registry" -> (T +
      """SELECT conv_id, turn_idx, role AS rt_role, tool AS rt_tool,
        |  CAST(5 + 1 + length(conv_id)
        |    + (CASE WHEN turn_idx < 64 THEN 1
        |            WHEN turn_idx < 8192 THEN 2 ELSE 3 END)
        |    + 1 + length(role) + 1
        |    + (CASE WHEN tool IS NULL THEN 0 ELSE 1 + length(tool) END)
        |    AS INT) AS wire_len,
        |  CAST(NULL AS VARCHAR) AS err
        |FROM transcripts""".stripMargin),
    "q_awk" ->
      """SELECT doc_id,
        |  lang || '#' || CAST(doc_id AS VARCHAR) || ': ' ||
        |    CAST(length(text) AS VARCHAR) || ' chars' AS awk_out,
        |  CAST(NULL AS VARCHAR) AS err
        |FROM documents""".stripMargin)
}
