package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{CacheOps, Errors, RateLimit}
import graft.sources.Tables

/** Oracle-checked queries for the cache operator family (set/add/get/
  * delete — reference internal/old/processor/cache.go:40-45), the
  * rate_limit admission plan (rate_limit_local.go), and the switch
  * output's strict/continue routing (output_switch.go:193-238).
  *
  * The op log driving the cache queries is derived from transcripts:
  * user turns `set` their conversation's entry, assistant turns try `add`,
  * tool turns `delete` — exercising every operator's interaction in one
  * deterministic keyed log.
  */
object CacheQueries {
  private val T = Tables.TranscriptsCte

  private def opLog(s: SparkSession, dir: String): DataFrame =
    Tables.transcripts(s, dir).select(
      col("conv_id"), col("turn_idx"), col("ts"),
      when(col("role") === "user", "set")
        .when(col("role") === "assistant", "add")
        .otherwise("delete").as("op"),
      col("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // final store contents after replaying the op log (set overwrite /
    // add-if-absent / delete semantics, cache.go footnotes).
    "q_cache_ops" -> ((s, dir) => {
      val ops = opLog(s, dir)
      CacheOps.materialize(ops, col("conv_id"), col("op"), col("text"),
        struct(col("ts"), col("turn_idx")), tsCol = Some(col("ts")))
        .select(col("key"), col("value"),
          unix_timestamp(col("written_at")).as("written_unix"))
    }),

    // `add` contention: first writer per (conv, role) wins, later rows
    // carry the reference's "key already exists" error (cache.go ex. 1).
    "q_cache_add" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      CacheOps.addAnnotate(df, concat_ws("|", col("conv_id"), col("role")),
        struct(col("ts"), col("turn_idx")))
        .select(col("conv_id"), col("turn_idx"), col(Errors.ErrCol).as("add_err"))
    }),

    // `get` hydration: tool turns read the store built from user `set`s;
    // missing keys carry "key does not exist" (cache.go `get` contract).
    "q_cache_get" -> ((s, dir) => {
      val sets = opLog(s, dir).filter(col("op") === "set")
      val store = CacheOps.materialize(sets, col("conv_id"), col("op"), col("text"),
        struct(col("ts"), col("turn_idx")))
      val tools = Tables.transcripts(s, dir).filter(col("role") === "tool")
      CacheOps.get(tools, store, col("conv_id"), "cached")
        .select(col("conv_id"), col("turn_idx"), col("cached"),
          col(Errors.ErrCol).as("get_err"))
    }),

    // the streaming cache tier through the real engine: every turn is a
    // cache operation (user=set, assistant=add, tool=get/delete by turn
    // parity) applied against flatMapGroupsWithState keyed state across
    // micro-batches and checkpointed phases; the committed per-op outputs
    // (get results, add contention, the error flags) must match the SQL
    // state reconstruction — live-ness segments between deletes make the
    // sequential semantics window-expressible (an add is rejected iff ANY
    // prior write exists in its segment, regardless of that write's own
    // acceptance).
    "q_stream_cache" -> ((s, dir) => {
      import s.implicits._
      WindowQueries.replayStreamed(s, dir, "zzz-sentinel", { stream =>
        val ops = stream.select(
          col("conv_id").as("key"),
          when(col("role") === "user", "set")
            .when(col("role") === "assistant", "add")
            .when(pmod(col("turn_idx"), lit(2)) === 0, "get")
            .otherwise("delete").as("op"),
          col("text").as("value"),
          col("ts"),
          col("turn_idx").as("ord")).as[CacheOps.CacheOp]
        CacheOps.streamApply(ops, ttlSeconds = 0L, lateness = "40 days").toDF()
      }, sentinelFilter = Some(col("key") =!= "zzz-sentinel"))
        .select(col("key"), col("op"), col("value"), col("errored"), col("ts"))
    }),

    // multilevel cache view (cache_multilevel.go): L0 holds only the deep
    // turns' entries, L1 the full store — lookups hit L0 where present and
    // fall through to L1, with the winning level reported.
    "q_cache_multilevel" -> ((s, dir) => {
      val t = Tables.transcripts(s, dir)
      def userSets(src: DataFrame) = CacheOps.materialize(
        src.filter(col("role") === "user"),
        col("conv_id"), lit("set"), col("text"), struct(col("ts"), col("turn_idx")),
        tsCol = Some(col("ts")))
      val l0 = userSets(t.filter(col("turn_idx") >= 5))
      val l1 = userSets(t)
      CacheOps.multilevelView(Seq(l0, l1))
        .select(col("key"), col("value"), col("level"))
    }),

    // switch output continue/strict routing: a row may land in several
    // sinks (continue=true) until a stopping case claims it; unmatched
    // rows are flagged instead of dropped (strict_mode).
    "q_switch_modes" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      Errors.switchStrict(df, Seq(
        ("users", col("role") === "user", true),
        ("longform", length(col("text")) > 40, true),
        ("openers", col("turn_idx") === 0, false),
        ("tools", col("role") === "tool", false)))
        .select(col("conv_id"), col("turn_idx"),
          array_join(col("routes"), ",").as("routed_to"),
          col(Errors.ErrCol).as("route_err"))
    }),

    // rate_limit event-time admission plan: at most 4 turns admitted per
    // hour bucket, overflow flagged for drop_on/DLQ routing (4 sits below
    // the per-hour row counts at BOTH oracle scales — sf0.001 peaks at 6,
    // sf0.01 at 30 — so the threshold genuinely fires in every
    // correctness run; a never-exceeded limit would make the oracle
    // vacuously all-false).
    "q_rate_limit" -> ((s, dir) => {
      val df = Tables.transcripts(s, dir)
      RateLimit.annotateOverflow(df, col("ts"),
        struct(col("ts"), col("conv_id"), col("turn_idx")), 4, 3600L)
        .select(col("conv_id"), col("turn_idx"), col("throttled"))
    }),

    // the SAME rate limit as a streaming stage: the admission counter is
    // keyed state on the hour bucket, carried across micro-batches and
    // checkpointed phases — must match the batch plan's oracle
    // row-for-row.
    "q_stream_rate_limit" -> ((s, dir) => {
      import s.implicits._
      WindowQueries.replayStreamed(s, dir, "zzz-sentinel", { stream =>
        RateLimit.streamAnnotate(stream.as[graft.model.Turn], 4, 3600L, "40 days").toDF()
      }).select(col("conv_id"), col("turn_idx"), col("throttled"))
    }))

  private val opsCte: String =
    T.stripSuffix("\n") +
      """, ops AS (
        |  SELECT conv_id, turn_idx, ts,
        |    CASE WHEN role = 'user' THEN 'set'
        |         WHEN role = 'assistant' THEN 'add'
        |         ELSE 'delete' END AS op,
        |    text
        |  FROM transcripts),
        |numbered AS (
        |  SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS rn
        |  FROM ops),
        |staged AS (
        |  SELECT *,
        |    coalesce(max(CASE WHEN op = 'delete' THEN rn END) OVER (PARTITION BY conv_id), 0) AS last_del
        |  FROM numbered),
        |chosen AS (
        |  SELECT *, coalesce(
        |      max(CASE WHEN op = 'set' AND rn > last_del THEN rn END) OVER (PARTITION BY conv_id),
        |      min(CASE WHEN op = 'add' AND rn > last_del THEN rn END) OVER (PARTITION BY conv_id)
        |    ) AS pick
        |  FROM staged)
        |""".stripMargin

  /** Sequential cache semantics reconstructed relationally: deletes cut
    * each key's op sequence into segments; within a segment, liveness at
    * an op = any prior set/add exists, the served value = last set if any
    * else the first add (which was necessarily accepted).
    */
  private val streamCacheSql: String =
    T.stripSuffix("\n") +
      """, ops2 AS (
        |  SELECT conv_id, turn_idx, ts, text,
        |    CASE WHEN role = 'user' THEN 'set'
        |         WHEN role = 'assistant' THEN 'add'
        |         WHEN turn_idx % 2 = 0 THEN 'get'
        |         ELSE 'delete' END AS op
        |  FROM transcripts),
        |segd AS (
        |  SELECT *, sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
        |            ROWS UNBOUNDED PRECEDING) AS seg
        |  FROM ops2),
        |scanned AS (
        |  SELECT *,
        |    count(CASE WHEN op IN ('set','add') THEN 1 END)
        |      OVER (PARTITION BY conv_id, seg ORDER BY ts, turn_idx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_writes,
        |    last_value(CASE WHEN op = 'set' THEN text END IGNORE NULLS)
        |      OVER (PARTITION BY conv_id, seg ORDER BY ts, turn_idx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_set_val,
        |    first_value(CASE WHEN op = 'add' THEN text END IGNORE NULLS)
        |      OVER (PARTITION BY conv_id, seg ORDER BY ts, turn_idx
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_add_val
        |  FROM segd)
        |SELECT conv_id AS key, op,
        |  CASE op
        |    WHEN 'set' THEN text
        |    WHEN 'add' THEN CASE WHEN coalesce(prior_writes, 0) > 0 THEN NULL ELSE text END
        |    WHEN 'get' THEN CASE WHEN coalesce(prior_writes, 0) > 0
        |                         THEN coalesce(last_set_val, first_add_val) END
        |    ELSE NULL END AS value,
        |  CASE op
        |    WHEN 'add' THEN coalesce(prior_writes, 0) > 0
        |    WHEN 'get' THEN coalesce(prior_writes, 0) = 0
        |    ELSE FALSE END AS errored,
        |  ts
        |FROM scanned""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_stream_cache" -> streamCacheSql,
    // sets-only materialize = last set per key; L0's keys are a subset of
    // L1's, so the level-priority pick is a left join from L1
    "q_cache_multilevel" -> (T.stripSuffix("\n") +
      """, l0 AS (
        |  SELECT conv_id, text FROM transcripts WHERE role = 'user' AND turn_idx >= 5
        |  QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, turn_idx DESC) = 1),
        |l1 AS (
        |  SELECT conv_id, text FROM transcripts WHERE role = 'user'
        |  QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, turn_idx DESC) = 1)
        |SELECT l1.conv_id AS key,
        |  CASE WHEN l0.conv_id IS NOT NULL THEN l0.text ELSE l1.text END AS value,
        |  CASE WHEN l0.conv_id IS NOT NULL THEN 0 ELSE 1 END AS level
        |FROM l1 LEFT JOIN l0 ON l1.conv_id = l0.conv_id""".stripMargin),
    "q_cache_ops" -> (opsCte +
      """SELECT conv_id AS key, text AS value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS written_unix
        |FROM chosen WHERE rn = pick""".stripMargin),
    "q_cache_add" -> (T +
      """SELECT conv_id, turn_idx,
        |  CASE WHEN row_number() OVER (PARTITION BY conv_id, role ORDER BY ts, turn_idx) > 1
        |       THEN 'key already exists' END AS add_err
        |FROM transcripts""".stripMargin),
    "q_cache_get" -> (T.stripSuffix("\n") +
      """, store AS (
        |  SELECT conv_id AS k, text AS v,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, turn_idx DESC) AS rn
        |  FROM transcripts WHERE role = 'user')
        |SELECT t.conv_id, t.turn_idx, s.v AS cached,
        |  CASE WHEN s.k IS NULL THEN 'key does not exist' END AS get_err
        |FROM transcripts t LEFT JOIN (SELECT k, v FROM store WHERE rn = 1) s
        |  ON t.conv_id = s.k
        |WHERE t.role = 'tool'""".stripMargin),
    "q_switch_modes" -> (T +
      """SELECT conv_id, turn_idx,
        |  coalesce(array_to_string(list_filter([
        |    CASE WHEN role = 'user' THEN 'users' END,
        |    CASE WHEN length(text) > 40 THEN 'longform' END,
        |    CASE WHEN turn_idx = 0 THEN 'openers' END,
        |    CASE WHEN role = 'tool' AND NOT turn_idx = 0 THEN 'tools' END
        |  ], x -> x IS NOT NULL), ','), '') AS routed_to,
        |  CASE WHEN NOT (role = 'user' OR length(text) > 40 OR turn_idx = 0 OR role = 'tool')
        |       THEN 'message does not match any cases' END AS route_err
        |FROM transcripts""".stripMargin),
    "q_rate_limit" -> rateLimitSql,
    "q_stream_rate_limit" -> rateLimitSql
  )

  private lazy val rateLimitSql: String = T +
    """SELECT conv_id, turn_idx,
      |  row_number() OVER (
      |    PARTITION BY floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600)
      |    ORDER BY ts, conv_id, turn_idx) > 4 AS throttled
      |FROM transcripts""".stripMargin
}
