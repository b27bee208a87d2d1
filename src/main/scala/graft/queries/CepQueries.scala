package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Cep
import graft.sources.Tables

/** Sequence-pattern CEP queries (the north rule's "CEP engine" surface
  * beyond windows/stateful joins): regex-over-role-alphabet episode
  * detection, batch and through the streaming engine. The pattern
  * language is the MATCH_RECOGNIZE regular core, kept on the subset
  * where Java regex (Spark) and RE2 (DuckDB) agree — no anchors,
  * lookaround or backreferences — so every match set is oracle-checked
  * cross-engine.
  */
object CepQueries {
  private val T = Tables.TranscriptsCte

  /** user turn, 1+ tool calls, assistant reply — the canonical agent episode. */
  private val EpisodePattern = "ut+a"

  /** agent loops: 4+ consecutive tool turns with no user/assistant between. */
  private val ToolLoopPattern = "t{4,}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // every user→tool+→assistant episode, one row per non-overlapping match
    "q_cep_episodes" -> ((s, dir) =>
      Cep.episodes(Tables.transcripts(s, dir), EpisodePattern)),

    // conversations where the agent looped on tools: longest run per conv.
    // The groupBy reuses episodes' conv_id partitioning — one shuffle total.
    "q_cep_toolloop" -> ((s, dir) =>
      Cep.episodes(Tables.transcripts(s, dir), ToolLoopPattern)
        .groupBy(col("conv_id"))
        .agg(max(col("episode_len")).as("max_tool_run"))),

    // the same episode detection through the streaming engine: buffered
    // per-conv state, fired by watermark passing conversation close,
    // committed exactly-once (same contract as the session-join twins).
    "q_stream_cep" -> ((s, dir) =>
      WindowQueries.replayStreamed(s, dir, "zzz-sentinel", stream =>
        Cep.episodesStreaming(stream, EpisodePattern, WindowQueries.GapSeconds, "40 days"))))

  private def roleSeqCte: String =
    """r AS (
      |  SELECT conv_id,
      |    string_agg(CASE WHEN role = 'user' THEN 'u'
      |                    WHEN role = 'assistant' THEN 'a'
      |                    ELSE 't' END, '' ORDER BY turn_idx) AS roles
      |  FROM transcripts GROUP BY conv_id)
      |""".stripMargin

  private def episodesSql(pattern: String): String =
    T.stripSuffix("\n") + ", " + roleSeqCte +
      s""", g AS (SELECT conv_id, regexp_extract_all(roles, '$pattern') AS l FROM r)
         |SELECT conv_id, match_seq, episode, CAST(length(episode) AS INT) AS episode_len
         |FROM (
         |  SELECT conv_id,
         |    CAST(unnest(range(0, len(l))) AS INT) AS match_seq,
         |    unnest(l) AS episode
         |  FROM g WHERE len(l) > 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_cep_episodes" -> episodesSql(EpisodePattern),
    "q_stream_cep" -> episodesSql(EpisodePattern),
    "q_cep_toolloop" ->
      (T.stripSuffix("\n") + ", " + roleSeqCte +
        s"""SELECT conv_id, CAST(max(length(e)) AS INT) AS max_tool_run
           |FROM (SELECT conv_id, unnest(regexp_extract_all(roles, '$ToolLoopPattern')) AS e FROM r)
           |GROUP BY conv_id""".stripMargin))
}
