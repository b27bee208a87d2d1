package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** Sequence-pattern CEP (MATCH_RECOGNIZE-style episode detection) over
  * per-conversation turn streams.
  *
  * The north rule names the engine a "streaming / CEP engine"; beyond the
  * window/stateful-join family this is the classic CEP shape the reference's
  * users would reach for over agent transcripts: "find every episode where a
  * user turn is followed by one-or-more tool calls and then an assistant
  * reply", or "flag conversations where the agent loops on the same tool".
  * Each conversation's turns are projected to one role character
  * (u/a/t), concatenated in turn order, and a regular expression over that
  * role alphabet defines the pattern — regex-as-pattern is exactly the
  * MATCH_RECOGNIZE PATTERN clause restricted to its regular core
  * (concatenation, alternation, the +, star and {n,m} quantifiers), and keeps the
  * whole surface replayable in any engine with leftmost non-overlapping
  * regex semantics (Java util.regex here, RE2 in DuckDB — identical on
  * this anchor-free, backreference-free alphabet).
  *
  * 100 TB shape (batch): ONE hash shuffle on conv_id — the engine's
  * standing transcript partitioning, reused by every other conv-keyed
  * stage — then a per-group linear pass. Conversations are bounded (turns
  * per conv is a data invariant, thousands at most), so the per-group
  * collect is O(conv), never O(corpus); match extraction is a codegen'd
  * string op on a string the size of the conversation's turn count.
  *
  * Streaming: flatMapGroupsWithState keyed on conv_id buffers one char +
  * ordinal per turn (state is bytes-per-turn, not text), and fires the
  * pattern matcher when the event-time watermark passes the conversation's
  * last turn plus the quiet gap — the same conversation-close contract as
  * the session join (SessionJoin.processConv). State is then removed:
  * bounded by live conversations at 10^12-turn scale.
  */
object Cep {

  /** The role alphabet: one char per turn. */
  def roleChar(role: Column): Column =
    when(role === "user", lit("u")).when(role === "assistant", lit("a")).otherwise(lit("t"))

  /** Per-conversation turn_idx-ordered role string (conv_id, roles). */
  def roleSeq(df: DataFrame): DataFrame =
    df.groupBy("conv_id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("turn_idx"), roleChar(col("role")).as("rc")))),
          s => s.getField("rc")),
        "").as("roles"))

  /** One row per leftmost non-overlapping match of `pattern` over each
    * conversation's role string: (conv_id, match_seq, episode, episode_len).
    * `pattern` must stay on the regular core (no anchors, no lookaround,
    * no backreferences) so Java regex and RE2 agree.
    */
  def episodes(df: DataFrame, pattern: String): DataFrame =
    roleSeq(df)
      .select(
        col("conv_id"),
        posexplode(regexp_extract_all(col("roles"), lit(pattern), lit(0)))
          .as(Seq("match_seq", "episode")))
      .withColumn("episode_len", length(col("episode")))

  /** Compact per-turn state: one char + ordinal + event-time millis. */
  final case class CepTurn(turn_idx: Int, rc: String, tsMs: Long)

  final case class Episode(conv_id: String, match_seq: Int, episode: String, episode_len: Int)

  /** Streaming twin of [[episodes]]: emits a conversation's episodes once,
    * when the watermark passes its last turn + `gapSeconds` (conversation
    * closed). Late turns behind the watermark are dropped explicitly —
    * the engine's standing late rule (SessionJoin.processConv; reference
    * buffer_system_window.go:333-336). A conversation reappearing after
    * its flush starts a fresh match (match_seq restarts), like the
    * reference's expired cache entries.
    */
  def episodesStreaming(
      df: DataFrame,
      pattern: String,
      gapSeconds: Long = 1800L,
      lateness: String = "10 minutes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[Turn]
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processCep(pattern, gapSeconds))
      .toDF()
  }

  private def processCep(pattern: String, gapSeconds: Long): (
      String, Iterator[Turn], GroupState[List[CepTurn]]) => Iterator[Episode] = {
    // compile ONCE per query and ship the compiled regex in the closure —
    // inline `pattern.r` would recompile per conversation flush per batch
    val rx = pattern.r
    (convId: String, incoming: Iterator[Turn], state: GroupState[List[CepTurn]]) => {
    def matchEpisodes(conv: String, buf: List[CepTurn]): List[Episode] =
      if (buf.isEmpty) Nil
      else {
        val roles = buf.sortBy(_.turn_idx).iterator.map(_.rc).mkString
        rx.findAllIn(roles).toList.zipWithIndex.map { case (e, i) =>
          Episode(conv, i, e, e.length)
        }
      }

    if (state.hasTimedOut) {
      val buf = state.getOption.getOrElse(Nil)
      state.remove()
      matchEpisodes(convId, buf).iterator
    } else {
      val wm = state.getCurrentWatermarkMs()
      val fresh = incoming
        .filter(t => wm == 0 || t.ts.getTime >= wm)
        .map(t => CepTurn(t.turn_idx, if (t.role == "user") "u" else if (t.role == "assistant") "a" else "t", t.ts.getTime))
        .toList
      val buf = state.getOption.getOrElse(Nil) ++ fresh
      if (buf.isEmpty) Iterator.empty
      else {
        state.update(buf)
        val maxTs = buf.iterator.map(_.tsMs).max
        // clamp above the watermark: buffered turns may be older than wm
        // when the watermark jumped within this batch
        state.setTimeoutTimestamp(math.max(maxTs + gapSeconds * 1000L + 1L, wm + 1L))
        Iterator.empty
      }
    }
    }
  }
}
