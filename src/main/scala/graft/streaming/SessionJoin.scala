package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{BufTurn, PairedTurn, Turn}

/** The flagship stateful operator (BASELINE.json north_star): join each
  * assistant/tool turn to the most recent user turn within the same
  * session (gap-bounded), per conversation.
  *
  * This recreates the reference's cache-hydration join pattern
  * (reference: config/examples/joining_streams.yaml:23-56 — comments are
  * joined to their article via a keyed cache branch) as explicit keyed
  * state: the "cache" is the group state, the TTL is the session gap
  * enforced by event-time timeout against the watermark.
  *
  * Three implementations, proven equal by SessionJoinSpec:
  *  - `pairTurns`      pure Scala on one conversation's turns (the spec)
  *  - `pairBatch`      window-function form (oracle-checkable in DuckDB)
  *  - `pairStreaming`  flatMapGroupsWithState (the production operator)
  */
object SessionJoin {

  val DefaultGapSeconds = 1800L

  /** Reference semantics on a single conversation, pure and total:
    * sort by (ts, turn_idx); a new session starts when the gap to the
    * previous turn exceeds `gapSeconds`; each assistant/tool turn pairs
    * with the latest user turn seen earlier in its session.
    *
    * Gap comparisons happen at SECOND resolution (epoch-second floor, the
    * `unix_timestamp` semantics of the batch form) so all three
    * implementations agree on sub-second timestamps.
    */
  def pairTurns(turns: Seq[Turn], gapSeconds: Long = DefaultGapSeconds): Seq[PairedTurn] = {
    val sorted = turns.sortBy(t => (t.ts.getTime, t.turn_idx))
    var sessionId = -1L
    var prevTs = Long.MinValue
    var lastUser: Turn = null
    val out = Seq.newBuilder[PairedTurn]
    sorted.foreach { t =>
      val tMs = Math.floorDiv(t.ts.getTime, 1000L)
      if (prevTs == Long.MinValue || tMs - prevTs > gapSeconds) {
        sessionId += 1
        lastUser = null
      }
      prevTs = tMs
      if (t.role == "user") lastUser = t
      else if (lastUser != null)
        out += PairedTurn(t.conv_id, sessionId, lastUser.turn_idx, lastUser.text,
          t.turn_idx, t.role, t.text, t.tool, lastUser.ts, t.ts)
    }
    out.result()
  }

  /** Batch/window-function form — one shuffle on conv_id shared by both
    * window specs; DuckDB can replicate it verbatim (oracle in SparkEntry).
    */
  def pairBatch(df: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("turn_idx"))
    val prev = lag(col("ts"), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(prev) > gapSeconds, 1).otherwise(0)
    val sessioned = df
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - lit(1))
    val ws = Window.partitionBy(col("conv_id"), col("session_id"))
      .orderBy(col("ts"), col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val userStruct = when(col("role") === "user",
      struct(col("turn_idx"), col("text"), col("ts")))
    sessioned
      .withColumn("__u", last(userStruct, ignoreNulls = true).over(ws))
      .filter(col("role") =!= "user" && col("__u").isNotNull)
      .select(
        col("conv_id"), col("session_id"),
        col("__u.turn_idx").as("user_turn_idx"),
        col("__u.text").as("user_text"),
        col("turn_idx").as("reply_turn_idx"),
        col("role").as("reply_role"),
        col("text").as("reply_text"),
        col("tool").as("reply_tool"),
        col("__u.ts").as("user_ts"),
        col("ts").as("reply_ts"))
  }

  /** Keyed state: turns buffered until the watermark passes the end of the
    * conversation's last open session. Kept deliberately small and
    * schema-explicit (SURVEY.md §7.3): at 10^12-turn scale state size per
    * key is bounded by one session's turns, and the event-time timeout
    * guarantees eviction. Rows buffer as `BufTurn` — conv_id is the state
    * key, so it never rides inside the value (~15% of state bytes at the
    * bench shape, re-serialized on every touched-key batch in this engine).
    */
  case class ConvState(buffered: List[BufTurn], flushedSessions: Long)

  /** Streaming form. Emits a session's pairs exactly once, when the
    * watermark passes (last turn ts + gap) — the point the reference's
    * window buffer would flush (buffer_system_window.go:421-428), but
    * data-driven instead of wall-clock.
    *
    * Late-data contract: flatMapGroupsWithState does NOT drop rows behind
    * the watermark (unlike windowed aggs), so `processConv` drops them
    * explicitly — the reference's own rule (messages older than the last
    * flushed window are purged, buffer_system_window.go:333-336). Turns
    * arriving after their conversation's flush but within the watermark
    * open a NEW session.
    */
  def pairStreaming(
      turns: Dataset[Turn],
      gapSeconds: Long = DefaultGapSeconds,
      lateness: String = "10 minutes"): Dataset[PairedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processConv(gapSeconds))
  }

  private def processConv(gapSeconds: Long)(
      convId: String,
      incoming: Iterator[Turn],
      state: GroupState[ConvState]): Iterator[PairedTurn] = {
    val old = state.getOption.getOrElse(ConvState(Nil, 0L))
    val wm = state.getCurrentWatermarkMs()
    if (state.hasTimedOut) {
      if (old.buffered.isEmpty) {
        // tombstone (counts only, nothing buffered): evict — bounded state
        // at 10^12-conv scale. A conv reappearing after this restarts its
        // session numbering, like the reference's expired cache entries.
        state.remove()
        Iterator.empty
      } else {
        // Watermark passed last ts + gap: every buffered session is closed.
        val pairs = pairTurns(old.buffered.map(BufTurn.toTurn(convId, _)), gapSeconds)
          .map(p => p.copy(session_id = p.session_id + old.flushedSessions))
        val nSessions = sessionCount(old.buffered, gapSeconds)
        state.update(ConvState(Nil, old.flushedSessions + nSessions))
        // keep the tombstone one more gap, then clean it up (branch above)
        state.setTimeoutTimestamp(wm + gapSeconds * 1000)
        pairs.iterator
      }
    } else {
      // Drop late turns explicitly (flatMapGroupsWithState does not):
      // reference drop rule buffer_system_window.go:333-336.
      val fresh = incoming.filter(t => wm == 0 || t.ts.getTime >= wm)
      val buf = old.buffered ++ fresh.map(BufTurn.of)
      if (buf.isEmpty) Iterator.empty
      else {
        state.update(ConvState(buf, old.flushedSessions))
        val maxTs = buf.iterator.map(_.ts.getTime).max
        // clamp above the watermark: buffered turns may be older than wm
        // when the watermark jumped within this batch
        state.setTimeoutTimestamp(math.max(maxTs + gapSeconds * 1000 + 1, wm + 1))
        Iterator.empty
      }
    }
  }

  private def sessionCount(turns: Seq[BufTurn], gapSeconds: Long): Long = {
    val sorted = turns.sortBy(t => (t.ts.getTime, t.turn_idx))
    var n = 0L
    var prev = Long.MinValue
    sorted.foreach { t =>
      val sec = Math.floorDiv(t.ts.getTime, 1000L)
      if (prev == Long.MinValue || sec - prev > gapSeconds) n += 1
      prev = sec
    }
    n
  }

  /** Hot-key salting (SURVEY.md §4 item 3): pre-shuffle the stream by
    * (conv_id, salt) so one hot conversation spreads over `salt` tasks for
    * the expensive per-turn work, before the final per-conv state stage.
    * Spark's stateful op re-shuffles on the group key regardless; salting
    * pays off for the map-heavy stages before it.
    */
  def saltedRepartition(df: DataFrame, partitions: Int, salt: Int): DataFrame =
    df.repartition(partitions,
      col("conv_id"), pmod(col("turn_idx"), lit(salt)))
}
