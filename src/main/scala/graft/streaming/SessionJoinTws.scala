package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.model.{BufTurn, PairedTurn, Turn}

/** The session join on Spark 4's `transformWithState` API — the
  * production-scale variant of `SessionJoin.pairStreaming`.
  *
  * Why a second implementation: `flatMapGroupsWithState` state is one
  * opaque value per key, so every touched conversation re-serializes its
  * ENTIRE turn buffer each micro-batch — O(session length) write
  * amplification per batch, which at 10^12 turns is the dominant state
  * cost. `transformWithState`'s `ListState` appends incrementally
  * (RocksDB merge operands), so a batch writes only the turns it actually
  * received, and explicit timers replace the single timeout slot.
  *
  * Semantics are identical to `SessionJoin.pairStreaming` (same pure
  * `pairTurns` spec at flush time, same late-turn drop rule, same
  * session-id offsetting for conversations spanning flushes) —
  * SessionJoinTwsSpec asserts equality against the batch form.
  */
object SessionJoinTws {

  class SessionPairProcessor(gapSeconds: Long)
      extends StatefulProcessor[String, Turn, PairedTurn] {

    // BufTurn, not Turn: the list is keyed by conv_id already — carrying
    // the key inside every appended element would waste ~15% of state
    // bytes on every merge operand and changelog upload (model.BufTurn).
    @transient private var buffered: ListState[BufTurn] = _
    // (flushedSessions, timerTs, bufMinTs): bufMinTs guards the eager
    // data-path flush so quiet conversations never re-read their list
    @transient private var meta: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffered = getHandle.getListState[BufTurn]("buffered", Encoders.product[BufTurn], TTLConfig.NONE)
      meta = getHandle.getValueState[(Long, Long, Long)]("meta",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    }

    /** Append this batch's turns, then eagerly emit any sessions the
      * watermark has already closed (same reasoning as
      * `SessionJoin.processConv`: a continuously-active conversation
      * supersedes its own timer every batch, so without the data-path
      * flush its closed sessions would never emit and its ListState would
      * grow without bound). The flush re-reads the list only when
      * `wm > bufMinTs + gap` — for quiet conversations this path stays
      * append-only, which is the whole point of the tws engine.
      */
    override def handleInputRows(
        convId: String,
        rows: Iterator[Turn],
        timerValues: TimerValues): Iterator[PairedTurn] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      // late-turn drop rule (reference: buffer_system_window.go:333-336)
      val fresh = rows.filter(t => wm <= 0 || t.ts.getTime >= wm)
        .map(BufTurn.of).toArray
      if (fresh.isEmpty) return Iterator.empty
      buffered.appendList(fresh)
      val (flushed0, oldTimer, oldMin) = Option(meta.get()).getOrElse((0L, 0L, 0L))
      var flushedSessions = flushed0
      var minTs = fresh.iterator.map(_.ts.getTime).min
      if (oldMin != 0L) minTs = math.min(minTs, oldMin)
      var out: List[PairedTurn] = Nil
      // timer target: the FIRST open session's close point (see
      // SessionJoin.flushAndRearm — arming at buffer-max would never fire
      // for a continuously-active conversation). On the append-only fast
      // path the buffer min ts is the conservative stand-in; an early
      // fire emits nothing and re-arms with the exact close point.
      var timerBase = minTs
      var tombstone = false
      if (wm > 0 && wm >= SessionJoin.closePointMs(minTs, gapSeconds)) {
        val all = buffered.get().toList
        val (closed, open, firstOpenEnd) = SessionJoin.splitClosed(all, gapSeconds, wm)
        if (closed.nonEmpty) {
          out = SessionJoin.pairTurns(
            closed.flatten.map(BufTurn.toTurn(convId, _)), gapSeconds)
            .map(p => p.copy(session_id = p.session_id + flushedSessions)).toList
          flushedSessions += closed.size
          buffered.clear()
          if (open.nonEmpty) buffered.appendList(open.toArray)
          minTs = if (open.isEmpty) 0L else open.iterator.map(_.ts.getTime).min
          tombstone = open.isEmpty
        }
        timerBase = firstOpenEnd
      }
      val newTimer =
        if (tombstone) wm + gapSeconds * 1000
        else math.max(SessionJoin.closePointMs(timerBase, gapSeconds), wm + 1)
      if (oldTimer != 0L && oldTimer != newTimer) getHandle.deleteTimer(oldTimer)
      if (oldTimer != newTimer) getHandle.registerTimer(newTimer)
      meta.update((flushedSessions, newTimer, minTs))
      out.iterator
    }

    override def handleExpiredTimer(
        convId: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PairedTurn] = {
      val (flushedSessions, activeTimer, _) = Option(meta.get()).getOrElse((0L, 0L, 0L))
      // a superseded timer (deleted-and-reregistered race) must not flush
      if (activeTimer != 0L && expiredTimerInfo.getExpiryTimeInMs() != activeTimer)
        return Iterator.empty
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buffered.get().toList
      if (all.isEmpty) {
        // tombstone cleanup: drop all state, conv restarts numbering
        meta.clear()
        Iterator.empty
      } else {
        // flush exactly the watermark-closed sessions; keep the open tail
        // and re-arm at its first close point (an early-fired timer emits
        // nothing and just re-arms — same discipline as the fmgws twin)
        val (closed, open, firstOpenEnd) = SessionJoin.splitClosed(all, gapSeconds, wm)
        val pairs =
          if (closed.isEmpty) Nil
          else SessionJoin.pairTurns(
            closed.flatten.map(BufTurn.toTurn(convId, _)), gapSeconds)
            .map(p => p.copy(session_id = p.session_id + flushedSessions)).toList
        if (closed.nonEmpty) {
          buffered.clear()
          if (open.nonEmpty) buffered.appendList(open.toArray)
        }
        // tombstone cleanup a gap later when everything flushed; tracked
        // in meta so new data can supersede it cleanly
        val next =
          if (open.isEmpty) wm + gapSeconds * 1000
          else math.max(SessionJoin.closePointMs(firstOpenEnd, gapSeconds), wm + 1)
        val minTs = if (open.isEmpty) 0L else open.iterator.map(_.ts.getTime).min
        meta.update((flushedSessions + closed.size, next, minTs))
        getHandle.registerTimer(next)
        pairs.iterator
      }
    }
  }

  /** Streaming session join via transformWithState. */
  def pairStreaming(
      turns: Dataset[Turn],
      gapSeconds: Long = SessionJoin.DefaultGapSeconds,
      lateness: String = "10 minutes"): Dataset[PairedTurn] = {
    implicit val pairedEnc = Encoders.product[PairedTurn]
    turns
      .withWatermark("ts", lateness)
      .groupByKey(_.conv_id)(Encoders.STRING)
      .transformWithState(
        new SessionPairProcessor(gapSeconds),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
