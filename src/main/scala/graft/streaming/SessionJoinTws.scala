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
    @transient private var meta: ValueState[(Long, Long)] = _ // (flushedSessions, timerTs)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffered = getHandle.getListState[BufTurn]("buffered", Encoders.product[BufTurn], TTLConfig.NONE)
      meta = getHandle.getValueState[(Long, Long)]("meta",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    }

    override def handleInputRows(
        convId: String,
        rows: Iterator[Turn],
        timerValues: TimerValues): Iterator[PairedTurn] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      // late-turn drop rule (reference: buffer_system_window.go:333-336)
      val fresh = rows.filter(t => wm <= 0 || t.ts.getTime >= wm)
        .map(BufTurn.of).toArray
      if (fresh.nonEmpty) {
        buffered.appendList(fresh)
        val (flushedSessions, oldTimer) = Option(meta.get()).getOrElse((0L, 0L))
        var maxTs = fresh.iterator.map(_.ts.getTime).max
        // the timer must cover the whole buffer, not just this batch
        if (oldTimer != 0L) maxTs = math.max(maxTs, oldTimer - gapSeconds * 1000 - 1)
        val newTimer = math.max(maxTs + gapSeconds * 1000 + 1, wm + 1)
        if (oldTimer != 0L && oldTimer != newTimer) getHandle.deleteTimer(oldTimer)
        if (oldTimer != newTimer) getHandle.registerTimer(newTimer)
        meta.update((flushedSessions, newTimer))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        convId: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PairedTurn] = {
      val (flushedSessions, activeTimer) = Option(meta.get()).getOrElse((0L, 0L))
      // a superseded timer (deleted-and-reregistered race) must not flush
      if (activeTimer != 0L && expiredTimerInfo.getExpiryTimeInMs() != activeTimer)
        return Iterator.empty
      // watermark passed (last ts + gap): every buffered session is closed
      val turns = buffered.get().map(BufTurn.toTurn(convId, _)).toList
      buffered.clear()
      if (turns.isEmpty) {
        // tombstone cleanup: drop all state, conv restarts numbering
        meta.clear()
        Iterator.empty
      } else {
        val pairs = SessionJoin.pairTurns(turns, gapSeconds)
          .map(p => p.copy(session_id = p.session_id + flushedSessions))
        val nSessions = sessionCountOf(turns)
        // one more timer to clean the tombstone a gap later; tracked in
        // meta so new data can supersede it cleanly
        val cleanup = timerValues.getCurrentWatermarkInMs() + gapSeconds * 1000
        meta.update((flushedSessions + nSessions, cleanup))
        getHandle.registerTimer(cleanup)
        pairs.iterator
      }
    }

    private def sessionCountOf(turns: Seq[Turn]): Long = {
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
