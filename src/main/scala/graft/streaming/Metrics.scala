package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-stage metrics (BASELINE.json north_star): rows/sec, state-store
  * size, watermark lag — exposed per progress event via a
  * StreamingQueryListener. Metric names mirror the reference's counters
  * (reference: internal/component/processor/processor_v2.go:62-67 —
  * `processor_received/sent`, `*_latency_ns`, `input_received`,
  * `output_sent`).
  */
class Metrics extends StreamingQueryListener {

  case class Snapshot(
      batchId: Long,
      inputReceived: Long, // reference: input_received
      outputSent: Long, // reference: output_sent
      rowsPerSec: Double, // processedRowsPerSecond
      stateRows: Long, // state-store size (rows)
      stateBytes: Long, // state-store size (bytes)
      watermarkLagMs: Long, // max event time - watermark
      batchLatencyMs: Long) // reference: *_latency_ns

  val snapshots: mutable.ArrayBuffer[Snapshot] = mutable.ArrayBuffer.empty

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val state = p.stateOperators
    val stateRows = if (state.isEmpty) 0L else state.map(_.numRowsTotal).sum
    val stateBytes = if (state.isEmpty) 0L else state.map(_.memoryUsedBytes).sum
    val wmLag = watermarkLagMs(p.eventTime)
    val latency = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    snapshots.synchronized {
      snapshots += Snapshot(p.batchId, p.numInputRows,
        Option(p.sink).map(_.numOutputRows).getOrElse(-1L),
        p.processedRowsPerSecond, stateRows, stateBytes, wmLag, latency)
    }
  }

  private def watermarkLagMs(eventTime: java.util.Map[String, String]): Long = {
    def parse(k: String): Option[Long] =
      Option(eventTime.get(k)).map(java.time.Instant.parse(_).toEpochMilli)
    (for { max <- parse("max"); wm <- parse("watermark") } yield max - wm).getOrElse(0L)
  }

  def p99LatencyMs: Long = snapshots.synchronized {
    if (snapshots.isEmpty) 0L
    else {
      val sorted = snapshots.map(_.batchLatencyMs).sorted
      sorted(((sorted.size - 1) * 99) / 100)
    }
  }

  def totalInputRows: Long = snapshots.synchronized(snapshots.map(_.inputReceived).sum)
}

object Metrics {
  /** Install a fresh listener on the session; returns it for inspection. */
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
