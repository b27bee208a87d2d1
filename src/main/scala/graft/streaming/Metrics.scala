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
      query: String, // query name (or run id) — a session can run N streams
      batchId: Long,
      inputReceived: Long, // reference: input_received
      outputSent: Long, // reference: output_sent
      rowsPerSec: Double, // processedRowsPerSecond
      stateRows: Long, // state-store size (rows)
      stateBytes: Long, // state-store size (bytes)
      watermarkLagMs: Long, // max event time - watermark
      watermarkMs: Long, // absolute watermark (epoch ms; 0 until it moves)
      batchLatencyMs: Long, // reference: *_latency_ns
      durations: Map[String, Long]) // per-batch driver phases (walCommit, …)

  val snapshots: mutable.ArrayBuffer[Snapshot] = mutable.ArrayBuffer.empty

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val state = p.stateOperators
    val stateRows = if (state.isEmpty) 0L else state.map(_.numRowsTotal).sum
    val stateBytes = if (state.isEmpty) 0L else state.map(_.memoryUsedBytes).sum
    val wmLag = watermarkLagMs(p.eventTime)
    val wm = Option(p.eventTime.get("watermark"))
      .map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L)
    val latency = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    val durs = {
      val it = p.durationMs.entrySet().iterator()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.toLong }
      b.result()
    }
    // the listener is session-wide: without the query identity, N
    // concurrent streams' snapshots interleave indistinguishably
    val q = Option(p.name).getOrElse(p.id.toString)
    snapshots.synchronized {
      snapshots += Snapshot(q, p.batchId, p.numInputRows,
        Option(p.sink).map(_.numOutputRows).getOrElse(-1L),
        p.processedRowsPerSecond, stateRows, stateBytes, wmLag, wm, latency, durs)
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

  /** Final (max) watermark across all progress events — lets a bounded
    * replay's record state how far event time had advanced at shutdown,
    * i.e. which still-open sessions were legitimately NOT emitted.
    */
  def maxWatermarkMs: Long = snapshots.synchronized {
    if (snapshots.isEmpty) 0L else snapshots.map(_.watermarkMs).max
  }

  /** Sum of each driver-phase duration across batches (walCommit,
    * commitOffsets, queryPlanning, addBatch, triggerExecution, …) — the
    * per-batch serial term the scaling proxy's Amdahl fit blames lives
    * here, so the bench can report where it actually goes.
    */
  def durationTotals: Map[String, Long] = snapshots.synchronized {
    snapshots.flatMap(_.durations).groupMapReduce(_._1)(_._2)(_ + _)
  }
}

object Metrics {
  /** Install a fresh listener on the session; returns it for inspection. */
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }

  // ------------------------------------------------- per-partition metrics

  /** One task execution of one stage = one partition of one (micro-)batch.
    * rows/sec per partition is the north_star's per-partition exposure;
    * skew shows up as one partition's `rows` dwarfing its siblings.
    */
  final case class PartitionMetric(stage: String, stageId: Int,
      partitionId: Int, rows: Long, nanos: Long) {
    def rowsPerSec: Double = if (nanos == 0) 0.0 else rows * 1e9 / nanos
  }

  type PartitionAcc =
    org.apache.spark.util.CollectionAccumulator[PartitionMetric]

  def partitionAccumulator(spark: SparkSession, name: String): PartitionAcc = {
    val acc = new org.apache.spark.util.CollectionAccumulator[PartitionMetric]
    spark.sparkContext.register(acc, name)
    acc
  }

  /** Tap a frame with per-partition row/time counters for `stage`. The
    * counter registers a task-completion listener, so a partial drain by
    * a downstream limit still records the rows actually produced.
    * Accumulator semantics caveats: Spark discards accumulator updates
    * from FAILED task attempts (only successful attempts merge), and a
    * stage retry re-running a succeeded task records that partition
    * twice — read the tap as "per successful task attempt", not as an
    * exactly-once ledger. Pass-through is a narrow map (no shuffle, no
    * barrier), so the tap composes anywhere in a batch or streaming plan.
    */
  def tap(df: org.apache.spark.sql.DataFrame, stage: String,
      acc: PartitionAcc): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val ctx = org.apache.spark.TaskContext.get()
      val t0 = System.nanoTime()
      var n = 0L
      if (ctx != null)
        ctx.addTaskCompletionListener[Unit] { _ =>
          acc.add(PartitionMetric(stage, ctx.stageId(), ctx.partitionId(), n,
            System.nanoTime() - t0))
        }
      it.map { r => n += 1; r }
    }(enc)
  }
}
