package graft.topo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.streaming.Sink

/** Topology assembly (SURVEY.md §2.1 / §3): the reference's
  * input → buffer → pipeline(processors) → output stream type
  * (reference: internal/stream/type.go:90-135) as a builder producing one
  * Dataset chain (batch) or StreamingQuery (streaming).
  *
  * The reference chains goroutines over Transaction channels; here every
  * "layer" is a DataFrame → DataFrame function and Catalyst fuses the whole
  * pipeline — thread-count configs (`pipeline.threads`, reference
  * internal/pipeline/constructor.go:45-48) have no equivalent because task
  * parallelism is partition-driven. The `buffer` layer is dropped
  * deliberately: micro-batching subsumes it (SURVEY.md §1.3).
  */
final case class Topology(
    input: SparkSession => DataFrame,
    procs: Vector[Topology.Proc] = Vector.empty) {

  def processors: Vector[DataFrame => DataFrame] = procs.map(_.f)

  /** Append a processor (the reference's pipeline layer adds them in config
    * order; order is preserved, reference internal/pipeline/processor.go:44-121).
    */
  def proc(p: DataFrame => DataFrame): Topology =
    copy(procs = procs :+ Topology.Proc(None, p))

  /** Append a labeled processor (the reference's `label:` field,
    * internal/docs/field.go component labels) — labels are the stable
    * addresses the unit-test mock mechanism targets.
    */
  def procLabeled(label: String, p: DataFrame => DataFrame): Topology =
    copy(procs = procs :+ Topology.Proc(Some(label), p))

  /** The reference test runner's `mocks:` mechanism (reference:
    * internal/cli/test/case.go:66-93 + docs/modules/configuration/pages/
    * unit_testing.adoc "mocks"): each key addresses a processor either by
    * its label or by JSON pointer path `/pipeline/processors/<i>`, and the
    * addressed processor is REPLACED by the mock before the pipeline runs;
    * the append form `/pipeline/processors/-` adds a processor at the end.
    * Unknown targets are an error, as in the reference (a silently
    * unmatched mock would make the test vacuous).
    */
  def withMocks(mocks: Map[String, DataFrame => DataFrame]): Topology = {
    val PathIdx = raw"/pipeline/processors/(\d+)".r
    val (appends, replaces) = mocks.partition(_._1 == "/pipeline/processors/-")
    val replaced = replaces.foldLeft(procs) { case (ps, (target, mock)) =>
      val idx = target match {
        case PathIdx(i) => i.toInt
        case label      => ps.indexWhere(_.label.contains(label))
      }
      require(idx >= 0 && idx < ps.size, s"mock target not found: $target")
      ps.updated(idx, ps(idx).copy(f = mock))
    }
    copy(procs = replaced ++ appends.values.map(Topology.Proc(None, _)))
  }

  def build(spark: SparkSession): DataFrame =
    procs.foldLeft(input(spark))((df, p) => p.f(df))

  /** Run with the exactly-once sink. */
  def run(spark: SparkSession, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Sink.exactlyOnce(build(spark), outDir, checkpointDir, trigger).start()
}

object Topology {

  /** One pipeline layer: an optional `label:` plus the transform. */
  final case class Proc(label: Option[String], f: DataFrame => DataFrame)

  /** fan_in broker (reference: internal/impl/pure/input_broker_fan_in.go):
    * merge N inputs into one stream.
    */
  def fanIn(inputs: Seq[SparkSession => DataFrame]): Topology =
    Topology(s => inputs.map(_(s)).reduce(_.unionByName(_, allowMissingColumns = true)))

  def fromParquet(path: String): Topology = Topology(_.read.parquet(path))

  def fromParquetStream(path: String, schemaDdl: String): Topology =
    Topology(_.readStream.schema(schemaDdl).parquet(path))

  /** file input with the csv codec (reference: internal/impl/io/input_file.go
    * + internal/codec/reader.go `csv`): schema-applied CSV scan, batch and
    * streaming forms. gzip-family compression is transparent (Hadoop
    * decompresses by file extension in both forms), which covers the
    * reference's `gzip` → `csv` codec chain for file sources.
    */
  def fromCsv(path: String, schemaDdl: String, header: Boolean = true): Topology =
    Topology(_.read.schema(schemaDdl).option("header", header.toString).csv(path))

  def fromCsvStream(path: String, schemaDdl: String, header: Boolean = true): Topology =
    Topology(_.readStream.schema(schemaDdl).option("header", header.toString).csv(path))

  /** file input with the lines codec (reference codec `lines`): one row per
    * line in `content`, with the originating file attached as `path` — the
    * reference's `path` metadata field (internal/impl/io/input_file.go:150).
    */
  def fromLines(path: String): Topology =
    Topology(s => s.read.text(path)
      .select(org.apache.spark.sql.functions.col("value").as("content"),
        org.apache.spark.sql.functions.input_file_name().as("path")))

  def fromLinesStream(path: String): Topology =
    Topology(s => s.readStream.text(path)
      .select(org.apache.spark.sql.functions.col("value").as("content"),
        org.apache.spark.sql.functions.input_file_name().as("path")))

  /** generate input (internal/impl/pure/input_generate.go): rate-limited
    * synthetic stream; `rowsPerSecond` maps the reference's `interval`.
    */
  def fromRate(rowsPerSecond: Int): Topology =
    Topology(_.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** switch output (reference: internal/impl/pure/output_switch.go:193-238):
    * route each row to the first matching case's sink; non-strict mode
    * drops unmatched rows. Implemented as per-case filters inside one
    * foreachBatch so the batch is scanned once from cache.
    */
  def switchSink(cases: Seq[(Column, (DataFrame, Long) => Unit)])(
      batch: DataFrame, batchId: Long): Unit = {
    batch.persist()
    try {
      cases.zipWithIndex.foreach { case ((check, sink), i) =>
        val notEarlier = cases.take(i).map(_._1).foldLeft(check)((acc, prev) => acc && !prev)
        sink(batch.filter(notEarlier), batchId)
      }
    } finally batch.unpersist()
  }
}
