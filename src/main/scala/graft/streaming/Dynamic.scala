package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** `dynamic` input / output (SURVEY.md §2.2/§2.3; reference:
  * internal/impl/net/input_dynamic.go + input_dynamic_fan_in.go,
  * output_dynamic.go + output_dynamic_fan_out.go): a fan-in whose member
  * inputs — and a fan-out whose member outputs — are added and removed BY
  * NAME at runtime, without restarting the pipeline, with onAdd/onRemove
  * lifecycle hooks. The reference exposes the registry over REST
  * (`/inputs/{id}`); here it's the API surface itself — transport is an
  * operational concern (the http_server source shows the pattern).
  *
  * Spark mapping — a running Structured Streaming query cannot splice a
  * new source into its plan, so:
  *  - dynamic INPUT: each named input is its own tiny staging query (or a
  *    one-shot batch write) that lands rows into a shared spool directory,
  *    partitioned `input=<name>/`; the downstream pipeline is ONE file
  *    stream over the spool that never restarts. Adding an input starts
  *    its stager; removing stops it. The spool is the same durable WAL
  *    shape the socket/http_server sources use — multi-executor readable,
  *    replayable, and the `input` column carries provenance.
  *  - dynamic OUTPUT: a foreachBatch fan-out that snapshots the registry
  *    at each micro-batch commit and writes the batch to every member
  *    through the idempotent sink (each member keeps exactly-once on its
  *    own lineage). Membership changes apply from the next batch on —
  *    the same commit-boundary semantics as the reference's fan-out,
  *    which completes in-flight messages before dropping an output.
  */
object Dynamic {

  // ----------------------------------------------------------- dynamic input

  final class FanIn(spark: SparkSession, val spoolDir: String,
      onAdd: String => Unit = _ => (), onRemove: String => Unit = _ => ()) {
    Files.createDirectories(Paths.get(spoolDir))
    // member name -> (stager query, its checkpoint dir) for streaming
    // members; None for one-shot batch members
    private val stagers = new ConcurrentHashMap[String, Option[(StreamingQuery, String)]]()

    /** The one downstream stream: every current and future member's rows,
      * with the member name as the `input` column.
      */
    def stream(textCol: String = "content"): DataFrame =
      spark.readStream.text(spoolDir + "/input=*")
        .select(col("value").as(textCol),
          regexp_extract(input_file_name(), "input=([^/]+)/", 1).as("input"))

    def batch(textCol: String = "content"): DataFrame =
      spark.read.text(spoolDir + "/input=*")
        .select(col("value").as(textCol),
          regexp_extract(input_file_name(), "input=([^/]+)/", 1).as("input"))

    /** Add (or replace, reference semantics: upsert) a named input. A
      * streaming frame runs a continuous stager; a batch frame stages
      * once. `df` must have a single string column.
      *
      * Replacing a streaming member starts the NEW frame from its own
      * beginning (a replaced input is a new input, exactly the
      * reference's SetInput semantics) — rows its predecessor already
      * staged remain in the spool, so a re-add of the same source
      * re-stages them; key the member name by source if that matters.
      *
      * `synchronized`: the registry models a runtime REST surface, so
      * two concurrent add()s of one name must not both start stagers —
      * a lost stager would keep writing forever, unreachable by
      * remove().
      */
    def add(name: String, df: DataFrame): Unit = synchronized {
      remove(name) // upsert: the reference stops an existing input first
      val dir = s"$spoolDir/input=$name"
      Files.createDirectories(Paths.get(dir))
      // one column, any type: stringify for the text spool (the text
      // datasource itself only accepts strings)
      require(df.schema.fields.length == 1, "dynamic input frames carry one column")
      val lines = df.select(col(df.columns(0)).cast("string"))
      val q =
        if (lines.isStreaming) {
          val ck = s"$spoolDir/.ckpt-$name-${UUID.randomUUID()}"
          Some((lines.writeStream
            .format("text")
            .option("path", dir)
            .option("checkpointLocation", ck)
            .trigger(Trigger.ProcessingTime(0))
            .start(), ck))
        } else {
          // one-shot: stage distributed into a hidden tmp dir (dot-prefixed
          // files/dirs are invisible to the file stream), then move the
          // part files in atomically so the consumer never sees partials —
          // no driver-side collect of the member's data
          val tmp = s"$spoolDir/.stage-$name-${UUID.randomUUID()}"
          lines.write.format("text").save(tmp)
          val listing = Files.list(Paths.get(tmp))
          try listing.forEach { p =>
            val fn = p.getFileName.toString
            if (fn.startsWith("part-"))
              Files.move(p, Paths.get(dir, s"${UUID.randomUUID()}-$fn"),
                StandardCopyOption.ATOMIC_MOVE)
          } finally listing.close()
          graft.util.Tmp.delete(tmp)
          None
        }
      stagers.put(name, q)
      onAdd(name)
    }

    /** Stop and deregister a named input (files already staged remain —
      * the reference also completes in-flight messages on removal). The
      * stager's checkpoint is deleted: a replaced member never resumes
      * it, so keeping it would leak one tree per upsert.
      */
    def remove(name: String): Unit = synchronized {
      val q = stagers.remove(name)
      if (q != null) {
        q.foreach { case (query, ck) =>
          query.stop()
          graft.util.Tmp.delete(ck)
        }
        onRemove(name)
      }
    }

    def inputs: Seq[String] = stagers.keys.asScala.toSeq.sorted

    def close(): Unit = inputs.foreach(remove)
  }

  // ---------------------------------------------------------- dynamic output

  final class FanOut(onAdd: String => Unit = _ => (), onRemove: String => Unit = _ => ()) {
    private val outputs = new ConcurrentHashMap[String, String]()

    def add(name: String, dir: String): Unit = {
      outputs.put(name, dir)
      onAdd(name)
    }

    def remove(name: String): Unit =
      if (outputs.remove(name) != null) onRemove(name)

    def names: Seq[String] = outputs.keys.asScala.toSeq.sorted

    /** foreachBatch sink: the registry snapshot at commit time gets the
      * batch, each member through the idempotent commit protocol (so a
      * replayed batch stays exactly-once per member).
      */
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val snapshot = outputs.asScala.toMap
      if (snapshot.nonEmpty) {
        val materialized = batch.persist()
        try snapshot.values.foreach { dir =>
          Sink.writeBatchIdempotent(dir)(materialized, batchId)
        } finally materialized.unpersist()
      }
    }
  }
}
