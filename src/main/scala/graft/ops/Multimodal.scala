package graft.ops

import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque BINARY columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample run as partition-batch
  * functions (`mapPartitions` over a typed Dataset — the Scala analogue of
  * arrow-batched Python UDFs).
  *
  * The actual codec work is STUBBED (no image/audio libraries in this
  * container): `encodeStub` produces a deterministic fake payload with a
  * real header, and `decodeHeader` parses it back. Everything around the
  * stub — schema, binary column handling, batch iteration, partitioning —
  * is real Spark plumbing, and because the stub is a pure function of
  * doc_id the whole path is oracle-checkable end-to-end.
  */
object Multimodal {

  val Magic: Int = 0x46414b45 // "FAKE"

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      format: String,
      n_frames: Int,
      payload_bytes: Int)

  private val formats = Array("png", "jpeg", "webp")

  /** Deterministic fake "media file": FAKE | width | height | fmt | frames
    * header + a payload whose length is a function of doc_id. Stands in
    * for real bytes read from object storage.
    */
  def encodeStub(docId: Long): Array[Byte] = {
    val width = 64 + (docId % 16).toInt * 32
    val height = 48 + (docId % 9).toInt * 32
    val fmt = (docId % 3).toInt
    val frames = 1 + (docId % 7).toInt
    val payloadLen = 32 + (docId % 11).toInt * 8
    val buf = ByteBuffer.allocate(20 + payloadLen)
    buf.putInt(Magic).putInt(width).putInt(height).putInt(fmt).putInt(frames)
    var i = 0
    while (i < payloadLen) { buf.put(((docId + i) % 251).toByte); i += 1 }
    buf.array()
  }

  /** Decode STUB — in production this is the image/audio codec call; here
    * it parses the deterministic header. Pure per-row function, invoked
    * batch-wise from mapPartitions.
    */
  def decodeHeader(media: Array[Byte]): Option[(Int, Int, String, Int, Int)] = {
    if (media == null || media.length < 20) None
    else {
      val buf = ByteBuffer.wrap(media)
      if (buf.getInt() != Magic) None
      else Some((buf.getInt(), buf.getInt(), formats(buf.getInt()),
        buf.getInt(), media.length - 20))
    }
  }

  /** Attach a fake media BINARY column to a docs frame (the plumbing a
    * real pipeline does with spark.read.format("binaryFile")).
    */
  def withMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(id => MediaRow(id, encodeStub(id)))
  }

  /** Partition-batched decode: one codec context per partition (the real
    * pattern for libjpeg/ffmpeg handles), rows streamed through it.
    * Malformed payloads are dropped, not failed — error-row semantics.
    */
  def decode(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec init" would go here
      rows.flatMap { r =>
        decodeHeader(r.media).map { case (w, h, fmt, frames, payload) =>
          MediaMeta(r.doc_id, w, h, fmt, frames, payload)
        }
      }
    }
  }

  /** Resize stub: halve dimensions (rounding up), keep format — metadata
    * transform only; a real impl would re-encode the payload.
    */
  def resizeHalf(meta: Dataset[MediaMeta]): Dataset[MediaMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map(m => m.copy(width = (m.width + 1) / 2, height = (m.height + 1) / 2))
  }

  /** Frame sampling stub for "video" rows: every 2nd frame, at least 1. */
  def sampleFrames(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().withColumn("sampled_frames",
      greatest((col("n_frames") + 1) / lit(2), lit(1)).cast("int"))
}
