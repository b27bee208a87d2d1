package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal pipeline query: binary media column → partition-batched
  * decode stub → resize → frame-sample. The stub is a pure function of
  * doc_id, so DuckDB can recompute the expected metadata arithmetically —
  * the full mapPartitions path gets a real oracle.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.withMedia(Tables.documents(s, dir))
      val meta = Multimodal.decode(media)
      Multimodal.sampleFrames(Multimodal.resizeHalf(meta))
    }))

  val oracles: Map[String, String] = Map(
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST((64 + (doc_id % 16) * 32 + 1) // 2 AS INT) AS width,
        |  CAST((48 + (doc_id % 9) * 32 + 1) // 2 AS INT) AS height,
        |  ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INT) + 1] AS format,
        |  CAST(1 + doc_id % 7 AS INT) AS n_frames,
        |  CAST(32 + (doc_id % 11) * 8 AS INT) AS payload_bytes,
        |  CAST(greatest((1 + doc_id % 7 + 1) // 2, 1) AS INT) AS sampled_frames
        |FROM documents""".stripMargin
  )
}
