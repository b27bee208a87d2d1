package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Similarity-search queries over `embeddings` (64-dim FLOAT vectors):
  * brute-force cosine scoring with a DuckDB oracle, plus the LSH-bucketed
  * ANN scale path (xxhash64-derived hyperplanes → rows-only check;
  * recall asserted against brute force in SimilaritySpec).
  */
object SimilarityQueries {

  /** The query vector is the corpus's own vec_id=0 row — deterministic,
    * no external data. Collecting one 64-float row driver-side is the
    * broadcast-a-query pattern, not a driver-side loop.
    */
  private def queryVec(s: SparkSession, dir: String): Seq[Float] = {
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine vs vec 0, thresholded (a LIMIT k would make the
    // boundary row depend on last-ulp float differences across engines;
    // the threshold on a rounded score is cross-engine stable).
    "q_cosine_score" -> ((s, dir) => {
      val q = queryVec(s, dir)
      Tables.embeddings(s, dir)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"),
            array(q.map(v => lit(v)): _*)), 4).as("sim"))
        .filter(col("sim") >= 0.2)
    }),

    // the SAME cosine scoring through the native codegen'd Expression
    // (graft.functions.CosineSim) — same element-order double
    // accumulation, so it matches the identical DuckDB oracle bit-exactly.
    "q_cosine_score_native" -> ((s, dir) => {
      graft.functions.GraftExtensions.ensure(s)
      val q = queryVec(s, dir)
      Tables.embeddings(s, dir)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(call_function("graft_cosine", col("embedding"),
            array(q.map(v => lit(v)): _*)), 4).as("sim"))
        .filter(col("sim") >= 0.2)
    }),

    // brute-force top-k (rows-only: the k-th boundary is float-tie
    // sensitive across engines; SimilaritySpec pins it in-engine).
    "q_cosine_topk" -> ((s, dir) => {
      val q = queryVec(s, dir)
      Similarity.bruteForceTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        col("embedding"), q, 20)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    // ANN: LSH-bucketed probe then exact cosine in-bucket (rows-only).
    "q_ann_topk" -> ((s, dir) => {
      val q = queryVec(s, dir)
      Similarity.annTopK(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        col("embedding"), q, 20, bits = 4)
        .select(col("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    // IVF ANN: deterministic coarse centroids, nProbe nearest cells
    // scanned exactly (rows-only; full-probe == brute-force equivalence
    // asserted in SimilaritySpec).
    "q_ivf_topk" -> ((s, dir) => {
      val q = queryVec(s, dir)
      Similarity.ivfTopK(Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        col("vec_id"), col("embedding"), q, k = 20, nCells = 16, nProbe = 4)
        .select(col("id").as("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    // int8 quantization of the embedding column — the transform is
    // deterministic in IEEE double, so it gets a full DuckDB oracle
    // (per-vector scale + sum/min/max of the quantized values).
    "q_quantize" -> ((s, dir) => {
      Similarity.quantizeInt8(Tables.embeddings(s, dir), col("vec_id"), col("embedding"))
        .select(col("id").as("vec_id"), col("scale"),
          aggregate(col("q"), lit(0L), (a, b) => a + b.cast("long")).as("q_sum"),
          array_min(col("q")).cast("int").as("q_min"),
          array_max(col("q")).cast("int").as("q_max"))
    }),

    // brute-force top-k over the int8 index (rows-only: float-tie
    // boundary; recall vs the float baseline pinned in SimilaritySpec).
    "q_quantize_topk" -> ((s, dir) => {
      val q = queryVec(s, dir)
      val idx = Similarity.quantizeInt8(
        Tables.embeddings(s, dir).filter(col("vec_id") =!= 0),
        col("vec_id"), col("embedding"))
      Similarity.bruteForceTopKInt8(idx, q, 20)
        .select(col("id").as("vec_id"), round(col("sim"), 4).as("sim"))
    }),

    // embedding near-dup pairs, LSH-bucketed (rows-only).
    "q_cosine_dup_pairs" -> ((s, dir) => {
      Similarity.cosineDupPairs(Tables.embeddings(s, dir), col("vec_id"),
        col("embedding"), threshold = 0.35, bits = 4)
        .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
    }))

  /** DuckDB cosine built with the same left-to-right fold as the Spark
    * `aggregate` implementation, element-wise in double, so both engines
    * produce bit-identical sums (list_cosine_similarity may not).
    */
  private val cosSql =
    """list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE)))))""".stripMargin

  private val cosineScoreSql =
    s"""SELECT vec_id, sim FROM (
       |  SELECT e.vec_id, round($cosSql, 4) AS sim
       |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
       |  WHERE e.vec_id <> 0)
       |WHERE sim >= 0.2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_quantize" ->
      """SELECT vec_id,
        |  CAST(maxabs AS DOUBLE) / 127.0 AS scale,
        |  CAST(coalesce(list_sum(qv), 0) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS INT) AS q_min,
        |  CAST(list_max(qv) AS INT) AS q_max
        |FROM (
        |  SELECT vec_id, maxabs,
        |    CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> CAST(0 AS TINYINT))
        |         ELSE list_transform(embedding, x ->
        |           CAST(round(CAST(x AS DOUBLE) * 127.0 / CAST(maxabs AS DOUBLE)) AS TINYINT)) END AS qv
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(x))) AS maxabs
        |        FROM embeddings))""".stripMargin,
    "q_cosine_score_native" -> cosineScoreSql,
    "q_cosine_score" ->
      s"""SELECT vec_id, sim FROM (
         |  SELECT e.vec_id, round($cosSql, 4) AS sim
         |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0)
         |WHERE sim >= 0.2""".stripMargin
  )
}
