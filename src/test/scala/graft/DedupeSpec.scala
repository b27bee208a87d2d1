package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedupe

/** Dedupe family semantics: exact first-writer-wins (the reference's
  * dedupe processor, internal/old/processor/dedupe.go:128-170), MinHash
  * LSH near-dup recall on planted duplicates, SimHash Hamming locality,
  * and Jaccard ground truth.
  */
class DedupeSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"), // near dup of 0
    (3L, "pack my box with five dozen liquor jugs today"),
    (4L, "The  Quick Brown   Fox jumps over the lazy dog"), // whitespace/case dup of 0
    (5L, "completely different text about spark engines and catalyst plans")
  ).toDF("doc_id", "text")

  test("exactFirst keeps the smallest-ord row per key") {
    val out = Dedupe.exactFirst(docs, lower(regexp_replace(col("text"), "\\s+", " ")),
      col("doc_id")).select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 2L, 3L, 5L)) // 1 dups 0; 4 normalizes to 0's text
  }

  test("minhash LSH finds planted near-duplicates and verifies with exact jaccard") {
    val pairs = Dedupe.minhashDupPairs(docs, col("doc_id"), col("text"),
      threshold = 0.5, k = 3, numHashes = 24, bands = 12)
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // exact dup must be found (jaccard 1.0)
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    // no pair may involve the unrelated doc 5
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // every reported pair's jaccard must be >= threshold
    assert(pairs.forall(_._3 >= 0.5))
  }

  test("simhash: identical texts collide, unrelated texts are far") {
    val sigs = docs.select(col("doc_id"), Dedupe.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) < ham(sigs(0L), sigs(5L)))
  }

  test("jaccard ground truth on char ngrams") {
    val j = docs.filter(col("doc_id").isin(0L, 5L))
      .agg(collect_list(Dedupe.charNgrams(col("text"), 3)))
      .head.getSeq[Seq[String]](0)
    val (a, b) = (j(0).toSet, j(1).toSet)
    val expected = a.intersect(b).size.toDouble / a.union(b).size
    val got = docs.filter(col("doc_id") === 0L)
      .crossJoin(docs.filter(col("doc_id") === 5L).select(col("text").as("t2")))
      .select(Dedupe.jaccard(Dedupe.charNgrams(col("text"), 3),
        Dedupe.charNgrams(col("t2"), 3)))
      .head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("streaming dedupe drops in-watermark duplicates (bounded state)") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(("k1", ts0), ("k1", ts0), ("k2", ts0)).toDF("key", "ts")
    // batch semantics of the same op: dropDuplicates on (key, ts)
    val out = Dedupe.streamingDedupe(rows, "ts", "10 seconds", Seq("key"))
    assert(out.count() == 2)
  }
}
