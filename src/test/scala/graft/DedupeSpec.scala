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

  // ---------------------------------------------- connected components /

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedupe.connectedComponents(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  /** Reference union-find for cross-checking random graphs. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: a 400-node path converges in logarithmic rounds") {
    // a path is the adversarial diameter case — plain min-propagation
    // would need 400 rounds; the star-contraction default (50) must do.
    val edges = (0L until 399L).map(i => (i, i + 1))
    val got = ccMap(edges)
    assert(got.size == 400 && got.values.forall(_ == 0L))
  }

  test("connectedComponents: disjoint cliques resolve to their minima") {
    val c1 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val c2 = for (a <- 20L to 22L; b <- 20L to 22L if a < b) yield (a, b)
    val got = ccMap(c1 ++ c2)
    assert((10L to 13L).forall(got(_) == 10L) && (20L to 22L).forall(got(_) == 20L))
  }

  test("connectedComponents matches union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(ccMap(edges) == unionFind(edges))
  }

  test("connectedComponents: empty edge set yields an empty assignment") {
    assert(ccMap(Seq.empty).isEmpty)
  }

  test("dupClusters groups exact/near dup chains and flags first-wins keep") {
    val out = Dedupe.dupClusters(docs, col("doc_id"), col("text"),
      threshold = 0.5, k = 3, numHashes = 24, bands = 12)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    // 0,1,4 are exact-after-normalization dups; 2 is a near dup of them →
    // one transitive cluster rooted at 0. 3 and 5 stay singletons.
    assert(byId(0L) == (0L, 1) && byId(1L) == (0L, 0) && byId(4L) == (0L, 0))
    assert(byId(2L)._1 == 0L && byId(2L)._2 == 0)
    assert(byId(3L) == (3L, 1) && byId(5L) == (5L, 1))
    // exactly one keeper per cluster, and it is the min id
    val keepers = out.filter(_._3 == 1).map(_._1).toSet
    assert(keepers == out.map(_._2).toSet)
  }
}
