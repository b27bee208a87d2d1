package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Turn

/** Deterministic synthetic transcripts (FIXTURES.md §1): seeded, no
  * wall-clock, no external data. Used by ScalaTest goldens, the streaming
  * parity tests, and the scaling bench — NOT by the driver's DuckDB oracle
  * (those queries derive transcripts from events.parquet instead).
  *
  * Mirrors the reference's `generate` input
  * (reference: internal/impl/pure/input_generate.go:124-145), which
  * synthesizes messages from a mapping at an interval — here the "mapping"
  * is a pure function of (seed, conv, turn) and generation is distributed:
  * `spark.range(nConvs)` partitions the conv space across executors, each
  * conv expands to its turns map-side (no shuffle, no driver materialize).
  */
object TranscriptGen {

  val BaseEpoch: Long = 1704067200L // 2024-01-01T00:00:00Z

  /** splitmix64 — deterministic per-key hash chain. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rnd(seed: Long, parts: Long*): Long =
    parts.foldLeft(mix(seed))((acc, p) => mix(acc ^ p))
  private def pos(l: Long): Long = l & Long.MaxValue

  private val tools = Array("search", "python", "browser")
  private val loremWords = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  /** All turns of one conversation. Pure function — identical output for a
    * conv regardless of partitioning or parallelism.
    *
    * Shape per FIXTURES.md: 2..40 turns cycling user→assistant(→tool with
    * p≈0.2); ts monotone with 1..90s jitter; ~5% late stragglers (ts dips
    * below the previous turn); a >30min session gap every ~8 turns.
    */
  def turnsFor(seed: Long, convIdx: Long, hotConvs: Int = 0,
      hotMult: Int = 20): Seq[Turn] = {
    val convId = f"conv-$convIdx%06d"
    // Zipf-ish skew: the first `hotConvs` convs get their turn count
    // multiplied by `hotMult` so a few conversations dominate (exercises
    // salting and the per-key state-size regime — the skew bench raises
    // hotMult until one conversation is a visible fraction of the stream).
    val base = 2 + (pos(rnd(seed, convIdx, 1L)) % 39).toInt
    val n = if (convIdx < hotConvs) base * hotMult else base
    val startTs = BaseEpoch + convIdx % 1000 * 3600 + pos(rnd(seed, convIdx, 2L)) % 1800
    var ts = startTs
    (0 until n).map { i =>
      val r = pos(rnd(seed, convIdx, 3L, i.toLong))
      val role = (i % 5) match {
        case 0 | 3 => "user"
        case 1 | 4 => "assistant"
        case 2 => if (r % 10 < 4) "tool" else "assistant"
      }
      val tool = if (role == "tool") tools((r % 3).toInt) else null
      // session gap every 8 turns, else 1..90s delta
      val delta = if (i > 0 && i % 8 == 0) 2400 + r % 600 else 1 + r % 90
      ts += delta
      // 5% late stragglers: event-time before the previous turn
      val eventTs = if (i > 2 && r % 20 == 0) ts - 150 else ts
      val words = (0 until (3 + (r % 10)).toInt)
        .map(j => loremWords((pos(rnd(seed, convIdx, 4L, i.toLong, j.toLong)) % loremWords.length).toInt))
      Turn(convId, i, role, s"[$role $i] " + words.mkString(" "), tool,
        new Timestamp(eventTs * 1000L))
    }
  }

  /** Distributed generation: conv ids ranged across the cluster, turns
    * expanded map-side.
    */
  def transcripts(spark: SparkSession, nConvs: Long, seed: Long = 42L,
      hotConvs: Int = 0, hotMult: Int = 20): Dataset[Turn] = {
    import spark.implicits._
    spark.range(nConvs).flatMap(i => turnsFor(seed, i, hotConvs, hotMult))
  }
}
