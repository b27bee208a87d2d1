package graft.tools

import graft.Flagship

/** One flagship measurement block — warmup + a FIXED number of trials
  * over a pre-staged input dir, optionally followed by a latency-shaped
  * trigger config — in a JVM of its own, printing one flat JSON line the
  * parent embeds verbatim. Serves both the headline flagship block
  * (cores = node width, latFpt set) and each scaling-level block
  * (cores = the level, latFpt = -1): identical estimator at every level
  * by construction.
  *
  * args: cores parts dir warmDir fpt trials latFpt batchPairs
  *  - latFpt -1 skips the latency config
  *  - batchPairs > 0 embeds emission accounting (pair_share vs the
  *    staged input's batch-oracle pair count, computed by StageBlock)
  */
object FlagshipBlock {

  private def f(d: Double): String =
    BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val parts = args(1).toInt
    val dir = args(2)
    val warmDir = args(3)
    val fpt = args(4).toInt
    val nTrials = args(5).toInt
    val latFpt = if (args.length > 6) args(6).toInt else -1
    val batchPairs = if (args.length > 7) args(7).toLong else -1L

    val spark = BenchSession.build(cores, parts, appName = "graft-flagship-block")
    Flagship.runStaged(spark, warmDir, filesPerTrigger = fpt) // warmup
    val trials = (1 to nTrials).map { i =>
      val r = Flagship.runStaged(spark, dir, filesPerTrigger = fpt)
      System.err.println(f"[bench] flagship cores=$cores trial=$i turns_per_sec=${r.turnsPerSec}%.0f p99=${r.p99LatencyMs}ms elapsed=${r.elapsedSec}%.1fs")
      r
    }
    val best = trials.maxBy(_.turnsPerSec)
    val latJson =
      if (latFpt <= 0) "null"
      else {
        val rLat = Flagship.runStaged(spark, dir, filesPerTrigger = latFpt)
        System.err.println(f"[bench] flagship latency-cfg fpt=$latFpt turns_per_sec=${rLat.turnsPerSec}%.0f p99=${rLat.p99LatencyMs}ms")
        s"""{"fpt":$latFpt,"turns_per_sec":${f(rLat.turnsPerSec)},"p99_latency_ms":${rLat.p99LatencyMs}}"""
      }
    spark.stop()

    val share =
      if (batchPairs <= 0) "null"
      else f(best.pairs.toDouble / batchPairs)
    println(
      s"""{"cores":$cores,"fpt":$fpt,"turns":${best.turns},"pairs":${best.pairs},""" +
        s""""batch_pairs":$batchPairs,"pair_share":$share,""" +
        s""""watermark_at_shutdown_ms":${best.watermarkMs},""" +
        s""""turns_per_sec":${f(best.turnsPerSec)},"elapsed_sec":${f(best.elapsedSec)},""" +
        s""""trials_tps":${trials.map(r => f(r.turnsPerSec)).mkString("[", ",", "]")},""" +
        s""""p99_latency_ms":${best.p99LatencyMs},"max_state_rows":${best.maxStateRows},""" +
        s""""max_state_bytes":${best.maxStateBytes},"latency_cfg":$latJson}""")
  }
}
