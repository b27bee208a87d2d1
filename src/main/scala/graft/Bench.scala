package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark. Prints ONE COMPACT machine-parseable JSON line to
  * stdout (size-bounded: the driver's captured output tail is finite, and
  * rounds 1–2 lost their perf record to an oversized line) and writes the
  * full detail — per-query timings for every SparkEntry query, every trial
  * of every scaling level, the skew comparison — to `bench_detail.json`
  * (and stderr).
  *
  * Measurements, all on deterministic staged transcript streams:
  *  - per-query batch timings at SPARK_GRAFT_CPUS cores over
  *    SPARK_GRAFT_SF_DIR (exhausted via toRdd so projections are costed);
  *  - the flagship streaming session-join pipeline at full node width,
  *    BEST of a fixed SPARK_GRAFT_TRIALS trials (same estimator as the
  *    scaling levels, so the headline carries its own spread), plus a
  *    latency-shaped trigger config (small filesPerTrigger → many small
  *    micro-batches → tuned p99 instead of a 2-giant-batch artifact);
  *  - the north_rule scaling measurement at BOTH level pairs: the
  *    BASELINE.md-spirited 2→8 proxy and the bandwidth-unsaturated 1→4
  *    proxy (see BENCH.md §"scaling" for why one box under-reports the
  *    high pair: 4N executors bring 4× memory bandwidth, one socket
  *    doesn't), efficiency = (tps_hi/tps_lo)/(hi/lo) per pair, each
  *    pair's replay input sized to its high level (convsFor) so the
  *    fixed per-run cost stays under ~10% of the high level's trial;
  *  - the skew regime (north_star: salting for hot conversations):
  *    hotConvs dominated input through unsalted fmgws, salted fmgws, and
  *    the tws ListState engine, three-way;
  *  - the skew-HEAVY regime (salting-pays): conv-keyed time-sliced
  *    ingest + heavy per-turn map work, {light,heavy} x {unsalted,
  *    salted} x engines (SPARK_GRAFT_SKEW_HEAVY=0 skips);
  *  - sustained (SPARK_GRAFT_SUSTAINED=1 or =<convs>): one long trial
  *    per engine at ~3.4x the flagship input with the block cache sized
  *    to the state working set.
  *
  * Every streaming block carries emission accounting: the staged input's
  * batch-form pair count (DuckDB-oracle-equivalent ground truth), the
  * streamed pair count, their share, and the watermark at shutdown — so
  * a replay that silently drops or withholds join output (the round-3
  * staging artifact) fails loudly instead of reading as throughput.
  *
  * Methodology (BENCH.md §1): every trial is logged to stderr; the
  * reported per-level number is the BEST of a FIXED trial count (noise on
  * this shared host is strictly subtractive and hits parallel levels
  * hardest; the count is fixed up front — no optional stopping); data
  * layout and shuffle/state partitioning are IDENTICAL across levels (a
  * cluster resize changes executors, not partitioning); micro-batch count
  * is small so the per-batch serial driver term (~3 s/batch: planning,
  * offset/commit log, sink commit) doesn't dominate the high-core run.
  */
object Bench {

  private def session(cores: Int, shufflePartitions: Int = -1,
      blockCacheMB: Int = 512): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions",
        if (shufflePartitions > 0) shufflePartitions else cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Tmp.dir("spark-local"))
      // off-heap state: GC cost must not grow with session-state size
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // commit per-batch deltas instead of full snapshots
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // the default 8 MB block cache forces every per-key get() of a
      // multi-hundred-MB-per-partition state store back to (tmpfs) SST
      // files + block decompression — pure memory-bandwidth burn on the
      // high-core levels. Sized so the hot working set stays cached; on a
      // real cluster pair it with boundedMemoryUsage to cap the total.
      .config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", blockCacheMB.toString)
      // fewer memtable flush/compaction cycles per micro-batch commit
      .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "256")
      .config("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "3")
      // with changelog checkpointing the snapshot upload is pure
      // maintenance; at the default 60 s it fires MID-TRIAL and steals
      // cores + bandwidth from measured work (observed as a 2x slow
      // outlier trial at 8 cores). A real cluster runs maintenance on
      // idle executor threads; here it's deferred past the run.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    // ad-hoc experiment overrides: "k=v;k=v" applied last
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** JDK-17 module opens for hand-forked child JVMs (build.sbt's
    * javaOptions don't propagate to ProcessBuilder children).
    */
  private val childJvmFlags: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork a child JVM running `main`, stderr inherited, and return its
    * single stdout JSON line (the convention every graft main follows).
    * The heavy blocks run in children so their native RocksDB/allocator
    * residue — which the per-run provider unload cannot return to the
    * OS — dies with the child instead of accumulating in the bench JVM
    * (runs A4/B4 were OOM-killed by exactly that accumulation). Returns
    * None (and logs) on child failure; `okExits` lets a caller accept a
    * child's sentinel exit code (SkewHeavyBench exits 1 on sanity fail
    * but still prints its record).
    */
  private def forkJson(main: String, args: Seq[String], heapGB: Int,
      env: Map[String, String] = Map.empty,
      okExits: Set[Int] = Set(0)): (Option[String], Int) = {
    val cmd = Seq("java", s"-Xmx${heapGB}g") ++ childJvmFlags ++
      Seq("-cp", sys.props("java.class.path"), main) ++ args
    try {
      val pb = new ProcessBuilder(cmd: _*)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val exit = p.waitFor()
      val line = out.linesIterator.find(_.startsWith("{"))
      if (!okExits(exit) || line.isEmpty) {
        System.err.println(s"[bench] fork $main failed exit=$exit")
        (None, exit)
      } else (line, exit)
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] fork $main failed: $e"); (None, -1)
    }
  }

  /** Force full evaluation of every expression in the plan: `count()`
    * lets Catalyst prune unreferenced projections, so pure-projection
    * queries would be timed as bare parquet scans (round-1 verdict §3).
    * Iterating the UnsafeRow RDD materializes every output column.
    */
  private def exhaust(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  private def f(d: Double): String =
    BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  private def fs(ds: Seq[Double]): String = ds.map(f).mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1500000").toLong
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILES", "32").toInt
    // Each scaling pair replays an input sized to its HIGH level
    // (convsFor): a bounded replay carries ~4 s of per-run fixed cost
    // (stream query planning, per-partition RocksDB opens, commit
    // protocol) regardless of core count — a real cluster amortizes that
    // over hours of streaming, so the proxy must keep the high level's
    // trial long enough (>= ~1 min) that the fixed term stays under
    // ~10%, without the low level's trials blowing past ~4 min each.
    // SPARK_GRAFT_SCALE_CONVS is the input for an hi=8 pair; lower-hi
    // pairs scale down proportionally.
    val scaleBase = sys.env.get("SPARK_GRAFT_SCALE_CONVS").map(_.toLong).getOrElse(2 * nConvs)
    def convsFor(hi: Int): Long = math.max(1000L, scaleBase * hi / 8)
    val fpt = sys.env.getOrElse("SPARK_GRAFT_FPT", "16").toInt
    val latFpt = sys.env.getOrElse("SPARK_GRAFT_LAT_FPT", "2").toInt
    val nTrials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    // both level pairs: BASELINE.md's 8-vs-32-spirited low proxy (2→8)
    // first, then the bandwidth-unsaturated 1→4 proxy
    val pairs: Seq[(Int, Int)] = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIRS", "2:8,1:4")
      .split(",").toSeq.filter(_.nonEmpty)
      .map { p => val Array(a, b) = p.split(":"); (a.toInt, b.toInt) }
    // skew regime: 4 hot conversations at ~20000x the median turn count —
    // ~44% of all turns land in 4 keys, so a hot key is ~3x one
    // partition's whole baseline load (hot=4/mult=2000 over 200k convs
    // was only a 16% bump on one partition — not a skew regime)
    val skewConvs = sys.env.getOrElse("SPARK_GRAFT_SKEW_CONVS", "100000").toLong
    val hotConvs = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "4").toInt
    val hotMult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "20000").toInt
    val skewSalt = sys.env.getOrElse("SPARK_GRAFT_SKEW_SALT", "8").toInt
    val scalingOnly = sys.env.contains("SPARK_GRAFT_SCALING_ONLY")
    val skipSkew = sys.env.get("SPARK_GRAFT_SKEW").contains("0")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL", "bench_detail.json")

    // skew-heavy regime (salting-pays): conv-keyed time-sliced staging,
    // defaults = the recorded SkewHeavyBench experiment
    val skipSkewHeavy = scalingOnly || sys.env.get("SPARK_GRAFT_SKEW_HEAVY").contains("0")
    val shConvs = sys.env.getOrElse("SPARK_GRAFT_SKEW_HEAVY_CONVS", "50000").toLong
    val shHot = sys.env.getOrElse("SPARK_GRAFT_SKEW_HEAVY_HOT", "1").toInt
    val shMult = sys.env.getOrElse("SPARK_GRAFT_SKEW_HEAVY_MULT", "50000").toInt
    val shSlices = sys.env.getOrElse("SPARK_GRAFT_SKEW_HEAVY_SLICES", "4").toInt
    val shFps = sys.env.getOrElse("SPARK_GRAFT_SKEW_HEAVY_FPS", "8").toInt
    // sustained block (BASELINE metric is SUSTAINED turns/sec): one trial
    // per engine at ~3.4x the flagship input, block cache sized to the
    // state working set (BENCH.md "Sustained"). ON by default — runs in
    // forked child JVMs so its native-state residue cannot depress (or
    // OOM) the rest of the record; SPARK_GRAFT_SUSTAINED=0 disables,
    // =<convs> resizes.
    val sustainedConvs =
      if (scalingOnly) 0L
      else sys.env.getOrElse("SPARK_GRAFT_SUSTAINED", "1") match {
        case "0" | "false" => 0L
        case "1" | "true" => nConvs * 10 / 3 // ~3.4x the flagship input
        case n => n.toLong
      }

    // ---- sustained: one long trial per engine, all FORKED, FIRST -------
    // Staging (global sort + window scan of 100 M+ rows) and both engine
    // runs (~15-20 GB native state each) run in child JVMs: runs A4/B4
    // were OOM-killed doing this work in the bench JVM on top of the
    // session's accumulated native residue, and C4 was OOM-killed merely
    // WAITING on the staging child — the parent's own post-scaling RSS
    // plus the child's spike exceeded the box. So the block runs FIRST,
    // while the parent is residue-free, the staging child writes the
    // corpus to real disk (GRAFT_TMP_BASE) instead of tmpfs-RAM, and the
    // parent only parses JSON lines and deletes the dir.
    val sustainedJson: String =
      if (sustainedConvs <= 0) "null"
      else {
        val staged = forkJson("graft.tools.SustainedStage",
          Seq(sustainedConvs.toString, nFiles.toString, cpus.toString), heapGB = 8,
          env = Map("GRAFT_TMP_BASE" -> "/tmp"))._1
        val dirRe = """"dir":"([^"]+)"""".r
        val bpRe = """"batch_pairs":(\d+)""".r
        (for {
          s <- staged
          dir <- dirRe.findFirstMatchIn(s).map(_.group(1))
          bp <- bpRe.findFirstMatchIn(s).map(_.group(1).toLong)
        } yield {
          val rows = Seq("fmgws", "tws").map { eng =>
            val line = forkJson("graft.Flagship",
              Seq(sustainedConvs.toString, cpus.toString, fpt.toString,
                nFiles.toString, (2 * cpus).toString, eng, dir),
              heapGB = 16,
              env = Map("SPARK_GRAFT_EXTRA_CONF" ->
                "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB=2048"))._1
            line.foreach(l => System.err.println(s"[bench] sustained $eng $l"))
            s""""$eng":${line.getOrElse("null")}"""
          }
          graft.util.Tmp.delete(dir)
          rows.mkString(
            s"""{"convs":$sustainedConvs,"batch_pairs":$bp,"block_cache_mb":2048,""",
            ",", "}")
        }).getOrElse("null")
      }

    // ---- stage deterministic inputs once -------------------------------
    val sGen = session(cpus)
    val warmDir = Flagship.stage(sGen, 2000L, nFiles = fpt)
    val inDir = Flagship.stage(sGen, nConvs, nFiles = nFiles)
    val skewDir = if (skipSkew) "" else
      Flagship.stage(sGen, skewConvs, nFiles = nFiles, hotConvs = hotConvs, hotMult = hotMult)
    // ground truth for emission accounting: the batch (window-function,
    // DuckDB-oracled) pair count on the same staged input — a bounded
    // streaming replay must emit exactly the subset of these pairs whose
    // session the final watermark closed (~all of them), and the record
    // carries the share so partial-emission bugs (round 3's staging
    // artifact) cannot hide in a throughput number again. The skew-heavy
    // and sustained blocks stage in their own child JVMs (see below).
    val inBatchPairs =
      graft.streaming.SessionJoin.pairBatch(sGen.read.parquet(inDir)).count()
    sGen.stop()

    // ---- headline flagship at full node width: best of fixed trials ----
    val sFull = session(cpus, 2 * cpus)
    Flagship.runStaged(sFull, warmDir, filesPerTrigger = fpt) // warmup
    val fullTrials = (1 to nTrials).map { i =>
      val r = Flagship.runStaged(sFull, inDir, filesPerTrigger = fpt)
      System.err.println(f"[bench] flagship cores=$cpus trial=$i turns_per_sec=${r.turnsPerSec}%.0f p99=${r.p99LatencyMs}ms elapsed=${r.elapsedSec}%.1fs")
      r
    }
    val rFull = fullTrials.maxBy(_.turnsPerSec)
    // latency-shaped trigger config: small filesPerTrigger → many small
    // micro-batches → p99 is a per-batch latency, not half the runtime
    val rLat = Flagship.runStaged(sFull, inDir, filesPerTrigger = latFpt)
    System.err.println(f"[bench] flagship latency-cfg fpt=$latFpt turns_per_sec=${rLat.turnsPerSec}%.0f p99=${rLat.p99LatencyMs}ms")
    sFull.stop()

    // ---- skew regime: unsalted / salted / tws under hot conversations --
    val (skewRuns, skewTrials): (Seq[(String, Flagship.Result)], Seq[(String, Flagship.Result)]) =
      if (skipSkew) (Seq.empty, Seq.empty) else {
      // (name, filesPerTrigger, engine, salt). The fpt=latFpt rows probe
      // the many-small-batches regime: fmgws re-serializes a hot key's
      // whole buffered state every micro-batch it's touched in
      // (O(batches x buffer) write amplification); tws's ListState
      // appends only the new turns — that's where it pays off.
      val configs: Seq[(String, Int, String, Int)] = Seq(
        ("fmgws", fpt, "fmgws", 0),
        ("fmgws_salted", fpt, "fmgws", skewSalt),
        ("tws", fpt, "tws", 0),
        (s"fmgws_fpt$latFpt", latFpt, "fmgws", 0),
        (s"tws_fpt$latFpt", latFpt, "tws", 0))
      // One JVM-wide warmup (codegen cache + JIT are global), then
      // INTERLEAVED trials — trial-outer, config-inner — each in a fresh
      // session: config-blocked best-of-N still flipped sign run-to-run
      // because ambient drift over the block's minutes hits later configs
      // harder (observed as monotonically declining throughput through
      // the block regardless of config); interleaving samples every
      // config under every noise window, and the per-run session keeps
      // one config's state-store residue out of the next measurement.
      locally { val s = session(8, 16)
        Flagship.runStaged(s, warmDir, filesPerTrigger = fpt); s.stop() }
      val all: Seq[(String, Flagship.Result)] = (1 to nTrials).flatMap { t =>
        configs.map { case (name, f, eng, saltN) =>
          val s = session(8, 16)
          val r = Flagship.runStaged(s, skewDir, f, engine = eng, salt = saltN)
          s.stop()
          System.err.println(f"[bench] skew $name trial=$t turns_per_sec=${r.turnsPerSec}%.0f p99=${r.p99LatencyMs}ms elapsed=${r.elapsedSec}%.1fs")
          name -> r
        }
      }
      val runs = configs.map { case (name, _, _, _) =>
        name -> all.collect { case (`name`, r) => r }.maxBy(_.turnsPerSec)
      }
      runs.foreach { case (n, r) =>
        System.err.println(f"[bench] skew best $n turns_per_sec=${r.turnsPerSec}%.0f p99=${r.p99LatencyMs}ms elapsed=${r.elapsedSec}%.1fs")
      }
      (runs, all)
    }
    if (!skipSkew) graft.util.Tmp.delete(skewDir)

    // ---- scaling: per-pair staged input, both levels of each pair ------
    // Data layout and shuffle partitioning IDENTICAL across levels (fixed
    // parts; a real cluster resize changes executors, not partitioning).
    // The extra (2x) scaling inputs are staged HERE, not up-front with
    // the others: GBs of additional tmpfs residency during the flagship
    // and skew stages would be exactly the ambient-memory-pressure
    // effect the provider-unload fix exists to eliminate.
    val scaleDirs: Map[Long, String] = {
      val extra = pairs.map(p => convsFor(p._2)).distinct.filter(_ != nConvs)
      val m: Map[Long, String] = if (extra.isEmpty) Map.empty else {
        val s = session(cpus)
        val staged = extra.map(c => c -> Flagship.stage(s, c, nFiles = nFiles)).toMap
        s.stop()
        staged
      }
      m + (nConvs -> inDir)
    }
    val levels = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val parts = 2 * levels.maxOption.getOrElse(8)
    def runTrials(cores: Int, dir: String, convs: Long): Seq[Flagship.Result] = {
      val s = session(cores, parts)
      Flagship.runStaged(s, warmDir, filesPerTrigger = fpt) // warmup
      val trials = (1 to nTrials).map { i =>
        val r = Flagship.runStaged(s, dir, filesPerTrigger = fpt)
        System.err.println(f"[bench] scaling trial cores=$cores convs=$convs trial=$i turns_per_sec=${r.turnsPerSec}%.0f elapsed=${r.elapsedSec}%.1fs")
        r
      }
      s.stop()
      trials
    }
    // distinct (cores, input) combos, low cores first within a pair
    val combos: Seq[(Int, Long)] = pairs.flatMap { case (lo, hi) =>
      val c = convsFor(hi); Seq((lo, c), (hi, c))
    }.distinct.sortBy(x => (x._1, x._2))
    val byCombo: Map[(Int, Long), Seq[Flagship.Result]] =
      combos.map { case (cores, convs) =>
        (cores, convs) -> runTrials(cores, scaleDirs(convs), convs)
      }.toMap
    scaleDirs.values.filter(_ != inDir).foreach(graft.util.Tmp.delete)
    graft.util.Tmp.delete(inDir)
    def bestTps(c: Int, n: Long): Double = byCombo((c, n)).map(_.turnsPerSec).max
    val pairJsons = pairs.map { case (lo, hi) =>
      val n = convsFor(hi)
      val eff = (bestTps(hi, n) / bestTps(lo, n)) / (hi.toDouble / lo)
      System.err.println(f"[bench] scaling pair $lo->$hi convs=$n tps_lo=${bestTps(lo, n)}%.0f tps_hi=${bestTps(hi, n)}%.0f efficiency=$eff%.3f")
      s"""{"lo":$lo,"hi":$hi,"convs":$n,"tps_lo":${f(bestTps(lo, n))},"tps_hi":${f(bestTps(hi, n))},"efficiency":${f(eff)}}"""
    }

    graft.util.Tmp.delete(warmDir)

    // ---- skew-heavy regime: conv-keyed ingest + heavy per-turn map -----
    // The regime the north_star's salting clause exists for (one hot
    // conversation wholly inside one scan task + real pre-join map work).
    // The whole block — staging, batch-pair oracle, 6 configs x N
    // interleaved trials, pair-equality sanity gate — IS the standalone
    // `graft.SkewHeavyBench` main; it runs as one child JVM (see
    // forkJson: ~20 streaming rigs' native residue dies with it) and its
    // JSON line embeds verbatim, argv and all.
    val skewHeavyJson: String =
      if (skipSkewHeavy) "null"
      else {
        val (line, exit) = forkJson("graft.SkewHeavyBench",
          Seq("8", shConvs.toString, shHot.toString, shMult.toString,
            skewSalt.toString, nTrials.toString, shSlices.toString, shFps.toString),
          heapGB = 12, okExits = Set(0, 1))
        if (exit == 1)
          System.err.println("[bench] skew-heavy child reported a SANITY failure (see its stderr)")
        line.foreach(l => System.err.println(s"[bench] skew-heavy $l"))
        // record a failed sanity gate in the record itself, not just logs
        line.map(l => l.patch(1, s""""sanity_ok":${exit == 0},""", 0)).getOrElse("null")
      }


    // ---- batch query timings (LAST, deliberately) -----------------------
    // The sweep's nine streaming rigs leave JVM-level residue (native
    // allocator arenas, GC history) that no per-run provider unload
    // recovers: with the sweep FIRST, the flagship read 1.5-2.2 M
    // turns/s with descending trials; sweep-last, 2.4-2.75 M ascending —
    // same binary, same input, same clean window. The sweep itself is
    // order-insensitive (independent sessions, per-query timings).
    // Failures are surfaced (stderr + sentinel -1), never folded into the
    // total as if they were timings.
    val results: Seq[(String, Double)] = if (scalingOnly) Seq.empty else {
      val spark = session(cpus)
      // absorb JVM/codegen warmup so the first measured query isn't penalized
      spark.range(10000000L).selectExpr("sum(id * 2)").collect()
      val rs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          exhaust(fn(spark, sfDir))
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] QUERY FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
            name -> -1.0
        }
      }
      spark.stop()
      rs
    }
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val nFailed = results.count(_._2 < 0)

    // ---- full detail: sidecar file + stderr ----------------------------
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val levelsJson = combos.map { case (c, n) =>
      s""""c${c}_n$n":${fs(byCombo((c, n)).map(_.turnsPerSec))}"""
    }.mkString("{", ",", "}")
    val skewJson =
      if (skewRuns.isEmpty) "null"
      else {
        val bests = skewRuns.map { case (n, r) =>
          s""""$n":{"turns_per_sec":${f(r.turnsPerSec)},"p99_latency_ms":${r.p99LatencyMs},""" +
            s""""elapsed_sec":${f(r.elapsedSec)},"max_state_rows":${r.maxStateRows},""" +
            s""""max_state_bytes":${r.maxStateBytes}}"""
        }
        // every interleaved trial, per config, in run order — the spread
        // a reported best must be judged against
        val trials = skewRuns.map { case (n, _) =>
          s""""$n":${fs(skewTrials.collect { case (`n`, r) => r.turnsPerSec })}"""
        }.mkString(""""trials_tps":{""", ",", "}")
        (bests :+ trials)
          .mkString(s"""{"convs":$skewConvs,"hot":$hotConvs,"hot_mult":$hotMult,"salt":$skewSalt,""", ",", "}")
      }
    val flagshipTrialsJson = fs(fullTrials.map(_.turnsPerSec))
    val pairShare = if (inBatchPairs == 0) 0.0 else rFull.pairs.toDouble / inBatchPairs
    val detail =
      s"""{"sf":"$sfDir","cpus":$cpus,"n_convs":$nConvs,"scale_base_convs":$scaleBase,"n_files":$nFiles,"fpt":$fpt,""" +
        s""""trials_per_level":$nTrials,"total_query_sec":${f(total)},"failed_queries":$nFailed,""" +
        s""""queries":$qs,""" +
        s""""flagship_trials_tps":$flagshipTrialsJson,""" +
        s""""flagship_best":{"turns":${rFull.turns},"pairs":${rFull.pairs},"batch_pairs":$inBatchPairs,""" +
        s""""pair_share":${f(pairShare)},"watermark_at_shutdown_ms":${rFull.watermarkMs},""" +
        s""""turns_per_sec":${f(rFull.turnsPerSec)},""" +
        s""""elapsed_sec":${f(rFull.elapsedSec)},"p99_latency_ms":${rFull.p99LatencyMs},""" +
        s""""max_state_rows":${rFull.maxStateRows},"max_state_bytes":${rFull.maxStateBytes}},""" +
        s""""latency_cfg":{"fpt":$latFpt,"turns_per_sec":${f(rLat.turnsPerSec)},"p99_latency_ms":${rLat.p99LatencyMs}},""" +
        s""""scaling_trials_tps":$levelsJson,""" +
        s""""scaling_pairs":${pairJsons.mkString("[", ",", "]")},""" +
        s""""skew":$skewJson,""" +
        s""""skew_heavy":$skewHeavyJson,""" +
        s""""sustained":$sustainedJson}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    System.err.println(s"[bench-detail] $detail")

    // compact extracts of the forked blocks' verbatim JSON (full records
    // live in the detail sidecar; the stdout line stays size-bounded)
    def jsonField(js: String, anchor: String, field: String): String = {
      val i = js.indexOf(anchor)
      if (i < 0) "null"
      else ("\"" + field + "\":(-?[0-9.]+)").r
        .findFirstMatchIn(js.substring(i)).map(_.group(1)).getOrElse("null")
    }
    val skewHeavyCompact =
      if (skewHeavyJson == "null") "null"
      else {
        val names = Seq("light_unsalted", "light_salted", "heavy_unsalted",
          "heavy_salted", "heavy_unsalted_tws", "heavy_salted_tws")
        val cfgs = names.map(n => s""""$n":${jsonField(skewHeavyJson, s""""$n":""", "best_tps")}""")
        (s""""pair_share":${jsonField(skewHeavyJson, "{", "emitted_pair_share")}""" +: cfgs)
          .mkString("{", ",", "}")
      }
    val sustainedCompact =
      if (sustainedJson == "null") "null"
      else s"""{"fmgws_tps":${jsonField(sustainedJson, "\"fmgws\":", "turns_per_sec")},""" +
        s""""tws_tps":${jsonField(sustainedJson, "\"tws\":", "turns_per_sec")},""" +
        s""""max_state_rows":${jsonField(sustainedJson, "\"fmgws\":", "max_state_rows")},""" +
        s""""pairs":${jsonField(sustainedJson, "\"fmgws\":", "pairs")},""" +
        s""""batch_pairs":${jsonField(sustainedJson, "{", "batch_pairs")}}"""

    // ---- the ONE compact stdout line (size-bounded ~800 bytes: no
    // per-query map — that detail lives in bench_detail.json/stderr) -----
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},""" +
        s""""failed_queries":$nFailed,"detail":"$detailPath",""" +
        s""""flagship":{"cores":$cpus,"turns":${rFull.turns},"pairs":${rFull.pairs},""" +
        s""""batch_pairs":$inBatchPairs,"pair_share":${f(pairShare)},""" +
        s""""watermark_at_shutdown_ms":${rFull.watermarkMs},""" +
        s""""turns_per_sec":${f(rFull.turnsPerSec)},"trials_tps":$flagshipTrialsJson,""" +
        s""""p99_latency_ms":${rFull.p99LatencyMs},"max_state_rows":${rFull.maxStateRows},""" +
        s""""max_state_bytes":${rFull.maxStateBytes},""" +
        s""""latency_cfg":{"fpt":$latFpt,"turns_per_sec":${f(rLat.turnsPerSec)},"p99_latency_ms":${rLat.p99LatencyMs}}},""" +
        s""""scaling":${pairJsons.mkString("[", ",", "]")},""" +
        s""""skew":${if (skewRuns.isEmpty) "null" else skewRuns.map { case (n, r) => s""""$n":${f(r.turnsPerSec)}""" }.mkString(s"""{"hot":$hotConvs,"hot_mult":$hotMult,""", ",", "}")},""" +
        s""""skew_heavy":$skewHeavyCompact,""" +
        s""""sustained":$sustainedCompact}""")
  }
}
