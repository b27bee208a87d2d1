package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.ops.{Dedupe, Similarity, TextOps}

/** Micro-benchmark: native codegen expressions vs their higher-order-
  * function twins on a generated 2M-row corpus. Development tool backing
  * the BENCH.md claims (`runMain graft.MicroBench`).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.ensure(spark)
    import spark.implicits._

    val texts = spark.range(2000000L)
      .selectExpr("id", "concat('doc ', id, ' the quick brown fox jumps over the lazy dog number ', id % 1000, ' with extra tokens for measurement purposes!') AS text")
      .cache()
    texts.count()
    val vecs = spark.range(500000L)
      .selectExpr("id", "transform(sequence(1, 64), j -> cast(pmod(hash(id, j), 1000) / 500.0 - 1.0 as float)) AS emb")
      .cache()
    vecs.count()

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   (checksum $n)")
    }

    time("token_count HOF") {
      texts.select(sum(TextOps.tokenCountWs(col("text")))).head().getLong(0)
    }
    time("token_count native") {
      texts.select(sum(expr("graft_token_count(text)"))).head().getLong(0)
    }
    // the interpreted 64-bit-x-token nested fold is orders of magnitude
    // slower — measure it on 1% of the corpus and scale the headline
    val sample = texts.limit(20000).cache(); sample.count()
    time("simhash HOF (20k rows!)") {
      sample.select(sum(Dedupe.simhash(col("text")) % 1000)).head().getLong(0)
    }
    time("simhash native (2M rows)") {
      texts.select(sum(expr("graft_simhash64(text) % 1000"))).head().getLong(0)
    }
    // ngram jaccard: HOF costs a lambda per character — 20k-pair sample
    val pairSample = sample.selectExpr("text AS a", "concat(text, ' tail') AS b").cache()
    pairSample.count()
    val pairs = texts.selectExpr("text AS a", "concat(text, ' tail') AS b")
    time("ngram_jaccard HOF (20k rows!)") {
      pairSample.select(sum(
        Dedupe.jaccard(Dedupe.charNgrams(col("a"), 3), Dedupe.charNgrams(col("b"), 3)) * 1000))
        .head().getDouble(0).toLong
    }
    time("ngram_jaccard native (2M rows)") {
      pairs.select(sum(expr("graft_ngram_jaccard(a, b, 3) * 1000"))).head().getDouble(0).toLong
    }
    time("cosine HOF") {
      vecs.select(sum(Similarity.cosine(col("emb"), reverse(col("emb"))))).head().getDouble(0).toLong
    }
    time("cosine native") {
      vecs.select(sum(expr("graft_cosine(emb, reverse(emb))"))).head().getDouble(0).toLong
    }
    // the quantized-probe path: int8 vectors, ranked by the byte-array fold
    val qvecs = Similarity.quantizeInt8(vecs, col("id"), col("emb"))
      .select(col("id"), col("q")).cache()
    qvecs.count()
    time("cosine_i8 HOF") {
      qvecs.select(sum(Similarity.cosine(col("q"), reverse(col("q"))))).head().getDouble(0).toLong
    }
    time("cosine_i8 native") {
      qvecs.select(sum(expr("graft_cosine_i8(q, reverse(q))"))).head().getDouble(0).toLong
    }
    // kafka partitioner hashes: no HOF twin exists — the honest baseline
    // is Spark's own codegen'd xxhash64; the custom expressions must cost
    // the same (all three are one fused pass per row over the key bytes)
    val keys = texts.selectExpr("concat('conv-', lpad(cast(id % 1500000 as string), 7, '0')) AS k")
      .cache()
    keys.count()
    time("key hash xxhash64 (builtin)") {
      keys.select(sum(xxhash64(col("k")) % 1000)).head().getLong(0)
    }
    time("key hash fnv1a32 native") {
      keys.select(sum(expr("graft_fnv1a32(cast(k as binary)) % 1000"))).head().getLong(0)
    }
    time("key hash murmur2 native") {
      keys.select(sum(expr("graft_murmur2(cast(k as binary)) % 1000"))).head().getLong(0)
    }
    // the Bloblang text engine: the interpreted JSON-frame UDF vs the
    // Catalyst-compiled typed subset (BloblangCompiler) — identical
    // program text; the JSON doc is pre-materialized so the delta is
    // engine cost, not to_json
    val blProgram =
      """root.shout = this.text.uppercase()
        |root.n_words = this.text.split(" ").length()
        |root.tag = match this.role { "user" => "U", _ => "T" }
        |root.score = (this.text.length() / 10).round()""".stripMargin
    val frames = texts
      .selectExpr("id", "text",
        "CASE WHEN id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role")
      .withColumn("doc", to_json(struct(col("text"), col("role"))))
      .cache()
    frames.count()
    time("bloblang interpreted (2M)") {
      val run = graft.blob.Bloblang.procColumn(blProgram, Map.empty)
      // project first: the interpreter UDF is nondeterministic (env reads)
      // and may not appear directly inside an aggregate
      frames.select(length(run(col("doc")).getField("content")).as("l"))
        .agg(sum("l")).head().getLong(0)
    }
    time("bloblang compiled (2M)") {
      val stage = graft.blob.BloblangCompiler.stage(blProgram, frames.schema).get
      stage(frames).select(sum(length(col("shout")) + col("n_words")))
        .head().getLong(0)
    }
    // training-prep ops at corpus scale: the sampler must run at scan
    // speed (pure integer column math, zero shuffles) and packing at
    // one-shuffle window speed across 2M docs / 128 shards
    time("hash_sample 2M (map-side)") {
      graft.ops.TrainPrep.hashSample(texts, col("id"), 0.25, seed = 7).count()
    }
    time("pack_sequences 2M/128shard") {
      graft.ops.TrainPrep.packSequences(
        texts.withColumn("tok", expr("graft_token_count(text)").cast("long")),
        col("id"), col("tok"), budget = 2048, nShards = 128, strata = lit("all"))
        .select(sum(col("pack_last"))).head().getLong(0)
    }
    // awk execution modes on 5k rows: fresh process per message (the
    // faithful default) vs the pooled per-partition worker (same fresh
    // interpreter per message, dispatch through one long-lived sh)
    val awkRows = texts.limit(5000)
      .repartition(8).cache()
    awkRows.count()
    time("awk fresh-process (5k)") {
      graft.ops.Awk.proc(awkRows, "{ print $2 }", "text")
        .select(count(col("text"))).head().getLong(0)
    }
    time("awk pooled worker (5k)") {
      graft.ops.Awk.proc(awkRows, "{ print $2 }", "text", pooled = true)
        .select(count(col("text"))).head().getLong(0)
    }
    spark.stop()
  }
}
