package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.ops.{Dedupe, Similarity, TextOps}

/** Native codegen expressions must agree exactly with their higher-order-
  * function twins, resolve by name through the extensions registry, and
  * stay inside WholeStageCodegen.
  */
class NativeFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.ensure(spark)

  private val texts = Seq(
    "the quick brown fox",
    "  leading and trailing  ",
    "don't split contractions",
    "punct!!!then?words",
    "", "   ", "a",
    "digits 123 mix3d t0kens")

  test("graft_token_count equals the HOF token count on every input") {
    val df = texts.toDF("text")
    val got = df.select(expr("graft_token_count(text)"),
      TextOps.tokenCountWs(col("text"))).as[(Int, Int)].collect()
    got.foreach { case (native, hof) => assert(native == hof, texts) }
  }

  test("graft_simhash64 equals the HOF simhash on ASCII inputs") {
    val df = texts.filter(_.nonEmpty).toDF("text")
    val got = df.select(expr("graft_simhash64(text)"),
      Dedupe.simhash(col("text"))).as[(Long, Long)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("graft_simhash64 equality holds on non-ASCII text, locale-independently") {
    // both tokenizers treat non-ASCII letters as separators (the column
    // form's [^a-zA-Z0-9 ] class); no default-locale lowercasing anywhere
    val tricky = Seq("Überraschung İstanbul TITLE case",
      "naïve café déjà-vu MIXED", "日本語 tokens AND ascii 42")
    val got = tricky.toDF("text").select(expr("graft_simhash64(text)"),
      Dedupe.simhash(col("text"))).as[(Long, Long)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("graft_ngram_jaccard equals the HOF charNgrams+jaccard form") {
    val pairs = Seq(
      ("the quick brown fox", "the quick brown fox"),
      ("the quick brown fox", "a quick brown dog"),
      ("abc", "xyz"), ("ab", "ab"), ("", "abc"),
      ("ααβγ unicode über", "ααβδ unicode über"))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      expr("graft_ngram_jaccard(a, b, 3)"),
      Dedupe.jaccard(Dedupe.charNgrams(col("a"), 3), Dedupe.charNgrams(col("b"), 3)))
      .as[(Double, Double)].collect()
    got.foreach { case (native, hof) => assert(native == hof) }
  }

  test("graft_cosine is bit-identical to the HOF fold") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 50).map(_ => (Seq.fill(16)(rnd.nextFloat() - 0.5f),
      Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("a", "b")
    val got = df.select(expr("graft_cosine(a, b)"),
      Similarity.cosine(col("a"), col("b"))).as[(Double, Double)].collect()
    got.foreach { case (native, hof) => assert(native == hof) } // bit equality
  }

  test("graft_cosine_i8 is bit-identical to the HOF fold on byte arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(_ => (
      Seq.fill(16)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(16)((rnd.nextInt(255) - 127).toByte)))
    val df = rows.toDF("a", "b")
    val got = df.select(expr("graft_cosine_i8(a, b)"),
      Similarity.cosine(col("a"), col("b"))).as[(Double, Double)].collect()
    got.foreach { case (native, hof) => assert(native == hof) } // bit equality
    // zero-vector guard matches the HOF's when(d === 0, 0.0)
    val z = Seq((Seq.fill(4)(0.toByte), Seq.fill(4)(5.toByte))).toDF("a", "b")
    assert(z.select(expr("graft_cosine_i8(a, b)")).as[Double].head() == 0.0)
  }

  test("expressions participate in WholeStageCodegen") {
    // a file-backed frame so ConvertToLocalRelation can't pre-evaluate
    val dir = java.nio.file.Files.createTempDirectory("native").toString + "/d"
    texts.toDF("text").write.parquet(dir)
    val df = spark.read.parquet(dir).filter(expr("graft_token_count(text) > 1"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(1)` = WholeStageCodegen stage 1 wrapping the tokencount filter
    assert(plan.contains("*(1) Filter (tokencount"), plan)
    assert(df.count() == 5)
  }
}
