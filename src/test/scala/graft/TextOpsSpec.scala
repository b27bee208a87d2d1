package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Text-analysis operator semantics: language ID, token counting, quality
  * score bounds, fingerprint stability under whitespace/case noise and
  * sensitivity to word order.
  */
class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("langId picks the stopword-dominant language, und when none hit") {
    val rows = Seq(
      ("the cat sat on the mat and it is warm", "en"),
      ("der hund ist nicht auf das sofa und die katze", "de"),
      ("le chat est dans la maison pour les vacances", "fr"),
      ("el perro es una mascota para los vecinos", "es"),
      ("qwerty zxcvb asdfgh", "und")
    ).toDF("text", "expected")
    val got = rows.select(col("expected"), TextOps.langId(col("text")).as("got"))
      .as[(String, String)].collect()
    got.foreach { case (exp, g) => assert(g == exp, s"expected $exp got $g") }
  }

  test("token counts: whitespace words and BPE-ish subword estimate") {
    val out = Seq("hello world", "internationalization", "a b c!").toDF("text")
      .select(TextOps.tokenCountWs(col("text")),
        TextOps.tokenCountBpe(col("text")))
      .as[(Int, Long)].collect().toSeq
    assert(out(0) == ((2, 4)))       // two 5-char words: ceil(5/4) = 2 each
    assert(out(1) == ((1, 5)))       // ceil(20/4) = 5 subword chunks
    assert(out(2) == ((3, 3)))       // punctuation folded into the word chunk
  }

  test("quality score stays in [0,1] and ranks real text above junk") {
    val out = Seq(
      "The quick brown fox jumps over the lazy dog and it is a fine day for running.",
      "!!!! ???? ,,,, ;;;;").toDF("text")
      .select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(out.forall(s => s >= 0.0 && s <= 1.0))
    assert(out(0) > out(1))
  }

  test("fingerprint: stable under whitespace/case noise, sensitive to order") {
    val fp = Seq(
      "alpha bravo charlie",
      "  ALPHA   bravo CHARLIE ",
      "charlie bravo alpha").toDF("text")
      .select(TextOps.fingerprint(col("text"))).as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("contentKey normalizes whitespace and case") {
    val keys = Seq("Hello  World", "hello world").toDF("text")
      .select(TextOps.contentKey(col("text"))).as[String].collect()
    assert(keys(0) == keys(1))
  }

  test("redactPii rewrites every pattern family, leaves clean text alone") {
    val cases = Seq(
      "mail bob.smith+x@corp-mail.co.uk now" -> "mail <EMAIL> now",
      "ssn is 123-45-6789 ok" -> "ssn is <SSN> ok",
      "card 4111 1111 1111 1111 and 4111-1111-1111-1111" -> "card <CARD> and <CARD>",
      "host 192.168.0.1 up" -> "host <IP> up",
      "call +1 (555) 010-9999 today" -> "call <PHONE> today",
      "no pii in this sentence" -> "no pii in this sentence")
    val got = cases.map(_._1).toDF("text")
      .select(TextOps.redactPii(col("text"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("repetition: duplicated n-gram fraction, short/clean texts score 0") {
    val df = Seq(
      ("loop", "a b c a b c a b c"), // 7 trigrams, 3 distinct
      ("clean", "one two three four five"),
      ("short", "just two")).toDF("id", "text")
    val got = TextOps.repetition(df, col("text"), 3)
      .select("id", "repetition").as[(String, Double)].collect().toMap
    assert(math.abs(got("loop") - (1.0 - 3.0 / 7.0)) < 1e-4)
    assert(got("clean") == 0.0)
    assert(got("short") == 0.0)
  }
}
