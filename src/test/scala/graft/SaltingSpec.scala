package graft

import org.apache.spark.sql.functions._
import graft.gen.TranscriptGen
import graft.streaming.SessionJoin

/** Hot-key handling (north_rule: "repartitions by hash(conv_id) with
  * salting for hot conversations to defeat skew"): salted repartition
  * must spread one hot conversation across many tasks for the map-heavy
  * stages without changing any downstream per-conv result.
  */
class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  test("salted repartition spreads a hot conversation across partitions") {
    // conv 0 is hot (generator multiplies its turn count 20x)
    val df = TranscriptGen.transcripts(spark, 40, 42L, hotConvs = 1).toDF()
    val parts = 8

    val plain = df.repartition(parts, col("conv_id"))
      .select(col("conv_id"), spark_partition_id().as("p"))
    val salted = SessionJoin.saltedRepartition(df, parts, salt = 8)
      .select(col("conv_id"), spark_partition_id().as("p"))

    def hotSpread(d: org.apache.spark.sql.DataFrame): Long =
      d.filter(col("conv_id") === "conv-000000").select("p").distinct().count()

    assert(hotSpread(plain) == 1L)      // all hot rows hit one task
    assert(hotSpread(salted) >= 4L)     // salt spreads them
  }

  test("salting does not change the session-join result") {
    val df = TranscriptGen.transcripts(spark, 40, 42L, hotConvs = 1).toDF()
    val direct = SessionJoin.pairBatch(df, 1800L)
      .orderBy("conv_id", "session_id", "reply_turn_idx").collect().toSeq
    val viaSalt = SessionJoin.pairBatch(
      SessionJoin.saltedRepartition(df, 8, salt = 8), 1800L)
      .orderBy("conv_id", "session_id", "reply_turn_idx").collect().toSeq
    assert(direct == viaSalt)
  }
}
