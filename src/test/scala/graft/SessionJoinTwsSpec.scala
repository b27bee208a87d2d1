package graft

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.gen.TranscriptGen
import graft.model.{PairedTurn, Turn}
import graft.streaming.{SessionJoin, SessionJoinTws, Sink}

/** The transformWithState session join must produce exactly the batch
  * form's rows — including across a checkpoint stop/resume and with new
  * data arriving after a conversation's flush (session-id offsetting and
  * timer supersession paths).
  */
class SessionJoinTwsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val twsSession = {
    // transformWithState requires the RocksDB state store
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def sortPairs(p: Seq[PairedTurn]) =
    p.sortBy(x => (x.conv_id, x.session_id, x.reply_turn_idx))

  test("transformWithState equals batch, incl. checkpoint resume and post-flush data") {
    val s = twsSession
    import s.implicits._
    val gap = 1800L
    val input = (0L until 6L).flatMap(TranscriptGen.turnsFor(11L, _))
    val expected = sortPairs(SessionJoin.pairBatch(input.toDF(), gap)
      .as[PairedTurn].collect().toSeq)

    val outDir = Files.createTempDirectory("tws-out").toString
    val ckDir = Files.createTempDirectory("tws-ck").toString
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Turn]
    val paired = SessionJoinTws.pairStreaming(mem.toDS(), gap, "10 minutes")

    def runOnce(): Unit = {
      val q = Sink.exactlyOnce(paired, outDir, ckDir, Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // first half, stop (simulated crash), resume from checkpoint
    val (h1, h2) = input.sortBy(_.ts.getTime).splitAt(input.size / 2)
    mem.addData(h1)
    runOnce()
    mem.addData(h2)
    // far-future flush so the watermark passes every session end
    mem.addData(Seq(Turn("zz-flush", 0, "user", "flush", null,
      new Timestamp(input.map(_.ts.getTime).max + 10L * 3600 * 1000))))
    runOnce()
    runOnce() // timers fire after the watermark advanced

    val got = Sink.readCommitted(s, outDir)
      .drop("_batch_id", "_partition_id").as[PairedTurn].collect().toSeq
    assert(sortPairs(got) == expected)
  }

  test("conversation resuming after flush continues session numbering") {
    val s = twsSession
    import s.implicits._
    val gap = 600L
    def t(i: Int, role: String, sec: Long) =
      Turn("c1", i, role, s"t$i", null, new Timestamp(sec * 1000))
    val burst1 = Seq(t(0, "user", 1000), t(1, "assistant", 1010))
    val burst2 = Seq(t(2, "user", 50000), t(3, "assistant", 50010))
    val flush1 = Turn("zz1", 0, "user", "f", null, new Timestamp(20000L * 1000))
    val flush2 = Turn("zz2", 0, "user", "f", null, new Timestamp(99999L * 1000))

    val outDir = Files.createTempDirectory("tws2-out").toString
    val ckDir = Files.createTempDirectory("tws2-ck").toString
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Turn]
    val paired = SessionJoinTws.pairStreaming(mem.toDS(), gap, "1 minute")
    def runOnce(): Unit = {
      val q = Sink.exactlyOnce(paired, outDir, ckDir, Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(burst1); runOnce()
    mem.addData(Seq(flush1)); runOnce(); runOnce() // burst1 session flushes
    mem.addData(burst2); runOnce()
    mem.addData(Seq(flush2)); runOnce(); runOnce() // burst2 flushes

    val got = Sink.readCommitted(s, outDir)
      .filter(!$"conv_id".startsWith("zz"))
      .select("session_id", "user_turn_idx", "reply_turn_idx")
      .as[(Long, Int, Int)].collect().toSeq.sorted
    // second burst is session 1 — numbering survived the first flush
    assert(got == Seq((0L, 0, 1), (1L, 2, 3)))
  }
}
