package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model.Turn
import graft.ops.Windows
import graft.streaming.SessionJoin

/** Window-assignment laws (FIXTURES.md: tumbling partition, sliding
  * multiplicity) and sessionization equivalence with the pure-Scala
  * session spec.
  */
class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def turnsAt(secs: Seq[Long]): Seq[Turn] =
    secs.zipWithIndex.map { case (s, i) =>
      Turn("c1", i, "user", s"t$i", null, new Timestamp(s * 1000))
    }

  test("tumbling windows partition rows: every row in exactly one window") {
    val df = turnsAt(Seq(0L, 1799, 3600, 3601, 7199, 10800)).toDF()
    val out = Windows.tumbling(df, col("ts"), "1 hour")
      .select(col("turn_idx"), unix_timestamp(col("window.start")).as("ws"))
      .as[(Int, Long)].collect().toMap
    assert(out == Map(0 -> 0L, 1 -> 0L, 2 -> 3600L, 3 -> 3600L, 4 -> 3600L, 5 -> 10800L))
  }

  test("sliding windows: each row lands in exactly size/slide windows") {
    val df = turnsAt(Seq(0L, 3600, 7200, 9999)).toDF()
    val out = Windows.sliding(df, col("ts"), "2 hours", "1 hour")
      .groupBy(col("turn_idx")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect()
    assert(out.forall(_._2 == 2L))
  }

  test("sessionize agrees with the pure-Scala session assignment (property)") {
    val rnd = new scala.util.Random(42)
    // property over 30 random gap sequences straddling the 1800s boundary
    (1 to 30).foreach { _ =>
      val gaps = List.fill(12)(1L + rnd.nextInt(4000))
      val times = gaps.scanLeft(1000L)(_ + _)
      val turns = turnsAt(times)
      val got = Windows.sessionize(turns.toDF(), col("conv_id"), col("ts"), 1800L,
        Seq(col("turn_idx")))
        .select("turn_idx", "session_id").as[(Int, Long)].collect().toMap
      // pure spec: new session when gap > 1800s
      var sid = -1L; var prev = Long.MinValue
      val expected = turns.map { t =>
        val s = t.ts.getTime / 1000
        if (prev == Long.MinValue || s - prev > 1800L) sid += 1
        prev = s
        t.turn_idx -> sid
      }.toMap
      assert(got == expected, s"gaps=$gaps")
    }
  }

  test("windowedAgg computes the traffic-light reduce shape") {
    // reference example buffer_system_window.go:96-127 transposed
    val turns = Seq(
      Turn("c1", 0, "user", "abc", null, new Timestamp(100L * 1000)),
      Turn("c1", 1, "tool", "de", "search", new Timestamp(200L * 1000)),
      Turn("c1", 2, "tool", "fgh", "python", new Timestamp(300L * 1000)),
      Turn("c2", 0, "user", "ij", null, new Timestamp(150L * 1000)))
    val out = Windows.windowedAgg(turns.toDF(), col("conv_id"), "ts", "1 hour",
      "10 seconds", Seq(count(lit(1)).as("n"), countDistinct(col("tool")).as("tools"),
        sum(length(col("text"))).as("chars")))
      .select("conv_id", "n", "tools", "chars")
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, n, t, ch) => c -> ((n, t, ch)) }.toMap
    assert(out("c1") == ((3L, 2L, 8L)))
    assert(out("c2") == ((1L, 0L, 2L)))
  }

  test("SessionJoin.pairTurns ignores emit order (sorts by ts, turn_idx)") {
    val turns = turnsAt(Seq(100L, 200, 5000, 5100))
      .map(t => if (t.turn_idx % 2 == 1) t.copy(role = "assistant") else t)
    val shuffled = scala.util.Random.shuffle(turns)
    assert(SessionJoin.pairTurns(shuffled, 1800L) == SessionJoin.pairTurns(turns, 1800L))
  }
}
