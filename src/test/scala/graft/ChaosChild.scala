package graft

/** Test-only child process for BenchHarnessSpec: either behaves like a
  * well-formed benchmark block (prints one JSON line, exits 0) or dies
  * abruptly without printing — `halt` skips shutdown hooks, the closest
  * in-test stand-in for the OOM killer's SIGKILL that took round 4's
  * driver bench run.
  */
object ChaosChild {
  def main(args: Array[String]): Unit = args.headOption match {
    case Some("ok") =>
      println("""{"turns_per_sec":1234.5,"p99_latency_ms":42}""")
    case Some("noise-then-ok") =>
      println("WARN some log line")
      println("""{"turns_per_sec":99.0}""")
    case _ =>
      System.err.println("[chaos-child] dying without output")
      Runtime.getRuntime.halt(137)
  }
}
