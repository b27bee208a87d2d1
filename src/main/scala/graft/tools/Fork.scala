package graft.tools

/** Fork a child JVM running a graft `main` and collect its single stdout
  * JSON line (the convention every graft benchmark main follows).
  *
  * Every measurement block runs in a child so its native residue —
  * RocksDB block caches/memtables and glibc allocator arenas that no
  * per-run provider unload can return to the OS — dies with the child
  * instead of accumulating in the long-lived bench JVM. Round 4's driver
  * run (and three of four builder campaign runs) were OOM-killed by
  * exactly that accumulation in the blocks that still ran in-parent;
  * round 5 moves the LAST in-parent work (flagship, skew, scaling
  * staging + levels, the batch sweep) into children, leaving the parent
  * a thin orchestrator that never creates a SparkSession.
  */
object Fork {

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

  /** Run `main` in a child JVM (stderr inherited) and return its first
    * stdout line starting with `{`, plus the exit code. Returns None on
    * child death, non-ok exit, or no JSON line — the caller records the
    * block as lost and continues; one killed block must never cost the
    * record (round 4's single end-of-run line lost every completed block
    * when the tail OOMed). `okExits` lets a caller accept a sentinel exit
    * (SkewHeavyBench exits 1 on a sanity failure but still prints its
    * record). Children get MALLOC_ARENA_MAX=2 unless the caller/parent
    * env overrides: per-thread glibc arenas were a measured part of the
    * round-4 native-residue growth at local[32].
    */
  def json(main: String, args: Seq[String], heapGB: Int,
      env: Map[String, String] = Map.empty,
      okExits: Set[Int] = Set(0)): (Option[String], Int) = {
    val cmd = Seq("java", s"-Xmx${heapGB}g") ++ childJvmFlags ++
      Seq("-cp", sys.props("java.class.path"), main) ++ args
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().putIfAbsent("MALLOC_ARENA_MAX", "2")
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val exit = p.waitFor()
      val line = out.linesIterator.find(_.startsWith("{"))
      if (!okExits(exit) || line.isEmpty) {
        System.err.println(s"[bench] fork $main ${args.mkString(" ")} failed exit=$exit")
        (None, exit)
      } else (line, exit)
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] fork $main failed: $e"); (None, -1)
    }
  }
}
