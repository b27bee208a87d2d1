package graft.util

import java.nio.file.{Files, Path, Paths}

/** Ephemeral working dirs for staged streams, checkpoints and state.
  *
  * Structured Streaming's checkpoint/state protocol is fsync-heavy (WAL,
  * commit log, per-partition state snapshots every batch). On this
  * sandbox's VM disk those fsyncs serialize and cap scaling, so ephemeral
  * run state goes to tmpfs when available — the local[n] stand-in for a
  * cluster's fast local SSDs + object-store checkpoints. Durable outputs
  * are unaffected (callers pass explicit paths).
  */
object Tmp {
  private val base: Path = {
    // GRAFT_TMP_BASE overrides (e.g. the sustained-input staging child
    // writes its ~10 GB corpus to real disk so it doesn't occupy RAM
    // while the engine children hold 15-20 GB of RocksDB state)
    sys.env.get("GRAFT_TMP_BASE").map(Paths.get(_)).filter(Files.isDirectory(_))
      .getOrElse {
        val shm = Paths.get("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
        else Paths.get(System.getProperty("java.io.tmpdir"))
      }
  }

  def dir(prefix: String): String =
    Files.createTempDirectory(base, prefix).toString

  /** Delete stale graft temp dirs (matching `prefixes`, last modified
    * more than `olderThanMs` ago) from the temp base. An OOM-killed
    * benchmark run skips its own cleanup, and its staged corpora keep
    * occupying tmpfs RAM — round 4's killed driver run left ~11 GB in
    * /dev/shm, a standing memory-pressure tax on whatever ran next. The
    * bench parent sweeps at startup; the age guard keeps a sweep from
    * touching a concurrent run's live staging.
    */
  def sweepStale(prefixes: Seq[String], olderThanMs: Long = 30 * 60 * 1000L,
      baseDir: Option[String] = None): Long = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    val kids = baseDir.map(new java.io.File(_)).getOrElse(base.toFile).listFiles()
    if (kids == null) 0L
    else kids.count { f =>
      val stale = prefixes.exists(f.getName.startsWith) && f.lastModified() < cutoff
      if (stale) delete(f.getPath)
      stale
    }.toLong
  }

  /** Best-effort recursive delete — run dirs are ephemeral by contract. */
  def delete(path: String): Unit = {
    def rec(p: java.io.File): Unit = {
      val kids = p.listFiles()
      if (kids != null) kids.foreach(rec)
      p.delete(): Unit
    }
    try rec(new java.io.File(path)) catch { case _: Throwable => () }
  }
}
