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
