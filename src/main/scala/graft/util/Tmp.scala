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
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else Paths.get(System.getProperty("java.io.tmpdir"))
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
