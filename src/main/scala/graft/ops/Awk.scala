package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.LinkedHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{MapType, StringType}

/** awk processor (SURVEY.md §2.4; reference:
  * internal/old/processor/awk.go): run an AWK program per message; the
  * program's full stdout replaces the message when non-empty (one trailing
  * newline stripped, awk.go:838-846), stderr or a non-zero exit marks the
  * row failed.
  *
  * Codecs (awk.go:300,792-813):
  *  - `text`: the whole message body is the program's stdin.
  *  - `json`: the message is parsed and flattened into AWK variables —
  *    nested keys joined with '.', arrays overwrite at the same path
  *    (flattenForAWK, awk.go:611-636), then non-[A-Za-z0-9_] chars become
  *    '_'; stdin is a single space.
  *  - `none`: stdin is a single space and no variables are injected
  *    (awk.go:806-813) — the custom-function surface still works.
  *  With `text`/`json`, entries of an optional metadata map column become
  *  variables too (same key sanitisation, awk.go:809-813).
  *
  * Runs `/usr/bin/awk` (POSIX) with a FRESH interpreter per message — the
  * faithful semantics (BEGIN/END/NR are per-message programs in the
  * reference, which re-executes its embedded interpreter per part).
  * `pooled = true` keeps those semantics but executes through one
  * long-lived per-partition worker (see [[PooledRunner]]) — same fresh
  * awk per message, ~6x cheaper dispatch. For per-line streaming filters
  * use [[Subprocess.pipe]] (one long-lived child per partition).
  *
  * The reference's goawk-registered custom functions (json_get, the
  * json_set / json_append families, json_delete/json_length/json_type,
  * metadata_get/metadata_set, the timestamp and create_json families,
  * print_log; awk.go:497-608) are
  * emulated over POSIX awk by [[AwkFuncs]]: when the program references
  * one, a prelude defines them in pure awk with reads seeded through a
  * generated BEGIN block and writes emitted as sentinel control lines
  * on stderr that are split from real error text and replayed onto the
  * message here
  * (gabs SetP/ArrayAppendP/DeleteP semantics, sorted-key Go-marshal
  * serialization). metadata_set writes back into `metaCol` when given.
  */
object Awk {

  def proc(df: DataFrame, program: String, codec: String = "text",
      textCol: String = "text", metaCol: Option[String] = None,
      pooled: Boolean = false): DataFrame = {
    require(Set("text", "json", "none").contains(codec), s"unrecognised codec: $codec")
    val base = Errors.withErrorCol(df)
    val schema = base.schema
    val textIdx = schema.fieldIndex(textCol)
    val errIdx = schema.fieldIndex(Errors.ErrCol)
    val metaIdx = metaCol.map(schema.fieldIndex)
    metaIdx.foreach { i =>
      schema(i).dataType match {
        case MapType(StringType, StringType, _) => ()
        case other => throw new IllegalArgumentException(
          s"${metaCol.get} must be MAP<STRING,STRING>, got $other")
      }
    }
    val useFns = AwkFuncs.uses(program)
    val useJsonFns = AwkFuncs.usesJson(program)
    val enc = Encoders.row(schema)
    base.mapPartitions { rows =>
      val mapper = new ObjectMapper()
      // pooled mode: one long-lived worker per partition (program staged
      // once, per-message seeds via a side file) instead of a fresh JVM
      // process spawn + temp program file per message
      val pool = if (pooled) Some(new PooledRunner(program, useFns)) else None
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) pool.foreach(w =>
        ctx.addTaskCompletionListener[Unit](_ => w.close()))
      val mapped = rows.map { row =>
        val payload = row.getString(textIdx)
        if (payload == null) row
        else {
          val vals = row.toSeq.toArray
          val vars = LinkedHashMap[String, String]()
          var parseErr: String = null
          // ONE parse of the payload, shared by the json-codec variable
          // flattening and the goawk json_* read seeds. A parse failure is
          // an immediate error only under codec=json; for the custom
          // functions it is NOT an error until a json function actually
          // runs (__JSON_OK=0 → __fail at call time, matching the
          // reference's lazy part.JSON()).
          var jsonRoot: JsonNode = null
          if (codec == "json" || (useFns && useJsonFns)) {
            try {
              val n = mapper.readTree(payload)
              if (n != null && !n.isMissingNode) jsonRoot = n
              if (codec == "json") {
                if (jsonRoot == null)
                  parseErr = "failed to parse part into json: empty document"
                else flatten("", jsonRoot, vars)
              }
            } catch {
              case e: Exception =>
                jsonRoot = null
                if (codec == "json")
                  parseErr = s"failed to parse part into json: ${e.getMessage}"
            }
          }
          val metaMap: Map[String, String] = metaIdx
            .filterNot(row.isNullAt)
            .map(i => row.getMap[String, String](i).toMap).getOrElse(Map.empty)
          if (codec != "none") metaMap.foreach { case (k, v) => vars(sanitize(k)) = v }

          val seed = if (!useFns) None else Some(
            AwkFuncs.seedBlock(Option(jsonRoot), metaMap, System.currentTimeMillis() / 1000L))

          if (parseErr != null) vals(errIdx) = parseErr
          else {
            val stdin = if (codec == "text") payload else " "
            val (exit, out, errRaw) = pool match {
              case Some(w) => w.run(seed, vars, stdin)
              case None =>
                val fullProgram = seed match {
                  case Some(s) => AwkFuncs.prelude + "\n" + s + "\n" + program
                  case None => program
                }
                runOne(fullProgram, vars, stdin)
            }
            // control ops ride stderr (see goawk_prelude.awk); anything
            // else on stderr is a real interpreter/program error
            val (plainErr, ops) =
              if (useFns) AwkFuncs.split(errRaw) else (errRaw, Nil)
            if (plainErr.trim.nonEmpty) vals(errIdx) = plainErr.trim
            else if (exit != 0)
              vals(errIdx) = s"awk interpreter returned non-zero exit code: $exit"
            else ops.find(_.op == "err") match {
              case Some(e) =>
                // a failed custom function aborts the program; the row
                // passes through unchanged with the error flag set and
                // all buffered mutations discarded (awk.go Process
                // returns nil+err → the copy's mutations are dropped)
                vals(errIdx) = e.fields.headOption.getOrElse("awk function error")
              case None =>
                ops.foreach { o =>
                  if (o.op == "log")
                    System.err.println(s"awk print_log [${o.fields(0)}] ${o.fields(1)}")
                }
                if (out.nonEmpty) vals(textIdx) = stripTrailingNl(out)
                else if (jsonRoot != null && AwkFuncs.applyJsonOps(jsonRoot, ops, mapper))
                  vals(textIdx) = AwkFuncs.compactSorted(jsonRoot)
                val ms = ops.filter(_.op == "ms")
                if (ms.nonEmpty) metaIdx.foreach { i =>
                  vals(i) = metaMap ++ ms.map(o => o.fields(0) -> o.fields(1))
                }
                vals(errIdx) = null
            }
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
      // Without a TaskContext (e.g. the iterator driven outside a Spark
      // task) the completion listener above never registers, and the sh
      // worker + its tmp dir would leak for the JVM lifetime — close the
      // pool when the iterator is exhausted instead (close() is
      // idempotent, so double-closing with the listener is harmless).
      pool match {
        case Some(w) if ctx == null =>
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = mapped.hasNext
              if (!h) w.close()
              h
            }
            def next(): Row = mapped.next()
          }
        case _ => mapped
      }
    }(enc)
  }

  private def sanitize(k: String): String = k.replaceAll("[^a-zA-Z0-9_]", "_")

  /** flattenForAWK (awk.go:611-636): maps recurse with '.'-joined paths,
    * array elements overwrite at the parent path, scalars stringify.
    */
  private def flatten(path: String, n: JsonNode, out: LinkedHashMap[String, String]): Unit = {
    if (n.isObject) {
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        flatten(if (path.isEmpty) e.getKey else s"$path.${e.getKey}", e.getValue, out)
      }
    } else if (n.isArray) {
      val it = n.elements()
      while (it.hasNext) flatten(path, it.next(), out)
    } else out(sanitize(path)) = n.asText()
  }

  private def stripTrailingNl(s: String): String =
    if (s.endsWith("\n")) s.dropRight(1) else s

  /** One message = one awk run. Variables pass via -v (backslashes doubled
    * because -v assignment interprets escape sequences; -v also gives
    * numeric-looking values POSIX strnum comparison semantics, which a
    * BEGIN-block string assignment would lose). The program itself passes
    * via `-f tmpfile`, NOT argv — the prelude + seed block scale with the
    * payload and a single argv element is capped at 128 KiB on Linux
    * (MAX_ARG_STRLEN), which a ~40 KiB JSON message would blow through.
    * Returns (exit, stdout, stderr).
    */
  /** Pooled execution: one long-lived `sh` worker per partition. The
    * (constant) prelude + user program are staged to a file ONCE; each
    * message writes its stdin payload and BEGIN seed block to fixed side
    * files and sends the worker one command line —
    * `awk -v … -f seed.awk -f prog.awk < in > out 2> err; echo __D$?` —
    * so the per-message cost is one sh-side fork+exec of awk (~1 ms)
    * instead of a JVM process spawn + temp program file + two drain
    * threads (~6 ms). Semantics are IDENTICAL to the fresh mode: a brand
    * new awk interpreter still runs per message (faithful per-part
    * BEGIN/END/NR, clean globals); `-v` keeps POSIX strnum semantics.
    * BEGIN order differs only in that the seed block precedes the
    * prelude's constant-table BEGIN — both are pure assignments with no
    * cross-reads (AwkSpec runs its whole table in both modes).
    */
  private final class PooledRunner(program: String, useFns: Boolean) {
    private val dir = java.nio.file.Paths.get(graft.util.Tmp.dir("awkpool"))
    private val progFile = dir.resolve("prog.awk")
    private val seedFile = dir.resolve("seed.awk")
    private val inFile = dir.resolve("in")
    private val outFile = dir.resolve("out")
    private val errFile = dir.resolve("err")
    java.nio.file.Files.write(progFile,
      ((if (useFns) AwkFuncs.prelude + "\n" else "") + program).getBytes(UTF_8))
    private val p = new ProcessBuilder("sh").start()
    private val toSh = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(p.getOutputStream, UTF_8))
    private val fromSh = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream, UTF_8))
    private def q(s: String): String = "'" + s.replace("'", "'\\''") + "'"

    def run(seed: Option[String], vars: LinkedHashMap[String, String],
        stdin: String): (Int, String, String) = {
      java.nio.file.Files.write(inFile, stdin.getBytes(UTF_8))
      seed.foreach(s => java.nio.file.Files.write(seedFile, s.getBytes(UTF_8)))
      val cmd = new StringBuilder("awk")
      vars.foreach { case (k, v) =>
        cmd.append(" -v ").append(q(s"$k=${v.replace("\\", "\\\\")}"))
      }
      seed.foreach(_ => cmd.append(" -f ").append(q(seedFile.toString)))
      cmd.append(" -f ").append(q(progFile.toString))
        .append(" < ").append(q(inFile.toString))
        .append(" > ").append(q(outFile.toString))
        .append(" 2> ").append(q(errFile.toString))
        .append("; echo __D$?")
      toSh.write(cmd.toString); toSh.newLine(); toSh.flush()
      var line = fromSh.readLine()
      while (line != null && !line.startsWith("__D")) line = fromSh.readLine()
      if (line == null)
        throw new IllegalStateException("awk pool worker exited unexpectedly")
      val exit = line.substring(3).trim.toInt
      (exit,
        new String(java.nio.file.Files.readAllBytes(outFile), UTF_8),
        new String(java.nio.file.Files.readAllBytes(errFile), UTF_8))
    }

    @volatile private var closed = false

    def close(): Unit = if (!closed) {
      closed = true
      try toSh.close() catch { case _: Exception => () }
      p.destroy()
      graft.util.Tmp.delete(dir.toString)
    }
  }

  private def runOne(program: String, vars: LinkedHashMap[String, String],
      stdin: String): (Int, String, String) = {
    val progFile = java.io.File.createTempFile("graft_awk", ".awk")
    try {
      java.nio.file.Files.write(progFile.toPath, program.getBytes(UTF_8))
      val cmd = Seq.newBuilder[String]
      cmd += "awk"
      vars.foreach { case (k, v) => cmd += "-v"; cmd += s"$k=${v.replace("\\", "\\\\")}" }
      cmd += "-f"; cmd += progFile.getAbsolutePath
      val p = new ProcessBuilder(cmd.result(): _*).start()
      val errBuf = new java.io.ByteArrayOutputStream()
      val outBuf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        try p.getErrorStream.transferTo(errBuf) catch { case _: Throwable => () }
      })
      drain.setDaemon(true); drain.start()
      // stdout must drain CONCURRENTLY with the stdin write: a message
      // larger than the combined pipe buffers (~128 KB) with an echoing
      // program would otherwise deadlock — parent blocked writing stdin,
      // awk blocked writing unread stdout
      val outDrain = new Thread(() => {
        try p.getInputStream.transferTo(outBuf) catch { case _: Throwable => () }
      })
      outDrain.setDaemon(true); outDrain.start()
      // A program that never touches its input (mawk exits immediately on
      // `{ }`) can close stdin before we write — that's fine, not an error.
      try {
        p.getOutputStream.write(stdin.getBytes(UTF_8))
        p.getOutputStream.close()
      } catch { case _: java.io.IOException => () }
      val exit = p.waitFor()
      outDrain.join(1000)
      drain.join(1000)
      (exit, new String(outBuf.toByteArray, UTF_8), new String(errBuf.toByteArray, UTF_8))
    } finally progFile.delete()
  }
}
