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
  * Runs `/usr/bin/awk` (POSIX) with a FRESH process per message — the
  * faithful semantics (BEGIN/END/NR are per-message programs in the
  * reference, which re-executes its embedded interpreter per part). This
  * is the expensive mode by construction; for per-line streaming filters
  * use [[Subprocess.pipe]] (one long-lived child per partition).
  *
  * The reference's goawk-registered custom functions (json_get, the
  * json_set / json_append families, json_delete/json_length/json_type,
  * metadata_get/metadata_set, the timestamp and create_json families,
  * print_log; awk.go:497-608) are
  * emulated over POSIX awk by [[AwkFuncs]]: when the program references
  * one, a prelude defines them in pure awk with reads seeded through a
  * generated BEGIN block and writes emitted as sentinel control lines
  * that are stripped from stdout and replayed onto the message here
  * (gabs SetP/ArrayAppendP/DeleteP semantics, sorted-key Go-marshal
  * serialization). metadata_set writes back into `metaCol` when given.
  */
object Awk {

  def proc(df: DataFrame, program: String, codec: String = "text",
      textCol: String = "text", metaCol: Option[String] = None): DataFrame = {
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
      rows.map { row =>
        val payload = row.getString(textIdx)
        if (payload == null) row
        else {
          val vals = row.toSeq.toArray
          val vars = LinkedHashMap[String, String]()
          var parseErr: String = null
          if (codec == "json") {
            try flatten("", mapper.readTree(payload), vars)
            catch { case e: Exception => parseErr = s"failed to parse part into json: ${e.getMessage}" }
          }
          val metaMap: Map[String, String] = metaIdx
            .filterNot(row.isNullAt)
            .map(i => row.getMap[String, String](i).toMap).getOrElse(Map.empty)
          if (codec != "none") metaMap.foreach { case (k, v) => vars(sanitize(k)) = v }

          // goawk custom-function emulation: parse the payload for the
          // json_* read seeds; a parse failure is NOT an error until a
          // json function actually runs (__JSON_OK=0 → __fail at call
          // time, matching the reference's lazy part.JSON()).
          var jsonRoot: JsonNode = null
          val fullProgram = if (!useFns) program else {
            if (useJsonFns) {
              try {
                val n = mapper.readTree(payload)
                if (n != null && !n.isMissingNode) jsonRoot = n
              } catch { case _: Exception => () }
            }
            AwkFuncs.prelude + "\n" +
              AwkFuncs.seedBlock(Option(jsonRoot), metaMap, System.currentTimeMillis() / 1000L) +
              "\n" + program
          }

          if (parseErr != null) vals(errIdx) = parseErr
          else runOne(fullProgram, vars, if (codec == "text") payload else " ") match {
            case Right(out) if useFns =>
              val (userOut, ops) = AwkFuncs.split(out)
              ops.find(_.op == "err") match {
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
                  if (userOut.nonEmpty) vals(textIdx) = stripTrailingNl(userOut)
                  else if (jsonRoot != null && AwkFuncs.applyJsonOps(jsonRoot, ops, mapper))
                    vals(textIdx) = AwkFuncs.compactSorted(jsonRoot)
                  val ms = ops.filter(_.op == "ms")
                  if (ms.nonEmpty) metaIdx.foreach { i =>
                    vals(i) = metaMap ++ ms.map(o => o.fields(0) -> o.fields(1))
                  }
                  vals(errIdx) = null
              }
            case Right(out) =>
              if (out.nonEmpty) vals(textIdx) = stripTrailingNl(out)
              vals(errIdx) = null
            case Left(err) => vals(errIdx) = err
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
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
    * because -v assignment interprets escape sequences).
    */
  private def runOne(program: String, vars: LinkedHashMap[String, String],
      stdin: String): Either[String, String] = {
    val cmd = Seq.newBuilder[String]
    cmd += "awk"
    vars.foreach { case (k, v) => cmd += "-v"; cmd += s"$k=${v.replace("\\", "\\\\")}" }
    cmd += program
    val p = new ProcessBuilder(cmd.result(): _*).start()
    val errBuf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try p.getErrorStream.transferTo(errBuf) catch { case _: Throwable => () }
    })
    drain.setDaemon(true); drain.start()
    // A program that never touches its input (mawk exits immediately on
    // `{ }`) can close stdin before we write — that's fine, not an error.
    try {
      p.getOutputStream.write(stdin.getBytes(UTF_8))
      p.getOutputStream.close()
    } catch { case _: java.io.IOException => () }
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    val exit = p.waitFor()
    drain.join(1000)
    val err = new String(errBuf.toByteArray, UTF_8)
    if (err.nonEmpty) Left(err.trim)
    else if (exit != 0) Left(s"awk interpreter returned non-zero exit code: $exit")
    else Right(out)
  }
}
