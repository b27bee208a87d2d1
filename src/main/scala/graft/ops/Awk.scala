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
  *  With either codec, entries of an optional metadata map column become
  *  variables too (same key sanitisation, awk.go:809-813).
  *
  * Runs `/usr/bin/awk` (POSIX) with a FRESH process per message — the
  * faithful semantics (BEGIN/END/NR are per-message programs in the
  * reference, which re-executes its embedded interpreter per part). This
  * is the expensive mode by construction; for per-line streaming filters
  * use [[Subprocess.pipe]] (one long-lived child per partition). The
  * reference's goawk-registered custom functions (json_get/json_set/
  * metadata_set/timestamp_*, awk.go:463-608) need an embedded interpreter
  * and stay out of scope — the `json` codec's flattened variables cover
  * the read side, and `jq`/`bloblang` mappings cover structured writes.
  */
object Awk {

  def proc(df: DataFrame, program: String, codec: String = "text",
      textCol: String = "text", metaCol: Option[String] = None): DataFrame = {
    require(Set("text", "json").contains(codec), s"unrecognised codec: $codec")
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
          metaIdx.foreach { i =>
            val m = row.getMap[String, String](i)
            m.foreach { case (k, v) => vars(sanitize(k)) = v }
          }
          if (parseErr != null) vals(errIdx) = parseErr
          else runOne(program, vars, if (codec == "text") payload else " ") match {
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
