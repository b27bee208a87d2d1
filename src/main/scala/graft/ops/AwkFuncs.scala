package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, BooleanNode, DoubleNode, LongNode, ObjectNode, TextNode}

/** goawk custom-function emulation for the [[Awk]] processor (reference:
  * internal/old/processor/awk.go:497-608 function table, 650-780 runtime
  * bindings; exercised by awk_test.go and config/test/awk.yaml).
  *
  * The reference embeds goawk and registers Go closures (json_get, the
  * json_set / json_append families, json_delete/json_length/json_type,
  * metadata_get/metadata_set, the timestamp and create_json families,
  * print_log). We run POSIX awk (mawk) out of process, so the same
  * surface is reconstructed from two halves:
  *
  *  - READS are seeded into the program: a generated `BEGIN` block fills
  *    `__J[path]` (raw string for textual values, compact sorted-key JSON
  *    for everything else — exactly gabs' `String()` contract where Go's
  *    map marshal sorts keys), `__T[path]` (gabs type tags: numbers are
  *    always "float" because encoding/json unmarshals to float64),
  *    `__L[path]` (byte length for strings — Go `len` — element count for
  *    arrays) and `__M[key]` metadata. Array elements get numeric path
  *    segments (`obj.1.foo`), matching gabs path addressing.
  *  - WRITES are emitted by the prelude (goawk_prelude.awk on the
  *    classpath) as sentinel control lines on STDERR —
  *    `\035G\036 op \037 field \037 field`, with backslash, newline and
  *    the \037 field separator escaped — keeping stdout purely the user's
  *    (a control line glued onto an unterminated printf, or a payload
  *    echo forging an op, cannot happen); [[Awk]] splits stderr into ops
  *    vs real error text and this object replays the ops
  *    onto the parsed message with gabs semantics (SetP creates
  *    intermediate objects, ArrayAppendP wraps an existing non-array value
  *    as the first element, DeleteP ignores missing paths). A custom
  *    function error (unparseable JSON, bad date string) emits an `err`
  *    control line and exits 0: the row passes through unchanged with the
  *    error flag set, matching the reference's discard-the-copy behavior
  *    (awk.go Process returns nil+err → original part flagged).
  *
  * The prelude keeps `__J`/`__T`/`__L` coherent on writes so read-your-
  * writes works (awk_test.go "json set, get and set again"); parent-path
  * JSON encodings are not re-derived after a child write — a documented
  * emulation boundary (the reference re-marshals lazily per json_get).
  * Timestamp parsing/formatting implements Go layout tokens over
  * Hinnant's civil-date algorithms in pure awk, string-splitting
  * nanosecond values so 10^18-magnitude epochs never round through a
  * double.
  */
object AwkFuncs {

  /** The awk prelude (function definitions + name tables), loaded once per
    * executor from the classpath.
    */
  lazy val prelude: String = {
    val in = getClass.getResourceAsStream("/graft/goawk_prelude.awk")
    require(in != null, "missing resource graft/goawk_prelude.awk")
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private val FnRe =
    ("""\b(?:json_(?:get|set|set_int|set_float|set_bool|append|append_int|append_float|append_bool|delete|length|type)""" +
      """|metadata_(?:get|set)|timestamp_(?:unix|unix_nano|format|format_nano)|create_json_(?:object|array)|print_log)\s*\(""").r
  private val JsonFnRe = """\bjson_[a-z_]+\s*\(""".r

  /** Does the program reference any goawk custom function? (Injecting the
    * prelude unconditionally would collide with user-defined functions of
    * the same name, so it is gated on an actual reference.)
    */
  def uses(program: String): Boolean = FnRe.findFirstIn(program).isDefined

  /** Does it reference a json_* function (requiring the payload parsed)? */
  def usesJson(program: String): Boolean = JsonFnRe.findFirstIn(program).isDefined

  // ---- seed generation ------------------------------------------------

  /** Escape a value into an awk string literal (mawk: \n/\r/\t/\"/\\ plus
    * octal for other control bytes).
    */
  private def awkStr(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"'  => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 32 => b.append(f"\\${c.toInt}%03o")
      case c => b.append(c)
    }
    b.toString
  }

  /** The generated `BEGIN` seed block. `json` is the parsed payload when
    * the program uses json_* functions and the payload parsed (→ __JSON_OK
    * = 1); `meta` seeds metadata_get; `now` seeds timestamp_unix().
    */
  def seedBlock(json: Option[JsonNode], meta: Iterable[(String, String)], now: Long): String = {
    val b = new StringBuilder(256)
    b.append("BEGIN {\n")
    b.append(s"  __NOW = $now\n")
    b.append(s"  __JSON_OK = ${if (json.isDefined) 1 else 0}\n")
    json.foreach(seedNode(_, "", b))
    meta.foreach { case (k, v) =>
      b.append("  __M[\"").append(awkStr(k)).append("\"] = \"").append(awkStr(v)).append("\"\n")
    }
    b.append("}\n")
    b.toString
  }

  private def seedNode(n: JsonNode, path: String, b: StringBuilder): Unit = {
    if (path.nonEmpty) {
      val (tag, len) =
        if (n.isObject) ("object", 0)
        else if (n.isArray) ("array", n.size())
        else if (n.isTextual) ("string", n.asText().getBytes(UTF_8).length)
        else if (n.isBoolean) ("bool", 0)
        else if (n.isNull) ("null", 0)
        else ("float", 0) // encoding/json unmarshals every number to float64
      val v = if (n.isTextual) n.asText() else compactSorted(n)
      val p = awkStr(path)
      b.append("  __J[\"").append(p).append("\"] = \"").append(awkStr(v)).append("\"\n")
      b.append("  __T[\"").append(p).append("\"] = \"").append(tag).append("\"\n")
      b.append("  __L[\"").append(p).append("\"] = ").append(len).append("\n")
    }
    if (n.isObject) {
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        seedNode(e.getValue, if (path.isEmpty) e.getKey else s"$path.${e.getKey}", b)
      }
    } else if (n.isArray) {
      var i = 0
      while (i < n.size()) {
        seedNode(n.get(i), if (path.isEmpty) i.toString else s"$path.$i", b)
        i += 1
      }
    }
  }

  // ---- control-line protocol ------------------------------------------

  private val CtlPrefix = "\u001dG\u001e"

  final case class Op(op: String, fields: Array[String])

  /** Split the raw awk STDERR into plain error text (reassembled with
    * the original newlines) and the ordered sentinel control ops.
    */
  def split(out: String): (String, List[Op]) = {
    val tokens = out.split("\n", -1)
    val user = new mutable.ArrayBuffer[String](tokens.length)
    val ops = List.newBuilder[Op]
    tokens.foreach { t =>
      if (t.startsWith(CtlPrefix)) {
        val parts = t.substring(CtlPrefix.length).split("\u001f", -1)
        ops += Op(parts.head, parts.tail.map(unesc))
      } else user += t
    }
    (user.mkString("\n"), ops.result())
  }

  private def unesc(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'U' => b.append('\u001f'); i += 2
          case '\\' => b.append('\\'); i += 2
          case _ => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // ---- replaying json ops with gabs semantics --------------------------

  private def valueNode(tag: String, v: String): JsonNode = tag match {
    case "int" => LongNode.valueOf(v.toLong)
    case "float" => DoubleNode.valueOf(v.toDouble)
    case "bool" => BooleanNode.valueOf(v == "true")
    case _ => TextNode.valueOf(v)
  }

  /** Apply the json control ops to the parsed payload in order. Returns
    * true when any op was a mutation (→ the message content becomes the
    * re-marshaled tree even if an individual op was a gabs-style no-op,
    * matching setJSON in awk.go:692-699 which calls part.SetJSON
    * unconditionally).
    */
  def applyJsonOps(root: JsonNode, ops: List[Op], mapper: ObjectMapper): Boolean = {
    var dirty = false
    ops.foreach { o =>
      o.op match {
        case "js" => dirty = true; setP(root, o.fields(1), valueNode(o.fields(0), o.fields(2)), mapper)
        case "ja" => dirty = true; appendP(root, o.fields(1), valueNode(o.fields(0), o.fields(2)), mapper)
        case "jd" => dirty = true; deleteP(root, o.fields(0))
        case _ => ()
      }
    }
    dirty
  }

  private def idxOf(seg: String, size: Int): Int = {
    if (seg.isEmpty || !seg.forall(_.isDigit)) return -1
    val i = try seg.toInt catch { case _: NumberFormatException => return -1 }
    if (i < size) i else -1
  }

  /** gabs SetP: descend, creating missing intermediate OBJECTS; arrays are
    * addressed by in-range numeric segments; a path collision with an
    * existing scalar aborts the op silently (the reference ignores SetP's
    * error).
    */
  private def setP(root: JsonNode, path: String, v: JsonNode, mapper: ObjectMapper): Unit = {
    val segs = path.split("\\.", -1)
    var cur: JsonNode = root
    var i = 0
    while (i < segs.length - 1) {
      cur match {
        case o: ObjectNode =>
          var child = o.get(segs(i))
          if (child == null) {
            val nn = mapper.createObjectNode()
            o.set[com.fasterxml.jackson.databind.JsonNode](segs(i), nn)
            child = nn
          }
          cur = child
        case a: ArrayNode =>
          val idx = idxOf(segs(i), a.size())
          if (idx < 0) return
          cur = a.get(idx)
        case _ => return
      }
      i += 1
    }
    cur match {
      case o: ObjectNode => o.set[com.fasterxml.jackson.databind.JsonNode](segs.last, v)
      case a: ArrayNode =>
        val idx = idxOf(segs.last, a.size())
        if (idx >= 0) a.set(idx, v)
      case _ => ()
    }
  }

  private def searchP(root: JsonNode, path: String): Option[JsonNode] = {
    var cur: JsonNode = root
    path.split("\\.", -1).foreach { seg =>
      cur match {
        case o: ObjectNode =>
          cur = o.get(seg)
          if (cur == null) return None
        case a: ArrayNode =>
          val idx = idxOf(seg, a.size())
          if (idx < 0) return None
          cur = a.get(idx)
        case _ => return None
      }
    }
    Some(cur)
  }

  /** gabs ArrayAppendP: existing array → append; existing non-null value →
    * wrapped as the array's first element (awk_test.go "json array append
    * 4"); missing/null → fresh single-element array.
    */
  private def appendP(root: JsonNode, path: String, v: JsonNode, mapper: ObjectMapper): Unit = {
    searchP(root, path) match {
      case Some(a: ArrayNode) => a.add(v)
      case Some(existing) if !existing.isNull =>
        val arr = mapper.createArrayNode()
        arr.add(existing.deepCopy[JsonNode]())
        arr.add(v)
        setP(root, path, arr, mapper)
      case _ =>
        val arr = mapper.createArrayNode()
        arr.add(v)
        setP(root, path, arr, mapper)
    }
  }

  /** gabs DeleteP: missing intermediates → silent no-op. */
  private def deleteP(root: JsonNode, path: String): Unit = {
    val segs = path.split("\\.", -1)
    var cur: JsonNode = root
    var i = 0
    while (i < segs.length - 1) {
      cur match {
        case o: ObjectNode =>
          cur = o.get(segs(i))
          if (cur == null) return
        case a: ArrayNode =>
          val idx = idxOf(segs(i), a.size())
          if (idx < 0) return
          cur = a.get(idx)
        case _ => return
      }
      i += 1
    }
    cur match {
      case o: ObjectNode => o.remove(segs.last)
      case a: ArrayNode =>
        val idx = idxOf(segs.last, a.size())
        if (idx >= 0) a.remove(idx)
      case _ => ()
    }
  }

  // ---- Go-marshal-shaped serialization ---------------------------------

  private val quoteMapper = new ObjectMapper()

  /** Compact JSON with object keys sorted bytewise at every level — the
    * shape Go's json.Marshal gives a map[string]interface{} (awk_test.go
    * expects `{"foo":{...},"init":{...}}` key order regardless of input
    * order).
    */
  def compactSorted(n: JsonNode): String = {
    val b = new StringBuilder(64)
    writeSorted(n, b)
    b.toString
  }

  private def writeSorted(n: JsonNode, b: StringBuilder): Unit = {
    if (n.isObject) {
      b.append('{')
      val keys = new mutable.ArrayBuffer[String]
      val it = n.fieldNames()
      while (it.hasNext) keys += it.next()
      val sorted = keys.sorted
      var first = true
      sorted.foreach { k =>
        if (!first) b.append(',')
        first = false
        b.append(quoteMapper.writeValueAsString(k)).append(':')
        writeSorted(n.get(k), b)
      }
      b.append('}')
    } else if (n.isArray) {
      b.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) b.append(',')
        writeSorted(n.get(i), b)
        i += 1
      }
      b.append(']')
    } else if (n.isTextual) {
      b.append(quoteMapper.writeValueAsString(n.asText()))
    } else {
      b.append(n.toString)
    }
  }
}
