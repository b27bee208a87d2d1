package graft.blob

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Protobuf codec (SURVEY.md §2.4 `protobuf` processor; reference:
  * internal/old/processor/protobuf.go to_json/from_json over reflective
  * descriptors, internal/old/processor/protobuf_test.go byte-exact cases,
  * config/test/protobuf/{people,house}.yaml golden pipelines).
  *
  * The reference parses .proto files at runtime (protoreflect) and maps
  * messages to/from JSON with the canonical proto3 JSON mapping
  * (developers.google.com/protocol-buffers/docs/proto3#json). No protobuf
  * jar ships in this sandbox, so both halves are hand-written from the
  * PUBLIC specs — the proto3 language spec for the schema parser and the
  * encoding spec (protobuf.dev/programming-guides/encoding) for the wire
  * format — the same approach as [[MsgPack]].
  *
  * Supported surface: proto3 messages (nested), enums, repeated (packed
  * scalars), map<K,V>, oneof, all scalar types, and the well-known types
  * the reference's own tests exercise: google.protobuf.Timestamp (RFC 3339
  * JSON string) and google.protobuf.Any (`@type` + inlined fields).
  * JSON field names follow the spec: lowerCamelCase emitted, both the
  * camelCase and the original proto name accepted on input; unknown input
  * fields raise the reference's exact error contract
  * ("message type X has no known field named Y", protobuf_test.go:163).
  * to_json omits default values (jsonpb EmitDefaults=false, the
  * reference's marshaler) and emits int64/uint64 as JSON strings.
  */
object Proto {

  // ------------------------------------------------------------ descriptors

  sealed trait PType extends Serializable
  case object TDouble extends PType
  case object TFloat extends PType
  case object TInt32 extends PType
  case object TInt64 extends PType
  case object TUInt32 extends PType
  case object TUInt64 extends PType
  case object TSInt32 extends PType
  case object TSInt64 extends PType
  case object TFixed32 extends PType
  case object TFixed64 extends PType
  case object TSFixed32 extends PType
  case object TSFixed64 extends PType
  case object TBool extends PType
  case object TString extends PType
  case object TBytes extends PType
  final case class TMessage(fq: String) extends PType
  final case class TEnum(fq: String) extends PType

  final case class Field(name: String, jsonName: String, num: Int,
      repeated: Boolean, tpe: PType, isMap: Boolean = false)

  final case class MessageDesc(fq: String, fields: Seq[Field]) {
    @transient lazy val byNum: Map[Int, Field] = fields.map(f => f.num -> f).toMap
    @transient lazy val byJsonKey: Map[String, Field] =
      (fields.map(f => f.jsonName -> f) ++ fields.map(f => f.name -> f)).toMap
  }

  final case class EnumDesc(fq: String, byName: Map[String, Int], byNum: Map[Int, String])

  /** A compiled, serializable schema set (closure-captured by the UDFs).
    * `topLevel` lists top-level message fqs in declaration order — the
    * order Confluent schema-registry protobuf message-indexes address
    * (SchemaRegistry.decodeProc).
    */
  final case class FileSet(messages: Map[String, MessageDesc], enums: Map[String, EnumDesc],
      topLevel: Seq[String] = Nil) {
    def message(fq: String): MessageDesc =
      messages.getOrElse(fq, throw new IllegalArgumentException(s"unknown message type $fq"))
  }

  // ------------------------------------------------------------- the parser

  /** Parse a set of .proto sources (the reference walks import_paths; the
    * caller hands us every file's text — imports between them resolve by
    * type name against the merged set). Well-known `google.protobuf` imports
    * are satisfied by built-in descriptors for Timestamp/Duration/Any.
    */
  def compile(sources: Seq[String]): FileSet = {
    val msgs = Map.newBuilder[String, MessageDesc]
    val enums = Map.newBuilder[String, EnumDesc]
    // built-in well-known types
    msgs += "google.protobuf.Timestamp" -> MessageDesc("google.protobuf.Timestamp",
      Seq(Field("seconds", "seconds", 1, repeated = false, TInt64),
        Field("nanos", "nanos", 2, repeated = false, TInt32)))
    msgs += "google.protobuf.Duration" -> MessageDesc("google.protobuf.Duration",
      Seq(Field("seconds", "seconds", 1, repeated = false, TInt64),
        Field("nanos", "nanos", 2, repeated = false, TInt32)))
    msgs += "google.protobuf.Any" -> MessageDesc("google.protobuf.Any",
      Seq(Field("type_url", "typeUrl", 1, repeated = false, TString),
        Field("value", "value", 2, repeated = false, TBytes)))
    val top = Seq.newBuilder[String]
    sources.foreach { src => parseFile(src, msgs, enums, top) }
    val fs = FileSet(msgs.result(), enums.result(), top.result())
    resolveTypeRefs(fs)
  }

  private def camel(name: String): String = {
    val parts = name.split('_')
    (parts.head +: parts.tail.map(p =>
      if (p.isEmpty) p else p.substring(0, 1).toUpperCase + p.substring(1))).mkString
  }

  private val ScalarTypes: Map[String, PType] = Map(
    "double" -> TDouble, "float" -> TFloat, "int32" -> TInt32, "int64" -> TInt64,
    "uint32" -> TUInt32, "uint64" -> TUInt64, "sint32" -> TSInt32, "sint64" -> TSInt64,
    "fixed32" -> TFixed32, "fixed64" -> TFixed64, "sfixed32" -> TSFixed32,
    "sfixed64" -> TSFixed64, "bool" -> TBool, "string" -> TString, "bytes" -> TBytes)

  private def tokenize(src: String): Array[String] = {
    // strip // and /* */ comments, then split on structure
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(src, " ")
    val noLine = "//[^\n]*".r.replaceAllIn(noBlock, " ")
    // protect string literals as single tokens
    val sb = new StringBuilder
    var i = 0
    while (i < noLine.length) {
      val c = noLine.charAt(i)
      if (c == '"' || c == '\'') {
        val q = c; val j = noLine.indexOf(q, i + 1)
        if (j < 0) err("unterminated string literal in .proto source")
        sb.append(" ").append(noLine.substring(i + 1, j)).append(" ")
        i = j + 1
      } else {
        if ("{}=;<>,[]".indexOf(c) >= 0) sb.append(' ').append(c).append(' ')
        else sb.append(c)
        i += 1
      }
    }
    sb.toString.split("\\s+").filter(_.nonEmpty)
  }

  private def parseFile(src: String,
      msgs: scala.collection.mutable.Builder[(String, MessageDesc), Map[String, MessageDesc]],
      enums: scala.collection.mutable.Builder[(String, EnumDesc), Map[String, EnumDesc]],
      topLevel: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
    val t = tokenize(src)
    var pos = 0
    var pkg = ""
    def next(): String = { val s = t(pos); pos += 1; s }
    def peek: String = t(pos)
    def expect(s: String): Unit = {
      val g = next(); require(g == s, s"expected '$s', got '$g'")
    }
    def skipStatement(): Unit = { // to the matching ';' or balanced '}'
      var depth = 0
      while (pos < t.length) {
        val s = next()
        if (s == "{") depth += 1
        else if (s == "}") { depth -= 1; if (depth == 0) return }
        else if (s == ";" && depth == 0) return
      }
    }
    def parseEnum(scope: String): Unit = {
      val name = next(); expect("{")
      val byName = Map.newBuilder[String, Int]
      // declaration order preserved so the FIRST name for an aliased
      // number wins (allow_alias) — a plain Map builder lets the last
      // duplicate overwrite, and hash-order rebuilds pick arbitrarily
      val byNum = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      while (peek != "}") {
        if (peek == "option" || peek == "reserved") skipStatement()
        else {
          val vName = next(); expect("="); val vNum = next().toInt
          byName += vName -> vNum
          if (!byNum.contains(vNum)) byNum(vNum) = vName
          if (peek == "[") { while (next() != "]") {} }
          expect(";")
        }
      }
      expect("}")
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      enums += fq -> EnumDesc(fq, byName.result(), byNum.toMap)
    }
    def parseFieldInto(scope: String, fields: scala.collection.mutable.ArrayBuffer[Field],
        syntheticMsgs: scala.collection.mutable.ArrayBuffer[MessageDesc]): Unit = {
      var repeated = false
      var tok = next()
      if (tok == "repeated") { repeated = true; tok = next() }
      else if (tok == "optional" || tok == "required") tok = next()
      if (tok == "map") {
        expect("<"); val kt = next(); expect(","); val vt = next(); expect(">")
        val name = next(); expect("="); val num = next().toInt
        if (peek == "[") { while (next() != "]") {} }
        expect(";")
        // map<K,V> = repeated synthetic entry message {K key=1; V value=2}
        val entryName = name.split('_').map(p => p.capitalize).mkString + "Entry"
        val entryFq = s"$scope.$entryName"
        val keyT = ScalarTypes.getOrElse(kt, throw new IllegalArgumentException(s"bad map key $kt"))
        val valT = ScalarTypes.getOrElse(vt, TMessage(vt)) // message/enum resolved later
        syntheticMsgs += MessageDesc(entryFq, Seq(
          Field("key", "key", 1, repeated = false, keyT),
          Field("value", "value", 2, repeated = false, valT)))
        fields += Field(name, camel(name), num, repeated = true, TMessage(entryFq), isMap = true)
      } else {
        val tpe = ScalarTypes.getOrElse(tok, TMessage(tok)) // message vs enum resolved later
        val name = next(); expect("="); val num = next().toInt
        if (peek == "[") { while (next() != "]") {} }
        expect(";")
        fields += Field(name, camel(name), num, repeated, tpe)
      }
    }
    def parseMessage(scope: String): Unit = {
      val name = next()
      val fq = if (scope.isEmpty) name else s"$scope.$name"
      expect("{")
      val fields = scala.collection.mutable.ArrayBuffer.empty[Field]
      val synth = scala.collection.mutable.ArrayBuffer.empty[MessageDesc]
      while (peek != "}") {
        peek match {
          case "message" => next(); parseMessage(fq)
          case "enum" => next(); parseEnum(fq)
          case "option" | "reserved" | "extensions" => skipStatement()
          case "oneof" =>
            next(); next(); expect("{") // oneof fields behave as plain singular fields
            while (peek != "}") parseFieldInto(fq, fields, synth)
            expect("}")
          case _ => parseFieldInto(fq, fields, synth)
        }
      }
      expect("}")
      msgs += fq -> MessageDesc(fq, fields.sortBy(_.num).toSeq)
      synth.foreach(m => msgs += m.fq -> m)
    }
    while (pos < t.length) {
      next() match {
        case "syntax" | "import" | "option" | "service" => pos -= 1; skipStatement()
        case "package" => pkg = next(); expect(";")
        case "message" =>
          topLevel += (if (pkg.isEmpty) peek else s"$pkg.$peek")
          parseMessage(pkg)
        case "enum" => parseEnum(pkg)
        case ";" => ()
        case other => throw new IllegalArgumentException(s"unexpected top-level token '$other'")
      }
    }
  }

  /** Second pass: TMessage refs that actually name enums become TEnum, and
    * relative type names resolve against the declaring scope then the root.
    */
  private def resolveTypeRefs(fs: FileSet): FileSet = {
    def resolve(scope: String, ref: String): PType = {
      val candidates = {
        // C++-style scoping: innermost scope outwards, then fully-qualified
        val scopes = scope.split('.').inits.map(_.mkString(".")).toSeq
        scopes.map(s => if (s.isEmpty) ref else s"$s.$ref") :+ ref
      }
      candidates.collectFirst {
        case c if fs.messages.contains(c) => TMessage(c)
        case c if fs.enums.contains(c) => TEnum(c)
      }.getOrElse(throw new IllegalArgumentException(s"unresolved type '$ref' in $scope"))
    }
    val msgs = fs.messages.map { case (fq, m) =>
      // fields resolve against the DECLARING MESSAGE's scope (the message is
      // itself a scope: `message M { message Inner {...} Inner x = 1; }`),
      // then outwards — not just the parent package
      val scope = fq
      fq -> m.copy(fields = m.fields.map { f =>
        f.tpe match {
          case TMessage(ref) if !fs.messages.contains(ref) || !ref.contains(".") =>
            f.copy(tpe = resolve(scope, ref))
          case TMessage(ref) if fs.messages.contains(ref) || fs.enums.contains(ref) =>
            if (fs.enums.contains(ref)) f.copy(tpe = TEnum(ref)) else f
          case _ => f
        }
      })
    }
    FileSet(msgs, fs.enums, fs.topLevel)
  }

  // ------------------------------------------------------------ wire encode

  private def wtype(t: PType): Int = t match {
    case TInt32 | TInt64 | TUInt32 | TUInt64 | TSInt32 | TSInt64 | TBool | TEnum(_) => 0
    case TFixed64 | TSFixed64 | TDouble => 1
    case TFixed32 | TSFixed32 | TFloat => 5
    case TString | TBytes | TMessage(_) => 2
  }

  private def writeVarint(v0: Long, out: ByteArrayOutputStream): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def writeTag(num: Int, wt: Int, out: ByteArrayOutputStream): Unit =
    writeVarint((num.toLong << 3) | wt, out)
  private def writeLE(v: Long, bytes: Int, out: ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def err(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def jLong(n: JsonNode, f: Field): Long =
    if (n.isNumber) n.asLong()
    else if (n.isTextual) n.asText().toLong // spec: int64 accepts strings
    else err(s"bad input: expecting number ; instead got ${summ(n)}")
  private def summ(n: JsonNode): String =
    if (n.isTextual) "\"" + n.asText() + "\"" else n.toString

  /** Encode one JSON value as field `f` (no tag), scalar forms only. */
  private def encodeScalar(fs: FileSet, f: Field, n: JsonNode, out: ByteArrayOutputStream): Unit =
    f.tpe match {
      case TInt32 | TInt64 => writeVarint(jLong(n, f), out)
      case TUInt32 | TUInt64 =>
        val v = if (n.isTextual) java.lang.Long.parseUnsignedLong(n.asText()) else n.asLong()
        writeVarint(v, out)
      case TSInt32 | TSInt64 => writeVarint(zigzag(jLong(n, f)), out)
      case TBool =>
        if (!n.isBoolean) err(s"bad input: expecting boolean ; instead got ${summ(n)}")
        writeVarint(if (n.asBoolean()) 1 else 0, out)
      case TEnum(fq) =>
        val ed = fs.enums(fq)
        val v = if (n.isNumber) n.asInt()
          else ed.byName.getOrElse(n.asText(), err(s"unknown value \"${n.asText()}\" for enum $fq"))
        writeVarint(v.toLong, out)
      case TFixed64 =>
        val v = if (n.isTextual) java.lang.Long.parseUnsignedLong(n.asText()) else n.asLong()
        writeLE(v, 8, out)
      case TSFixed64 => writeLE(jLong(n, f), 8, out)
      case TFixed32 | TSFixed32 => writeLE(jLong(n, f) & 0xffffffffL, 4, out)
      case TDouble =>
        if (!n.isNumber && !n.isTextual) err(s"bad input: expecting number ; instead got ${summ(n)}")
        writeLE(java.lang.Double.doubleToLongBits(n.asDouble()), 8, out)
      case TFloat =>
        writeLE(java.lang.Float.floatToIntBits(n.asDouble().toFloat).toLong & 0xffffffffL, 4, out)
      case TString =>
        if (!n.isTextual) err(s"bad input: expecting string ; instead got ${summ(n)}")
        val b = n.asText().getBytes(UTF_8)
        writeVarint(b.length.toLong, out); out.write(b, 0, b.length)
      case TBytes =>
        val b = java.util.Base64.getDecoder.decode(n.asText())
        writeVarint(b.length.toLong, out); out.write(b, 0, b.length)
      case TMessage(fq) =>
        val inner = encodeMessage(fs, fq, n)
        writeVarint(inner.length.toLong, out); out.write(inner, 0, inner.length)
    }

  private def isDefault(fs: FileSet, f: Field, n: JsonNode): Boolean = f.tpe match {
    case _ if n == null || n.isNull => true
    case TString => n.isTextual && n.asText().isEmpty
    case TBytes => n.isTextual && n.asText().isEmpty
    case TBool => n.isBoolean && !n.asBoolean()
    case TMessage(_) => false
    case TEnum(fq) =>
      (n.isNumber && n.asInt() == 0) ||
        (n.isTextual && fs.enums.get(fq).flatMap(_.byNum.get(0)).contains(n.asText()))
    case _ => n.isNumber && n.asDouble() == 0.0
  }

  /** JSON object → wire bytes for message `fq`. */
  def encodeMessage(fs: FileSet, fq: String, node: JsonNode): Array[Byte] = {
    val md = fs.message(fq)
    val out = new ByteArrayOutputStream()

    // google.protobuf.Timestamp: JSON is an RFC 3339 string
    if (fq == "google.protobuf.Timestamp" && node.isTextual) {
      val inst = Instant.parse(node.asText())
      if (inst.getEpochSecond != 0) { writeTag(1, 0, out); writeVarint(inst.getEpochSecond, out) }
      if (inst.getNano != 0) { writeTag(2, 0, out); writeVarint(inst.getNano.toLong, out) }
      return out.toByteArray
    }
    // google.protobuf.Any: {"@type": "type.googleapis.com/fq", ...fields}
    if (fq == "google.protobuf.Any") {
      val tUrl = Option(node.get("@type")).map(_.asText())
        .getOrElse(err("Any message missing @type"))
      val innerFq = tUrl.substring(tUrl.lastIndexOf('/') + 1)
      val stripped = node.deepCopy[ObjectNode]()
      stripped.remove("@type")
      // a well-known inner type with a scalar JSON form round-trips as
      // {"@type": ..., "value": "<scalar>"} (the shape our decoder emits)
      val innerNode: JsonNode =
        if (innerFq == "google.protobuf.Timestamp" && stripped.size() == 1 && stripped.has("value"))
          stripped.get("value")
        else stripped
      val innerBytes = encodeMessage(fs, innerFq, innerNode)
      val urlBytes = tUrl.getBytes(UTF_8)
      writeTag(1, 2, out); writeVarint(urlBytes.length.toLong, out); out.write(urlBytes, 0, urlBytes.length)
      writeTag(2, 2, out); writeVarint(innerBytes.length.toLong, out); out.write(innerBytes, 0, innerBytes.length)
      return out.toByteArray
    }

    if (!node.isObject) err(s"bad input: expecting object ; instead got ${summ(node)}")
    // reject unknown fields first (the reference's jsonpb contract)
    val it = node.fieldNames()
    while (it.hasNext) {
      val k = it.next()
      if (!md.byJsonKey.contains(k))
        err(s"message type $fq has no known field named $k")
    }
    md.fields.foreach { f =>
      val n = Option(node.get(f.jsonName)).orElse(Option(node.get(f.name))).orNull
      if (n != null && !n.isNull) {
        if (f.isMap) {
          if (!n.isObject) err(s"bad input: expecting object ; instead got ${summ(n)}")
          val TMessage(entryFq) = (f.tpe: @unchecked)
          val entry = fs.message(entryFq)
          val fac = JsonNodeFactory.instance
          val eit = n.fields()
          while (eit.hasNext) {
            val e = eit.next()
            val keyNode: JsonNode = entry.fields.head.tpe match {
              case TString => fac.textNode(e.getKey)
              case TBool => fac.booleanNode(e.getKey.toBoolean)
              case _ => fac.numberNode(new java.math.BigDecimal(e.getKey))
            }
            val o = fac.objectNode()
            o.set[JsonNode]("key", keyNode)
            o.set[JsonNode]("value", e.getValue)
            val inner = encodeMessage(fs, entryFq, o)
            writeTag(f.num, 2, out)
            writeVarint(inner.length.toLong, out); out.write(inner, 0, inner.length)
          }
        } else if (f.repeated) {
          if (!n.isArray) err(s"bad input: expecting array ; instead got ${summ(n)}")
          val elems = (0 until n.size()).map(n.get)
          if (elems.nonEmpty) {
            if (wtype(f.tpe) == 2) {
              elems.foreach { e => writeTag(f.num, 2, out); encodeScalar(fs, f, e, out) }
            } else { // proto3 packs numeric repeated fields
              val body = new ByteArrayOutputStream()
              elems.foreach(e => encodeScalar(fs, f, e, body))
              val b = body.toByteArray
              writeTag(f.num, 2, out)
              writeVarint(b.length.toLong, out); out.write(b, 0, b.length)
            }
          }
        } else if (!isDefault(fs, f, n)) {
          writeTag(f.num, wtype(f.tpe), out)
          encodeScalar(fs, f, n, out)
        }
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ wire decode

  private final class WireReader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    // every read is bounds-checked against `end`: Arrays.copyOfRange
    // zero-pads past the array and cross-`end` reads decode a sibling
    // field's bytes as data — truncated/corrupt input must ERROR (the
    // reference's unmarshal contract), never silently produce values
    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos) err(s"truncated message: need $n bytes at offset $pos, have ${end - pos}")
    // length prefixes are validated in LONG space BEFORE the Int narrowing:
    // a corrupt 2^32+k length would .toInt-wrap to small positive k, pass a
    // post-narrowing bounds check, and silently mis-align the decode
    def lenPrefix(what: => String): Int = {
      val v = varint()
      if (v < 0L || v > (end - pos).toLong) err(s"truncated message: $what overruns the buffer")
      v.toInt
    }
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        need(1)
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) err("malformed varint (more than 10 bytes)")
      }
      v
    }
    def le(n: Int): Long = {
      need(n)
      var v = 0L; var i = 0
      while (i < n) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += n; v
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0) err(s"negative length $n")
      need(n)
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
  }

  private def decodeScalar(fs: FileSet, t: PType, r: WireReader, fac: JsonNodeFactory): JsonNode =
    t match {
      case TInt32 => fac.numberNode(r.varint().toInt)
      case TInt64 => fac.textNode(r.varint().toString) // spec: 64-bit as string
      case TUInt32 => fac.numberNode(r.varint().toInt.toLong & 0xffffffffL)
      case TUInt64 => fac.textNode(java.lang.Long.toUnsignedString(r.varint()))
      case TSInt32 => fac.numberNode({ val v = r.varint(); ((v >>> 1) ^ -(v & 1)).toInt })
      case TSInt64 => fac.textNode({ val v = r.varint(); ((v >>> 1) ^ -(v & 1)).toString })
      case TBool => fac.booleanNode(r.varint() != 0)
      case TEnum(fq) =>
        val v = r.varint().toInt
        fs.enums(fq).byNum.get(v).map(fac.textNode).getOrElse(fac.numberNode(v))
      case TFixed64 => fac.textNode(java.lang.Long.toUnsignedString(r.le(8)))
      case TSFixed64 => fac.textNode(r.le(8).toString)
      case TDouble => fac.numberNode(java.lang.Double.longBitsToDouble(r.le(8)))
      case TFixed32 => fac.numberNode(r.le(4))
      case TSFixed32 => fac.numberNode(r.le(4).toInt)
      case TFloat => fac.numberNode(java.lang.Float.intBitsToFloat(r.le(4).toInt).toDouble)
      case TString => fac.textNode(new String(r.bytes(r.lenPrefix("string field")), UTF_8))
      case TBytes => fac.textNode(java.util.Base64.getEncoder.encodeToString(r.bytes(r.lenPrefix("bytes field"))))
      case TMessage(_) =>
        throw new IllegalStateException("messages handled in decodeRange")
    }

  /** Wire bytes → canonical-JSON node for message `fq`. Unknown field
    * numbers are skipped by wire type (the reference's dynamic unmarshal
    * keeps them as unknown fields that jsonpb then omits).
    */
  def decodeMessage(fs: FileSet, fq: String, bytes: Array[Byte]): JsonNode =
    decodeRange(fs, fq, bytes, 0, bytes.length)

  private def decodeRange(fs: FileSet, fq: String, b: Array[Byte], start: Int, end: Int): JsonNode = {
    val md = fs.message(fq)
    val fac = JsonNodeFactory.instance
    val r = new WireReader(b, start, end)
    // accumulate per field number (repeated append, singular last-wins)
    val acc = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[JsonNode]]
    def put(num: Int, n: JsonNode): Unit =
      acc.getOrElseUpdate(num, scala.collection.mutable.ArrayBuffer.empty) += n
    while (r.hasNext) {
      val tag = r.varint()
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      md.byNum.get(num) match {
        case None => // skip unknown
          wt match {
            case 0 => r.varint()
            case 1 => r.le(8)
            case 2 =>
              r.pos += r.lenPrefix(s"unknown field $num")
            case 5 => r.le(4)
            case other => err(s"unsupported wire type $other for unknown field $num")
          }
        case Some(f) =>
          f.tpe match {
            case TMessage(innerFq) if wt == 2 =>
              val len = r.lenPrefix(s"field $num")
              put(num, decodeRange(fs, innerFq, b, r.pos, r.pos + len))
              r.pos += len
            case t if wt == 2 && wtype(t) != 2 && f.repeated =>
              // packed numeric
              val len = r.lenPrefix(s"packed field $num")
              val sub = new WireReader(b, r.pos, r.pos + len)
              while (sub.hasNext) put(num, decodeScalar(fs, t, sub, fac))
              r.pos += len
            case t => put(num, decodeScalar(fs, t, r, fac))
          }
      }
    }
    // special JSON forms
    if (fq == "google.protobuf.Timestamp") {
      val secs = acc.get(1).flatMap(_.lastOption).map(n => n.asText().toLong).getOrElse(0L)
      val nanos = acc.get(2).flatMap(_.lastOption).map(_.asInt()).getOrElse(0)
      return fac.textNode(DateTimeFormatter.ISO_INSTANT.format(Instant.ofEpochSecond(secs, nanos.toLong)))
    }
    if (fq == "google.protobuf.Any") {
      val tUrl = acc.get(1).flatMap(_.lastOption).map(_.asText()).getOrElse(err("Any missing type_url"))
      val innerFq = tUrl.substring(tUrl.lastIndexOf('/') + 1)
      val vb = acc.get(2).flatMap(_.lastOption)
        .map(n => java.util.Base64.getDecoder.decode(n.asText()))
        .getOrElse(Array.emptyByteArray)
      val inner = decodeMessage(fs, innerFq, vb)
      val o = fac.objectNode()
      o.set[JsonNode]("@type", fac.textNode(tUrl))
      if (inner.isObject) {
        val it = inner.fields()
        while (it.hasNext) { val e = it.next(); o.set[JsonNode](e.getKey, e.getValue) }
      } else o.set[JsonNode]("value", inner) // well-known inner with scalar JSON form
      return o
    }
    val o = fac.objectNode()
    md.fields.foreach { f =>
      acc.get(f.num).foreach { vs =>
        if (f.isMap) {
          val m = fac.objectNode()
          vs.foreach { entry =>
            // a wire-absent key is the key type's DEFAULT (0 / false / ""),
            // not the empty string — our own encoder omits default keys
            val k = Option(entry.get("key")).map(_.asText())
              .getOrElse(defaultJson(fs, mapKeyType(fs, f), fac).asText())
            m.set[JsonNode](k, Option(entry.get("value")).getOrElse(defaultJson(fs, mapValueType(fs, f), fac)))
          }
          o.set[JsonNode](f.jsonName, m)
        } else if (f.repeated) {
          val a = fac.arrayNode(vs.length)
          vs.foreach(a.add)
          o.set[JsonNode](f.jsonName, a)
        } else o.set[JsonNode](f.jsonName, vs.last)
      }
    }
    o
  }

  private def mapValueType(fs: FileSet, f: Field): PType = {
    val TMessage(entryFq) = (f.tpe: @unchecked)
    fs.message(entryFq).fields(1).tpe
  }

  private def mapKeyType(fs: FileSet, f: Field): PType = {
    val TMessage(entryFq) = (f.tpe: @unchecked)
    fs.message(entryFq).fields.head.tpe
  }

  private def defaultJson(fs: FileSet, t: PType, fac: JsonNodeFactory): JsonNode = t match {
    case TString | TBytes => fac.textNode("")
    case TBool => fac.booleanNode(false)
    case TInt64 | TUInt64 | TSInt64 | TFixed64 | TSFixed64 => fac.textNode("0")
    case TMessage(fq) => fac.objectNode()
    case TEnum(fq) => fs.enums(fq).byNum.get(0).map(fac.textNode).getOrElse(fac.numberNode(0))
    case _ => fac.numberNode(0)
  }

  // ------------------------------------------------------------- Column API

  private val mapper = new ObjectMapper()

  /** from_json operator (protobuf.go): JSON text → wire bytes. Errors carry
    * the reference's message prefix; the Err variants below map them to the
    * engine's error-column contract instead of failing the task.
    */
  def fromJson(fs: FileSet, message: String): Column => Column = {
    val u = udf((json: String) =>
      if (json == null) null
      else encodeMessage(fs, message, parseJson(json)))
    c => u(c)
  }

  /** to_json operator: wire bytes → canonical proto3 JSON text. */
  def toJson(fs: FileSet, message: String): Column => Column = {
    val u = udf((bytes: Array[Byte]) =>
      if (bytes == null) null
      else mapper.writeValueAsString(decodeMessage(fs, message, bytes)))
    c => u(c)
  }

  private def parseJson(json: String): JsonNode =
    try mapper.readTree(json)
    catch { case e: Exception => err(stripLocation(e.getMessage)) }
  private def stripLocation(m: String): String = {
    val cut = m.indexOf("\n at [")
    if (cut >= 0) m.substring(0, cut) else m
  }

  /** Error-contract from_json: returns a (bytes, err) pair column where a
    * failure yields null bytes and the reference's error string
    * ("failed to unmarshal JSON message: ..."), protobuf_test.go:163 and
    * config/test/protobuf/people.yaml's catch branch.
    */
  def fromJsonErr(fs: FileSet, message: String): Column => Column = {
    val u = udf((json: String) =>
      if (json == null) (null: Array[Byte], null: String)
      else try (encodeMessage(fs, message, parseJson(json)), null: String)
      catch { case e: Exception =>
        (null: Array[Byte], s"failed to unmarshal JSON message: ${e.getMessage}")
      })
    c => u(c)
  }

  /** Error-contract to_json. */
  def toJsonErr(fs: FileSet, message: String): Column => Column = {
    val u = udf((bytes: Array[Byte]) =>
      if (bytes == null) (null: String, null: String)
      else try (mapper.writeValueAsString(decodeMessage(fs, message, bytes)), null: String)
      catch { case e: Exception =>
        (null: String, s"failed to marshal protobuf message: ${e.getMessage}")
      })
    c => u(c)
  }
}
