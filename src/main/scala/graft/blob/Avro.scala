package graft.blob

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

/** Avro codec for the schema-registry processors (SURVEY.md §2.4
  * `schema_registry_{encode,decode}`; reference:
  * internal/impl/confluent/processor_schema_registry_decode.go:306-335,
  * processor_schema_registry_encode.go:349-378). The reference's Avro
  * engine is goavro's `NewCodecForStandardJSON`: ENCODE consumes standard
  * JSON (union values bare — `"MaybeHobby":"dancing"`), DECODE emits Avro
  * JSON (union values wrapped in a single-key object — the decode test's
  * `"MaybeHobby":{"string":"dancing"}`,
  * processor_schema_registry_decode_test.go:199-216). No Avro JSON
  * encoder with goavro's exact union-key naming ships in this sandbox's
  * jars, so the codec is hand-written from the PUBLIC Avro 1.11 spec
  * (avro.apache.org/docs/1.11.1/specification — binary encoding + JSON
  * encoding sections), the same approach as [[Proto]] and [[MsgPack]].
  *
  * Union-wrap key naming (goavro union.go semantics, pinned by the
  * reference's golden vectors):
  *   - named types (record/enum/fixed): the FULL name
  *     (`{"my.namespace.com.address": {...}}`)
  *   - primitives carrying a logicalType: `<type>.<logicalType>`
  *     (`{"int.time-millis": 35245000}`, `{"bytes.decimal": "!"}`)
  *   - plain primitives / array / map: the type name (`{"string": "a"}`)
  * Object keys in decoded output are sorted bytewise at every level (Go
  * map marshal shape, like [[graft.ops.AwkFuncs.compactSorted]]).
  *
  * Supported surface: null/boolean/int/long/float/double/bytes/string,
  * records (namespaced, nested, named-type back-references), enums,
  * fixed, arrays, maps, unions, logicalType pass-through. `bytes` maps
  * to/from a JSON string of the raw octets (\u00XX-escaped outside
  * printable ASCII), per goavro's textual bytes encoding.
  */
object Avro {

  // ------------------------------------------------------------- schema

  sealed trait AType
  final case class APrim(name: String, logical: Option[String]) extends AType
  final case class ARecord(fullName: String, fields: Vector[AField]) extends AType
  final case class AEnum(fullName: String, symbols: Vector[String]) extends AType
  final case class AFixed(fullName: String, size: Int) extends AType
  final case class AArray(items: AType) extends AType
  final case class AMap(values: AType) extends AType
  final case class AUnion(branches: Vector[AType]) extends AType
  final case class AField(name: String, tpe: AType, default: Option[JsonNode])

  private val Primitives =
    Set("null", "boolean", "int", "long", "float", "double", "bytes", "string")

  private val mapper = new ObjectMapper()
  private val fac = JsonNodeFactory.instance

  /** Parse an Avro schema document (JSON text). Named types defined
    * earlier in the document may be referenced by (full) name later, per
    * the spec's named-type rules.
    */
  def parseSchema(json: String): AType = {
    val names = mutable.Map[String, AType]()
    parseType(mapper.readTree(json), "", names)
  }

  private def fullName(node: JsonNode, enclosingNs: String): (String, String) = {
    val name = node.get("name").asText()
    if (name.contains(".")) (name, name.substring(0, name.lastIndexOf('.')))
    else {
      val ns =
        if (node.hasNonNull("namespace")) node.get("namespace").asText()
        else enclosingNs
      (if (ns.isEmpty) name else s"$ns.$name", ns)
    }
  }

  private def parseType(n: JsonNode, ns: String,
      names: mutable.Map[String, AType]): AType = {
    if (n.isTextual) {
      val s = n.asText()
      if (Primitives(s)) APrim(s, None)
      else names.getOrElse(s,
        names.getOrElse(if (ns.isEmpty) s else s"$ns.$s",
          throw new IllegalArgumentException(s"unknown type reference '$s'")))
    } else if (n.isArray) {
      val bs = Vector.newBuilder[AType]
      n.forEach(b => bs += parseType(b, ns, names))
      AUnion(bs.result())
    } else if (n.isObject) {
      val t = n.get("type").asText()
      t match {
        case "record" | "error" =>
          val (fq, recNs) = fullName(n, ns)
          val fields = Vector.newBuilder[AField]
          n.get("fields").forEach { f =>
            fields += AField(f.get("name").asText(),
              parseType(f.get("type"), recNs, names),
              Option(f.get("default")))
          }
          val rec = ARecord(fq, fields.result())
          names(fq) = rec
          rec
        case "enum" =>
          val (fq, _) = fullName(n, ns)
          val syms = Vector.newBuilder[String]
          n.get("symbols").forEach(s => syms += s.asText())
          val e = AEnum(fq, syms.result())
          names(fq) = e
          e
        case "fixed" =>
          val (fq, _) = fullName(n, ns)
          val f = AFixed(fq, n.get("size").asInt())
          names(fq) = f
          f
        case "array" => AArray(parseType(n.get("items"), ns, names))
        case "map" => AMap(parseType(n.get("values"), ns, names))
        case p if Primitives(p) =>
          APrim(p, Option(n.get("logicalType")).map(_.asText()))
        case other =>
          throw new IllegalArgumentException(s"unsupported avro type '$other'")
      }
    } else throw new IllegalArgumentException(s"malformed avro schema node: $n")
  }

  /** The union-wrap key for a non-null branch (goavro naming; scaladoc
    * above).
    */
  private def unionKey(t: AType): String = t match {
    case APrim(p, Some(l)) => s"$p.$l"
    case APrim(p, None) => p
    case ARecord(fq, _) => fq
    case AEnum(fq, _) => fq
    case AFixed(fq, _) => fq
    case AArray(_) => "array"
    case AMap(_) => "map"
    case AUnion(_) =>
      throw new IllegalArgumentException("nested unions are invalid in avro")
  }

  // ------------------------------------------------------------ binary in

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > b.length)
        throw new IllegalArgumentException(
          s"truncated avro input: need $n bytes at offset $pos of ${b.length}")
    def u8(): Int = { need(1); val v = b(pos) & 0xff; pos += 1; v }
    def take(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    /** zig-zag varint (spec: int and long). */
    def varLong(): Long = {
      var shift = 0
      var acc = 0L
      var bt = u8()
      while ((bt & 0x80) != 0) {
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
        acc |= (bt & 0x7fL) << shift
        shift += 7
        bt = u8()
      }
      acc |= (bt & 0x7fL) << shift
      (acc >>> 1) ^ -(acc & 1)
    }
    def done: Boolean = pos == b.length
  }

  /** Decode an Avro binary value to the Avro JSON tree (unions wrapped). */
  def decodeBinary(schema: AType, bytes: Array[Byte]): JsonNode = {
    val r = new Reader(bytes)
    val n = read(schema, r)
    if (!r.done)
      throw new IllegalArgumentException("trailing bytes after avro value")
    n
  }

  private def read(t: AType, r: Reader): JsonNode = t match {
    case APrim("null", _) => fac.nullNode()
    case APrim("boolean", _) => fac.booleanNode(r.u8() != 0)
    case APrim("int", _) =>
      val v = r.varLong()
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(s"avro int out of range: $v")
      fac.numberNode(v.toInt)
    case APrim("long", _) => fac.numberNode(r.varLong())
    case APrim("float", _) =>
      val bits = r.take(4)
      fac.numberNode(java.lang.Float.intBitsToFloat(
        (bits(0) & 0xff) | ((bits(1) & 0xff) << 8) |
          ((bits(2) & 0xff) << 16) | ((bits(3) & 0xff) << 24)))
    case APrim("double", _) =>
      val bits = r.take(8)
      var acc = 0L
      var i = 7
      while (i >= 0) { acc = (acc << 8) | (bits(i) & 0xffL); i -= 1 }
      fac.numberNode(java.lang.Double.longBitsToDouble(acc))
    case APrim("bytes", _) =>
      fac.textNode(bytesToText(r.take(checkedLen(r.varLong()))))
    case APrim("string", _) =>
      fac.textNode(new String(r.take(checkedLen(r.varLong())), UTF_8))
    case APrim(other, _) =>
      throw new IllegalArgumentException(s"unsupported primitive '$other'")
    case ARecord(_, fields) =>
      val o = fac.objectNode()
      fields.foreach(f => o.set[JsonNode](f.name, read(f.tpe, r)))
      o
    case AEnum(fq, symbols) =>
      val i = r.varLong()
      if (i < 0 || i >= symbols.length)
        throw new IllegalArgumentException(s"enum index $i out of range for $fq")
      fac.textNode(symbols(i.toInt))
    case AFixed(_, size) => fac.textNode(bytesToText(r.take(size)))
    case AArray(items) =>
      val a = fac.arrayNode()
      var count = r.varLong()
      while (count != 0) {
        if (count < 0) { r.varLong(); count = -count } // block byte-size prefix
        var i = 0L
        while (i < count) { a.add(read(items, r)); i += 1 }
        count = r.varLong()
      }
      a
    case AMap(values) =>
      val o = fac.objectNode()
      var count = r.varLong()
      while (count != 0) {
        if (count < 0) { r.varLong(); count = -count }
        var i = 0L
        while (i < count) {
          val k = new String(r.take(checkedLen(r.varLong())), UTF_8)
          o.set[JsonNode](k, read(values, r))
          i += 1
        }
        count = r.varLong()
      }
      o
    case AUnion(branches) =>
      val i = r.varLong()
      if (i < 0 || i >= branches.length)
        throw new IllegalArgumentException(s"union index $i out of range")
      val b = branches(i.toInt)
      b match {
        case APrim("null", _) => fac.nullNode()
        case _ =>
          val o = fac.objectNode()
          o.set[JsonNode](unionKey(b), read(b, r))
          o
      }
  }

  private def checkedLen(v: Long): Int = {
    if (v < 0 || v > Int.MaxValue)
      throw new IllegalArgumentException(s"invalid avro length $v")
    v.toInt
  }

  /** goavro textual bytes: raw octets as string chars, printable ASCII
    * kept literal, everything else \u00XX (applied by the JSON writer —
    * here each octet becomes the code point 0-255 and [[textual]] escapes).
    */
  private def bytesToText(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    b.foreach(x => sb.append((x & 0xff).toChar))
    sb.toString
  }

  private def textToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xff)
        throw new IllegalArgumentException(
          s"bytes value contains non-octet char U+${c.toInt.toHexString}")
      out(i) = c.toByte
      i += 1
    }
    out
  }

  // ----------------------------------------------------------- binary out

  private final class Writer {
    val out = new ByteArrayOutputStream(64)
    def u8(v: Int): Unit = out.write(v)
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def varLong(v: Long): Unit = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      out.write(z.toInt)
    }
  }

  /** Encode a STANDARD-JSON document (goavro NewCodecForStandardJSON
    * semantics: bare union values — null picks the null branch, otherwise
    * the first branch whose type accepts the JSON value).
    */
  def encodeStandardJson(schema: AType, doc: JsonNode): Array[Byte] = {
    val w = new Writer
    write(schema, doc, w)
    w.out.toByteArray
  }

  private def accepts(t: AType, n: JsonNode): Boolean = t match {
    case APrim("null", _) => n.isNull
    case APrim("boolean", _) => n.isBoolean
    case APrim("int", _) | APrim("long", _) => n.isIntegralNumber
    case APrim("float", _) | APrim("double", _) => n.isNumber
    case APrim("bytes", _) | APrim("string", _) => n.isTextual
    case AEnum(_, symbols) => n.isTextual && symbols.contains(n.asText())
    case AFixed(_, size) => n.isTextual && n.asText().length == size
    case ARecord(_, _) | AMap(_) => n.isObject
    case AArray(_) => n.isArray
    case AUnion(bs) => bs.exists(accepts(_, n))
    case _ => false
  }

  private def write(t: AType, n: JsonNode, w: Writer): Unit = t match {
    case AUnion(branches) =>
      val i = branches.indexWhere(accepts(_, n))
      if (i < 0)
        // goavro's standard-JSON codec error shape for a value no branch
        // takes (encode_test.go "could not decode any json data in input")
        throw new IllegalArgumentException(
          s"could not decode any json data in input: $n")
      w.varLong(i.toLong)
      write(branches(i), n, w)
    case _ if !accepts(t, n) =>
      throw new IllegalArgumentException(
        s"could not decode any json data in input: $n for ${unionKey(t)}")
    case APrim("null", _) => ()
    case APrim("boolean", _) => w.u8(if (n.asBoolean()) 1 else 0)
    case APrim("int", _) =>
      val v = n.asLong()
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(s"int out of range: $v")
      w.varLong(v)
    case APrim("long", _) => w.varLong(n.asLong())
    case APrim("float", _) =>
      val bits = java.lang.Float.floatToIntBits(n.asDouble().toFloat)
      w.u8(bits & 0xff); w.u8((bits >>> 8) & 0xff)
      w.u8((bits >>> 16) & 0xff); w.u8((bits >>> 24) & 0xff)
    case APrim("double", _) =>
      var bits = java.lang.Double.doubleToLongBits(n.asDouble())
      var i = 0
      while (i < 8) { w.u8((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    case APrim("bytes", _) =>
      val b = textToBytes(n.asText())
      w.varLong(b.length.toLong); w.raw(b)
    case APrim("string", _) =>
      val b = n.asText().getBytes(UTF_8)
      w.varLong(b.length.toLong); w.raw(b)
    case ARecord(fq, fields) =>
      fields.foreach { f =>
        val v =
          if (n.has(f.name)) n.get(f.name)
          else f.default.getOrElse(throw new IllegalArgumentException(
            s"record $fq missing field '${f.name}' with no default"))
        write(f.tpe, v, w)
      }
    case AEnum(_, symbols) => w.varLong(symbols.indexOf(n.asText()).toLong)
    case AFixed(_, _) => w.raw(textToBytes(n.asText()))
    case AArray(items) =>
      if (n.size() > 0) {
        w.varLong(n.size().toLong)
        n.forEach(e => write(items, e, w))
      }
      w.varLong(0)
    case AMap(values) =>
      if (n.size() > 0) {
        w.varLong(n.size().toLong)
        n.fields().forEachRemaining { e =>
          val kb = e.getKey.getBytes(UTF_8)
          w.varLong(kb.length.toLong); w.raw(kb)
          write(values, e.getValue, w)
        }
      }
      w.varLong(0)
    case APrim(other, _) =>
      throw new IllegalArgumentException(s"unsupported primitive '$other'")
  }

  // ---------------------------------------------------------------- text

  /** Compact JSON text, object keys sorted bytewise at every level (the Go
    * map-marshal shape the reference's decode goldens pin), strings
    * escaped with \u00XX outside printable ASCII so bytes values
    * round-trip octet-exact.
    */
  def textual(n: JsonNode): String = {
    val b = new StringBuilder(64)
    writeText(n, b)
    b.toString
  }

  private def writeText(n: JsonNode, b: StringBuilder): Unit = {
    if (n.isObject) {
      val keys = mutable.ArrayBuffer[String]()
      n.fieldNames().forEachRemaining(k => keys += k)
      b.append('{')
      var first = true
      keys.sorted.foreach { k =>
        if (!first) b.append(',')
        first = false
        quote(k, b); b.append(':')
        writeText(n.get(k), b)
      }
      b.append('}')
    } else if (n.isArray) {
      b.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) b.append(',')
        writeText(n.get(i), b)
        i += 1
      }
      b.append(']')
    } else if (n.isTextual) quote(n.asText(), b)
    else b.append(n.toString)
  }

  private def quote(s: String, b: StringBuilder): Unit = {
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c >= 0x20 && c < 0x7f => b.append(c)
      case c => b.append(f"\\u${c.toInt}%04x")
    }
    b.append('"')
  }
}
