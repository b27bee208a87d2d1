package graft.blob

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** MessagePack codec (SURVEY.md §2.6 plugin methods; reference:
  * internal/impl/msgpack/bloblang.go `parse_msgpack`/`format_msgpack`,
  * internal/impl/msgpack/processor.go to_json/from_json). A hand-written
  * implementation of the public MessagePack spec
  * (https://msgpack.org) over Jackson nodes — no external jar.
  *
  * Encoding is most-compact-form like the reference's Go library:
  * integers pick the smallest fix/uint/int form, strings fixstr/str8/16/32,
  * doubles are float64 (0xcb). Decoding covers every spec family except
  * ext (the reference's library surfaces ext as opaque types that don't
  * JSON-ify either; we raise, matching the processor's error contract).
  */
object MsgPack {

  // ------------------------------------------------------------- encoding

  def encode(node: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(node, out)
    out.toByteArray
  }

  private def write(n: JsonNode, out: ByteArrayOutputStream): Unit = {
    if (n == null || n.isNull) out.write(0xc0)
    else if (n.isBoolean) out.write(if (n.asBoolean()) 0xc3 else 0xc2)
    else if (n.isIntegralNumber) writeLong(n.asLong(), out)
    else if (n.isNumber) { // float64
      out.write(0xcb)
      writeBE(java.lang.Double.doubleToLongBits(n.asDouble()), 8, out)
    } else if (n.isTextual) {
      val b = n.asText().getBytes(UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xda); writeBE(b.length.toLong, 2, out) }
      else { out.write(0xdb); writeBE(b.length.toLong, 4, out) }
      out.write(b, 0, b.length)
    } else if (n.isBinary) {
      val b = n.binaryValue()
      if (b.length < 256) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xc5); writeBE(b.length.toLong, 2, out) }
      else { out.write(0xc6); writeBE(b.length.toLong, 4, out) }
      out.write(b, 0, b.length)
    } else if (n.isArray) {
      val sz = n.size()
      if (sz < 16) out.write(0x90 | sz)
      else if (sz < 65536) { out.write(0xdc); writeBE(sz.toLong, 2, out) }
      else { out.write(0xdd); writeBE(sz.toLong, 4, out) }
      val it = n.elements()
      while (it.hasNext) write(it.next(), out)
    } else if (n.isObject) {
      val sz = n.size()
      if (sz < 16) out.write(0x80 | sz)
      else if (sz < 65536) { out.write(0xde); writeBE(sz.toLong, 2, out) }
      else { out.write(0xdf); writeBE(sz.toLong, 4, out) }
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        write(JsonNodeFactory.instance.textNode(e.getKey), out)
        write(e.getValue, out)
      }
    } else throw new IllegalArgumentException(s"cannot msgpack-encode node type ${n.getNodeType}")
  }

  private def writeLong(v: Long, out: ByteArrayOutputStream): Unit = {
    if (v >= 0) {
      if (v < 128) out.write(v.toInt) // positive fixint
      else if (v < 256) { out.write(0xcc); out.write(v.toInt) }
      else if (v < 65536) { out.write(0xcd); writeBE(v, 2, out) }
      else if (v < 4294967296L) { out.write(0xce); writeBE(v, 4, out) }
      else { out.write(0xcf); writeBE(v, 8, out) }
    } else {
      if (v >= -32) out.write(0xe0 | (v.toInt & 0x1f)) // negative fixint
      else if (v >= Byte.MinValue) { out.write(0xd0); out.write(v.toInt & 0xff) }
      else if (v >= Short.MinValue) { out.write(0xd1); writeBE(v, 2, out) }
      else if (v >= Int.MinValue) { out.write(0xd2); writeBE(v, 4, out) }
      else { out.write(0xd3); writeBE(v, 8, out) }
    }
  }

  private def writeBE(v: Long, bytes: Int, out: ByteArrayOutputStream): Unit = {
    var i = (bytes - 1) * 8
    while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
  }

  // ------------------------------------------------------------- decoding

  def decode(bytes: Array[Byte]): JsonNode = {
    val r = new Reader(bytes)
    val n = r.next()
    if (!r.done)
      throw new IllegalArgumentException("trailing bytes after msgpack value")
    n
  }

  private final class Reader(b: Array[Byte]) {
    private var pos = 0
    private val f = JsonNodeFactory.instance

    // truncated/corrupt input must ERROR: Arrays.copyOfRange zero-pads past
    // the array end, which would silently decode NUL-padded strings (the
    // same hazard Proto.WireReader guards against)
    private def need(n: Int): Unit =
      if (n < 0 || pos + n > b.length)
        throw new IllegalArgumentException(
          s"truncated msgpack input: need $n bytes at offset $pos of ${b.length}")

    private def u8(): Int = { need(1); val v = b(pos) & 0xff; pos += 1; v }
    private def beUnsigned(n: Int): Long = {
      need(n)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
      pos += n; v
    }
    private def take(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }

    def done: Boolean = pos == b.length

    def next(): JsonNode = {
      val t = u8()
      t match {
        case x if x < 0x80 => f.numberNode(x.toLong) // positive fixint
        case x if x >= 0xe0 => f.numberNode((x - 256).toLong) // negative fixint
        case x if (x & 0xf0) == 0x80 => obj(x & 0x0f)
        case x if (x & 0xf0) == 0x90 => arr(x & 0x0f)
        case x if (x & 0xe0) == 0xa0 => f.textNode(new String(take(x & 0x1f), UTF_8))
        case 0xc0 => f.nullNode()
        case 0xc2 => f.booleanNode(false)
        case 0xc3 => f.booleanNode(true)
        case 0xc4 => f.binaryNode(take(u8()))
        case 0xc5 => f.binaryNode(take(beUnsigned(2).toInt))
        case 0xc6 => f.binaryNode(take(beUnsigned(4).toInt))
        case 0xca => f.numberNode(java.lang.Float.intBitsToFloat(beUnsigned(4).toInt).toDouble)
        case 0xcb => f.numberNode(java.lang.Double.longBitsToDouble(beUnsigned(8)))
        case 0xcc => f.numberNode(beUnsigned(1))
        case 0xcd => f.numberNode(beUnsigned(2))
        case 0xce => f.numberNode(beUnsigned(4))
        case 0xcf =>
          val v = beUnsigned(8)
          if (v >= 0) f.numberNode(v)
          else f.numberNode(java.math.BigInteger.valueOf(v & Long.MaxValue)
            .setBit(63)) // uint64 above Long.MaxValue
        case 0xd0 => f.numberNode(u8().toByte.toLong)
        case 0xd1 => f.numberNode(beUnsigned(2).toShort.toLong)
        case 0xd2 => f.numberNode(beUnsigned(4).toInt.toLong)
        case 0xd3 => f.numberNode(beUnsigned(8))
        case 0xd9 => f.textNode(new String(take(u8()), UTF_8))
        case 0xda => f.textNode(new String(take(beUnsigned(2).toInt), UTF_8))
        case 0xdb => f.textNode(new String(take(beUnsigned(4).toInt), UTF_8))
        case 0xdc => arr(beUnsigned(2).toInt)
        case 0xdd => arr(beUnsigned(4).toInt)
        case 0xde => obj(beUnsigned(2).toInt)
        case 0xdf => obj(beUnsigned(4).toInt)
        case x if x == 0xc1 =>
          throw new IllegalArgumentException("invalid msgpack byte 0xc1")
        case _ =>
          throw new IllegalArgumentException(
            f"msgpack ext types are not JSON-representable (byte 0x$t%02x)")
      }
    }

    private def arr(n: Int): JsonNode = {
      val a = f.arrayNode(n)
      var i = 0
      while (i < n) { a.add(next()); i += 1 }
      a
    }

    private def obj(n: Int): JsonNode = {
      val o = f.objectNode()
      var i = 0
      while (i < n) {
        val k = next()
        if (k.isContainerNode)
          throw new IllegalArgumentException("msgpack map key is not JSON-representable")
        val key = k.asText() // scalar keys stringify (numbers, bools)
        o.set(key, next())
        i += 1
      }
      o
    }
  }

  // ---------------------------------------------------------- Column API

  // one thread-safe mapper shared across rows (not one per row)
  private val mapper = new ObjectMapper()

  /** format_msgpack (bloblang.go): JSON text → MessagePack bytes. UDF —
    * genuinely built-in-less.
    */
  val formatMsgpack: Column => Column = {
    val u = udf((json: String) =>
      if (json == null) null
      else encode(mapper.readTree(json)))
    c => u(c)
  }

  /** parse_msgpack (bloblang.go): MessagePack bytes → JSON text. */
  val parseMsgpack: Column => Column = {
    val u = udf((bytes: Array[Byte]) =>
      if (bytes == null) null
      else mapper.writeValueAsString(decode(bytes)))
    c => u(c)
  }
}
