package graft

import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import graft.blob.MsgPack

/** MessagePack codec (reference: internal/impl/msgpack/bloblang.go examples
  * and internal/impl/msgpack/processor_test.go golden vectors — input
  * fixtures copied verbatim as the spec, implementation is ours from the
  * public msgpack.org format spec).
  */
class MsgPackSpec extends SparkTestBase {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("""format_msgpack({"foo":"bar"}) == 81a3666f6fa3626172 (bloblang.go example)""") {
    assert(hex(MsgPack.encode(mapper.readTree("""{"foo":"bar"}"""))) == "81a3666f6fa3626172")
    assert(mapper.writeValueAsString(
      MsgPack.decode("81a3666f6fa3626172".grouped(2).map(Integer.parseInt(_, 16).toByte).toArray))
      == """{"foo":"bar"}""")
  }

  test("processor_test.go golden vector decodes (ints, floats, bools, null, nested)") {
    val bytes = Base64.getDecoder.decode(
      "iKNrZXmjZm9vp3RydWVLZXnDqGZhbHNlS2V5wqdudWxsS2V5wKZpbnRLZXnQe6hmbG9hdEtlectARszMzMzMzaVhcnJheZGjYmFypm5lc3RlZIGja2V5o2Jheg==")
    val n = MsgPack.decode(bytes)
    assert(n.get("key").asText() == "foo")
    assert(n.get("trueKey").asBoolean() && !n.get("falseKey").asBoolean())
    assert(n.get("nullKey").isNull)
    assert(n.get("intKey").asLong() == 123L)
    assert(n.get("floatKey").asDouble() == 45.6)
    assert(n.get("array").get(0).asText() == "bar")
    assert(n.get("nested").get("key").asText() == "baz")
  }

  test("integer forms are most-compact and round-trip at every boundary") {
    val cases = Seq(
      0L -> "00", 127L -> "7f", 128L -> "cc80", 255L -> "ccff",
      256L -> "cd0100", 65535L -> "cdffff", 65536L -> "ce00010000",
      4294967295L -> "ceffffffff", 4294967296L -> "cf0000000100000000",
      -1L -> "ff", -32L -> "e0", -33L -> "d0df", -128L -> "d080",
      -129L -> "d1ff7f", -32768L -> "d18000", -32769L -> "d2ffff7fff",
      -2147483648L -> "d280000000", -2147483649L -> "d3ffffffff7fffffff")
    for ((v, expect) <- cases) {
      val enc = MsgPack.encode(mapper.readTree(v.toString))
      assert(hex(enc) == expect, s"encode $v")
      assert(MsgPack.decode(enc).asLong() == v, s"decode $v")
    }
  }

  test("string/array/map length boundaries round-trip with correct headers") {
    val s31 = "x" * 31; val s32 = "x" * 32; val s256 = "y" * 256
    assert(hex(MsgPack.encode(mapper.readTree(s""""$s31""""))).startsWith("bf"))
    assert(hex(MsgPack.encode(mapper.readTree(s""""$s32""""))).startsWith("d920"))
    assert(hex(MsgPack.encode(mapper.readTree(s""""$s256""""))).startsWith("da0100"))
    val arr17 = (1 to 17).mkString("[", ",", "]")
    assert(hex(MsgPack.encode(mapper.readTree(arr17))).startsWith("dc0011"))
    val map16 = (1 to 16).map(i => s""""k$i":$i""").mkString("{", ",", "}")
    assert(hex(MsgPack.encode(mapper.readTree(map16))).startsWith("de0010"))
    for (doc <- Seq(s""""$s256"""", arr17, map16)) {
      assert(mapper.writeValueAsString(MsgPack.decode(MsgPack.encode(mapper.readTree(doc))))
        == mapper.writeValueAsString(mapper.readTree(doc)))
    }
  }

  test("doubles encode as float64 and float32 decodes") {
    val enc = MsgPack.encode(mapper.readTree("45.6"))
    assert(hex(enc) == "cb4046cccccccccccd")
    assert(MsgPack.decode(enc).asDouble() == 45.6)
    // float32 1.5 = 0xca3fc00000
    val f32 = Array(0xca, 0x3f, 0xc0, 0, 0).map(_.toByte)
    assert(MsgPack.decode(f32).asDouble() == 1.5)
  }

  test("Column round-trip: parse_msgpack(format_msgpack(doc)) == doc") {
    val docs = Seq(
      """{"a":1,"b":[true,null,"s"],"c":{"d":-7.5}}""",
      """{"empty":{},"arr":[]}""")
    val df = docs.toDF("doc")
    val rt = df.select(MsgPack.parseMsgpack(MsgPack.formatMsgpack(col("doc"))).as("rt"))
      .as[String].collect().toSeq
    assert(rt == docs)
  }

  test("ext types raise (not JSON-representable)") {
    intercept[IllegalArgumentException] {
      MsgPack.decode(Array(0xd4, 0x01, 0x00).map(_.toByte)) // fixext1
    }
  }
}
