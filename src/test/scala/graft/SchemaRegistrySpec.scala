package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.blob.Avro
import graft.ops.{Errors, SchemaRegistry}

/** Ports the reference's schema-registry processor tests
  * (internal/impl/confluent/processor_schema_registry_decode_test.go:160-253,
  * processor_schema_registry_encode_test.go:108-243): golden wire bytes,
  * union-wrap JSON shape, logical-type key naming, the error contract, and
  * the once-per-process schema cache discipline.
  */
class SchemaRegistrySpec extends SparkTestBase {

  // decode_test.go:88-104 (testSchema, registry id 3)
  private val identitySchema =
    """{"namespace":"foo.namespace.com","type":"record","name":"identity","fields":[
      |{"name":"Name","type":"string"},
      |{"name":"Address","type":["null",{"namespace":"my.namespace.com","type":"record","name":"address","fields":[
      |{"name":"City","type":"string"},{"name":"State","type":"string"}]}],"default":null},
      |{"name":"MaybeHobby","type":["null","string"]}]}""".stripMargin.replace("\n", "")

  // decode_test.go:106-158 (testSchemaLogicalTypes, registry id 4)
  private val logicalSchema =
    """{"type":"record","name":"LogicalTypes","fields":[
      |{"default":null,"name":"int_time_millis","type":["null",{"type":"int","logicalType":"time-millis"}]},
      |{"default":null,"name":"long_time_micros","type":["null",{"type":"long","logicalType":"time-micros"}]},
      |{"default":null,"name":"long_timestamp_micros","type":["null",{"type":"long","logicalType":"timestamp-micros"}]},
      |{"default":null,"name":"pos_0_33333333","type":["null",{"logicalType":"decimal","precision":16,"scale":2,"type":"bytes"}]}]}"""
      .stripMargin.replace("\n", "")

  private def bytes(s: String): Array[Byte] = s.map(_.toByte).toArray

  // decode_test.go:199-216 golden wire values (sans the 5-byte frame)
  private val hobbyBody =
    bytes("\u0006foo\u0002\u0006foo\u0006bar\u0002\u000edancing")
  private val nullHobbyBody = bytes("\u0006foo\u0002\u0006foo\u0006bar\u0000")
  private val hobbyJson =
    """{"Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}},"MaybeHobby":{"string":"dancing"},"Name":"foo"}"""
  private val nullHobbyJson =
    """{"Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}},"MaybeHobby":null,"Name":"foo"}"""

  private def wireDf(rows: Seq[(Int, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("wire", BinaryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2),
      schema)
  }

  test("decode: golden vectors, union wrapping, error contract") {
    val reg = SchemaRegistry.startRegistry(
      Map(3 -> identitySchema), failIds = Set(5))
    try {
      val df = wireDf(Seq(
        1 -> (Array[Byte](0, 0, 0, 0, 3) ++ hobbyBody),
        2 -> (Array[Byte](0, 0, 0, 0, 3) ++ nullHobbyBody),
        3 -> (Array[Byte](6, 0, 0, 0, 3) ++ hobbyBody), // bad magic
        4 -> (Array[Byte](0, 0, 0, 0, 6) ++ hobbyBody), // unknown id
        5 -> (Array[Byte](0, 0, 0, 0, 5) ++ hobbyBody))) // server 500
      val out = SchemaRegistry.decodeProc(df, reg.url)
        .select("id", "decoded", Errors.ErrCol)
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap

      assert(out(1) === ((hobbyJson, null)))
      assert(out(2) === ((nullHobbyJson, null)))
      assert(out(3)._1 == null &&
        out(3)._2.contains("version number 6 not supported"))
      assert(out(4)._1 == null &&
        out(4)._2.contains("schema '6' not found by registry"))
      assert(out(5)._1 == null &&
        out(5)._2.contains("request failed for schema '5'"))
      // retry discipline: the failing id was attempted 3 times, the good id
      // fetched ONCE for the whole job (JVM-global cache = the reference's
      // per-process cache, decode.go:224-244)
      assert(reg.hits.get("/schemas/ids/3").get() === 1)
      assert(reg.hits.get("/schemas/ids/5").get() === 3)
    } finally reg.stop()
  }

  test("encode: golden vectors via subject lookup, union-mismatch error") {
    val reg = SchemaRegistry.startRegistry(
      Map(3 -> identitySchema), subjects = Map("identity" -> 3))
    try {
      val in = Seq(
        1 -> """{"Address":{"City":"foo","State":"bar"},"Name":"foo","MaybeHobby":"dancing"}""",
        2 -> """{"Address":{"City":"foo","State":"bar"},"Name":"foo","MaybeHobby":null}""",
        3 -> """{"Address":{"City":"foo","State":30},"Name":"foo","MaybeHobby":null}""")
      val df = spark.createDataFrame(in).toDF("id", "text")
      val out = SchemaRegistry.encodeProc(df, reg.url, "identity")
        .select("id", "wire", Errors.ErrCol)
        .collect().map(r =>
          r.getInt(0) -> (r.getAs[Array[Byte]](1), r.getString(2))).toMap

      // encode_test.go:125-131: goavro standard-JSON goldens
      assert(out(1)._1.toSeq === (Array[Byte](0, 0, 0, 0, 3) ++ hobbyBody).toSeq)
      assert(out(2)._1.toSeq === (Array[Byte](0, 0, 0, 0, 3) ++ nullHobbyBody).toSeq)
      // encode_test.go:135-136: State:30 fits no union branch
      assert(out(3)._1 == null &&
        out(3)._2.contains("could not decode any json data in input"))
      assert(reg.hits.get("/subjects/identity/versions/latest").get() === 1)
    } finally reg.stop()
  }

  test("logical types: union keys are <type>.<logicalType> (decode_test.go:211-214)") {
    val schema = Avro.parseSchema(logicalSchema)
    val std = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"int_time_millis":35245000,"long_time_micros":20192000000000,
        |"long_timestamp_micros":62135596800000000,"pos_0_33333333":"!"}""".stripMargin)
    val wire = Avro.encodeStandardJson(schema, std)
    assert(Avro.textual(Avro.decodeBinary(schema, wire)) ===
      """{"int_time_millis":{"int.time-millis":35245000},"long_time_micros":{"long.time-micros":20192000000000},"long_timestamp_micros":{"long.timestamp-micros":62135596800000000},"pos_0_33333333":{"bytes.decimal":"!"}}""")
    // hand-check one varint against the golden bytes (decode_test.go:210's
    // int.time-millis field): union idx 1, zigzag(35245000) little-7-bit
    assert(wire.take(5).toSeq ===
      Seq[Byte](0x02, 0x90.toByte, 0xaf.toByte, 0xce.toByte, 0x21))
  }

  test("avro codec: enums, fixed, arrays, maps, nested unions round-trip") {
    val schema = Avro.parseSchema(
      """{"type":"record","name":"kitchen","fields":[
        |{"name":"e","type":{"type":"enum","name":"Suit","symbols":["SPADES","HEARTS"]}},
        |{"name":"f","type":{"type":"fixed","name":"F4","size":4}},
        |{"name":"a","type":{"type":"array","items":"long"}},
        |{"name":"m","type":{"type":"map","values":["null","double"]}},
        |{"name":"b","type":"bytes"}]}""".stripMargin.replace("\n", ""))
    val std = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      "{\"e\":\"HEARTS\",\"f\":\"abcd\",\"a\":[1,-3,4096],\"m\":{\"x\":1.5,\"y\":null},\"b\":\" \\u00ff!\"}")
    val rt = Avro.decodeBinary(schema, Avro.encodeStandardJson(schema, std))
    assert(Avro.textual(rt) ===
      "{\"a\":[1,-3,4096],\"b\":\" \\u00ff!\",\"e\":\"HEARTS\",\"f\":\"abcd\",\"m\":{\"x\":{\"double\":1.5},\"y\":null}}")
  }

  test("protobuf variant: golden wire bytes + round-trip via schemaType dispatch") {
    // reference: processor_schema_registry_{encode,decode}.go dispatch on
    // the registry's schemaType; protobuf wire = confluent frame + zigzag
    // message-index path (0x00 shorthand for the first message) + proto3
    val protoSchema =
      """syntax = "proto3"; message Person { string name = 1; int64 age = 2; }"""
    val reg = SchemaRegistry.startRegistry(
      Map(9 -> protoSchema), subjects = Map("person" -> 9),
      schemaTypes = Map(9 -> "PROTOBUF"))
    try {
      val df = spark.createDataFrame(Seq(
        1 -> """{"name":"foo","age":"42"}""",
        2 -> """{"name":"x"}""")).toDF("id", "text")
      val enc = SchemaRegistry.encodeProc(df, reg.url, "person")
      val out = enc.select("id", "wire", Errors.ErrCol).collect()
        .map(r => r.getInt(0) -> (r.getAs[Array[Byte]](1), r.getString(2))).toMap
      // hand-assembled: magic 0, id 9 BE, index byte 0, then
      // (tag 0x0a, len 3, "foo") (tag 0x10, varint 42)
      assert(out(1)._1.toSeq === Seq[Byte](0, 0, 0, 0, 9, 0,
        0x0a, 3, 'f', 'o', 'o', 0x10, 42))
      assert(out(2)._1.toSeq === Seq[Byte](0, 0, 0, 0, 9, 0, 0x0a, 1, 'x'))
      val dec = SchemaRegistry.decodeProc(enc, reg.url)
        .select("id", "decoded").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(dec(1) === """{"name":"foo","age":"42"}""")
      assert(dec(2) === """{"name":"x"}""") // proto3 default omission
      // explicit non-zero index path [0] (count 1, index 0 zigzag) decodes too
      val explicitIdx = spark.createDataFrame(Seq(
        3 -> (Array[Byte](0, 0, 0, 0, 9, 2, 0, 0x0a, 1, 'x')))).toDF("id", "wire")
      val dec2 = SchemaRegistry.decodeProc(explicitIdx, reg.url)
        .select("decoded").head().getString(0)
      assert(dec2 === """{"name":"x"}""")
    } finally reg.stop()
  }

  test("wire frame: extractID error shapes (decode.go:181-193)") {
    assert(SchemaRegistry.extractId(Array[Byte](0, 0, 0, 1, 2, 9)) === 258)
    val e1 = intercept[IllegalArgumentException](
      SchemaRegistry.extractId(Array.emptyByteArray))
    assert(e1.getMessage.contains("message is empty"))
    val e2 = intercept[IllegalArgumentException](
      SchemaRegistry.extractId(Array[Byte](0, 0, 0)))
    assert(e2.getMessage.contains("truncated"))
  }
}
