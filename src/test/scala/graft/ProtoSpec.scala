package graft

import graft.blob.Proto
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's protobuf processor tests byte-for-byte:
  * internal/old/processor/protobuf_test.go (TestProtobufBasic /
  * TestProtobufErrors) and the golden pipelines
  * config/test/protobuf/{people,house}.yaml.
  */
class ProtoSpec extends AnyFunSuite with SparkTestBase {

  // the reference's schema files, config/test/protobuf/schema/*.proto
  private val personProto =
    """syntax = "proto3";
      |package testing;
      |
      |import "google/protobuf/timestamp.proto";
      |
      |message Person {
      |  string first_name = 1;
      |  string last_name = 2;
      |  string full_name = 3;
      |  int32 age = 4;
      |  int32 id = 5;  // Unique ID number for this person.
      |  string email = 6;
      |
      |  google.protobuf.Timestamp last_updated = 7;
      |}
      |""".stripMargin
  private val houseProto =
    """syntax = "proto3";
      |package testing;
      |
      |import "person.proto";
      |
      |message House {
      |  repeated testing.Person people = 1;
      |  string address = 2;
      |}
      |""".stripMargin
  private val envelopeProto =
    """syntax = "proto3";
      |package testing;
      |
      |import "google/protobuf/any.proto";
      |import "google/protobuf/timestamp.proto";
      |
      |message Envelope {
      |  int32 id = 1;
      |  google.protobuf.Any content = 2;
      |}
      |""".stripMargin

  private val fs = Proto.compile(Seq(personProto, houseProto, envelopeProto))

  private val johnBytes = Array[Int](
    0x0a, 0x04, 0x6a, 0x6f, 0x68, 0x6e, 0x12, 0x05, 0x6f, 0x61, 0x74, 0x65, 0x73, 0x20, 0x0a)
    .map(_.toByte)
  private val darylBytes = Array[Int](
    0x0a, 0x05, 0x64, 0x61, 0x72, 0x79, 0x6c, 0x12, 0x04, 0x68, 0x61, 0x6c, 0x6c).map(_.toByte)
  private val calebBytes = Array[Int](
    0x0a, 0x05, 0x63, 0x61, 0x6c, 0x65, 0x62, 0x12, 0x05, 0x71, 0x75, 0x61, 0x79, 0x65, 0x32, 0x11,
    0x63, 0x61, 0x6c, 0x65, 0x62, 0x40, 0x6d, 0x79, 0x73, 0x70, 0x61, 0x63, 0x65, 0x2e, 0x63, 0x6f,
    0x6d).map(_.toByte)
  private val anyPersonBytes = Array[Int](
    0x8, 0xeb, 0x5, 0x12, 0x2b, 0xa, 0x22, 0x74, 0x79, 0x70, 0x65, 0x2e, 0x67, 0x6f, 0x6f, 0x67,
    0x6c, 0x65, 0x61, 0x70, 0x69, 0x73, 0x2e, 0x63, 0x6f, 0x6d, 0x2f, 0x74, 0x65, 0x73, 0x74, 0x69,
    0x6e, 0x67, 0x2e, 0x50, 0x65, 0x72, 0x73, 0x6f, 0x6e, 0x12, 0x5, 0xa, 0x3, 0x62, 0x6f, 0x62)
    .map(_.toByte)
  private val anyHouseBytes = Array[Int](
    0x8, 0xeb, 0x5, 0x12, 0x2a, 0xa, 0x21, 0x74, 0x79, 0x70, 0x65, 0x2e, 0x67, 0x6f, 0x6f, 0x67,
    0x6c, 0x65, 0x61, 0x70, 0x69, 0x73, 0x2e, 0x63, 0x6f, 0x6d, 0x2f, 0x74, 0x65, 0x73, 0x74, 0x69,
    0x6e, 0x67, 0x2e, 0x48, 0x6f, 0x75, 0x73, 0x65, 0x12, 0x5, 0x12, 0x3, 0x31, 0x32, 0x33)
    .map(_.toByte)

  private def enc(msg: String, json: String): Array[Byte] =
    Proto.encodeMessage(fs, msg, new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
  private def dec(msg: String, bytes: Array[Byte]): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(Proto.decodeMessage(fs, msg, bytes))

  test("json to protobuf (protobuf_test.go 'json to protobuf', byte-exact)") {
    assert(enc("testing.Person", """{"firstName":"john","lastName":"oates","age":10}""")
      .sameElements(johnBytes))
    assert(enc("testing.Person", """{"firstName":"daryl","lastName":"hall"}""")
      .sameElements(darylBytes))
    assert(enc("testing.Person",
      """{"firstName":"caleb","lastName":"quaye","email":"caleb@myspace.com"}""")
      .sameElements(calebBytes))
  }

  test("protobuf to json (protobuf_test.go 'protobuf to json', string-exact)") {
    assert(dec("testing.Person", johnBytes) ===
      """{"firstName":"john","lastName":"oates","age":10}""")
    assert(dec("testing.Person", darylBytes) === """{"firstName":"daryl","lastName":"hall"}""")
    assert(dec("testing.Person", calebBytes) ===
      """{"firstName":"caleb","lastName":"quaye","email":"caleb@myspace.com"}""")
  }

  test("any: json to protobuf (protobuf_test.go, byte-exact, original field names accepted)") {
    assert(enc("testing.Envelope",
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.Person","first_name":"bob"}}""")
      .sameElements(anyPersonBytes))
    assert(enc("testing.Envelope",
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.House","address":"123"}}""")
      .sameElements(anyHouseBytes))
  }

  test("any: protobuf to json (protobuf_test.go, string-exact)") {
    assert(dec("testing.Envelope", anyPersonBytes) ===
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.Person","firstName":"bob"}}""")
    assert(dec("testing.Envelope", anyHouseBytes) ===
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.House","address":"123"}}""")
  }

  test("from_json error contract (protobuf_test.go TestProtobufErrors)") {
    val e1 = intercept[IllegalArgumentException] {
      enc("testing.Person", """{"firstName":"john","ageFoo":10}""")
    }
    assert(e1.getMessage === "message type testing.Person has no known field named ageFoo")
    val e2 = intercept[IllegalArgumentException] {
      enc("testing.Person", """{"firstName":5}""")
    }
    assert(e2.getMessage === "bad input: expecting string ; instead got 5")
  }

  test("timestamp well-known type round-trips as RFC 3339 (Person.last_updated)") {
    val json = """{"firstName":"t","lastUpdated":"2021-06-02T10:15:30.500Z"}"""
    val b = enc("testing.Person", json)
    assert(dec("testing.Person", b) ===
      """{"firstName":"t","lastUpdated":"2021-06-02T10:15:30.500Z"}""")
  }

  test("nested repeated message: House round-trip (house.yaml shape)") {
    val json = """{"people":[{"firstName":"john","lastName":"oates","age":10}],"address":"11 A St"}"""
    val b = enc("testing.House", json)
    assert(dec("testing.House", b) === json)
  }

  test("people.yaml golden pipeline: bridge + mutate + error row, over a DataFrame") {
    val from1 = Proto.fromJsonErr(fs, "testing.Person")
    val to1 = Proto.toJsonErr(fs, "testing.Person")
    val input = Seq(
      """{"firstName":"john","lastName":"oates","age":10}""",
      """{"firstName":"daryl","lastName":"hall"}""",
      """{"firstName":"caleb","lastName":"quaye","email":"caleb@myspace.com"}""",
      """{"firstName":"bad","lastName":"data","contains":"unrecognized fields"}""")
    import spark.implicits._
    val df = input.toDF("content")
    // from_json -> to_json
    val bridged = df
      .withColumn("b1", from1(col("content")))
      .withColumn("j1", to1(col("b1._1")))
    // bloblang mutate: root.age = (this.age | 0) + 10; root.fullName = first + " " + last
    val mutated = bridged.withColumn("j2",
      when(col("b1._2").isNotNull, lit(null).cast("string")).otherwise(
        to_json(struct(
          get_json_object(col("j1._1"), "$.firstName").as("firstName"),
          get_json_object(col("j1._1"), "$.lastName").as("lastName"),
          concat_ws(" ", get_json_object(col("j1._1"), "$.firstName"),
            get_json_object(col("j1._1"), "$.lastName")).as("fullName"),
          (coalesce(get_json_object(col("j1._1"), "$.age").cast("int"), lit(0)) + 10).as("age"),
          get_json_object(col("j1._1"), "$.email").as("email")))))
      .withColumn("b2", from1(col("j2")))
      .withColumn("j3", to1(col("b2._1")))
      // catch: root = "error: %v".format(error())
      .withColumn("out", coalesce(col("j3._1"),
        concat(lit("error: "), coalesce(col("b1._2"), col("b2._2"), col("j1._2"), col("j3._2")))))
    val out = mutated.select("out").as[String].collect()
    assert(out(0) === """{"firstName":"john","lastName":"oates","fullName":"john oates","age":20}""")
    assert(out(1) === """{"firstName":"daryl","lastName":"hall","fullName":"daryl hall","age":10}""")
    assert(out(2) === """{"firstName":"caleb","lastName":"quaye","fullName":"caleb quaye","age":10,"email":"caleb@myspace.com"}""")
    assert(out(3) === "error: failed to unmarshal JSON message: message type testing.Person has no known field named contains")
  }

  test("house.yaml golden pipeline: House bridge then first person") {
    val fromH = Proto.fromJson(fs, "testing.House")
    val toH = Proto.toJson(fs, "testing.House")
    import spark.implicits._
    val df = Seq("""{"people":[{"firstName":"john","lastName":"oates","age":10}]}""").toDF("content")
    val out = df
      .withColumn("j", toH(fromH(col("content"))))
      .withColumn("p0", get_json_object(col("j"), "$.people[0]"))
      .select("p0").as[String].collect()
    assert(out(0) === """{"firstName":"john","lastName":"oates","age":10}""")
  }

  test("enum / packed repeated / map / sint round-trips") {
    val schema =
      """syntax = "proto3";
        |package t;
        |enum Color { UNKNOWN = 0; RED = 1; BLUE = 2; }
        |message M {
        |  Color color = 1;
        |  repeated int32 nums = 2;
        |  map<string, int64> counts = 3;
        |  sint32 delta = 4;
        |  fixed64 big = 5;
        |  bytes raw = 6;
        |  oneof pick { string a = 7; int32 b = 8; }
        |}
        |""".stripMargin
    val fs2 = Proto.compile(Seq(schema))
    def rt(json: String): String =
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(
        Proto.decodeMessage(fs2, "t.M", Proto.encodeMessage(fs2, "t.M",
          new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))))
    assert(rt("""{"color":"RED","nums":[1,2,300],"delta":-5}""") ===
      """{"color":"RED","nums":[1,2,300],"delta":-5}""")
    // int64 map values emit as strings (proto3 JSON), enum 0 omitted
    assert(rt("""{"color":"UNKNOWN","counts":{"x":7}}""") === """{"counts":{"x":"7"}}""")
    // packed encoding on the wire: nums [1,2,300] = tag 0x12, len 4, 01 02 ac 02
    val b = Proto.encodeMessage(fs2, "t.M",
      new com.fasterxml.jackson.databind.ObjectMapper().readTree("""{"nums":[1,2,300]}"""))
    assert(b.sameElements(Array[Int](0x12, 0x04, 0x01, 0x02, 0xac, 0x02).map(_.toByte)))
    assert(rt("""{"big":"18446744073709551615"}""") === """{"big":"18446744073709551615"}""")
    assert(rt("""{"raw":"aGVsbG8="}""") === """{"raw":"aGVsbG8="}""")
    assert(rt("""{"a":"x"}""") === """{"a":"x"}""")
  }

  test("truncated/corrupt wire input errors instead of zero-padding") {
    val valid = enc("testing.Person", """{"firstName":"caleb","email":"caleb@myspace.com"}""")
    // cut mid-string: the length prefix promises more bytes than remain
    val truncated = valid.take(valid.length - 3)
    val e = intercept[Exception] { dec("testing.Person", truncated) }
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // a nested length that overruns its enclosing buffer also errors
    val overrun = Array[Int](0x3a, 0x7f, 0x01).map(_.toByte) // field 7 len 127, 1 byte present
    val e2 = intercept[Exception] { dec("testing.Person", overrun) }
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
  }

  test("map entry with a default key round-trips the key, not an empty string") {
    val schema =
      """syntax = "proto3";
        |package t;
        |message M { map<int32, string> m = 1; map<bool, int32> bm = 2; }
        |""".stripMargin
    val fs2 = Proto.compile(Seq(schema))
    def rt(json: String): String =
      new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(
        Proto.decodeMessage(fs2, "t.M", Proto.encodeMessage(fs2, "t.M",
          new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))))
    // key 0 / key false are type defaults: omitted on the wire, restored on decode
    assert(rt("""{"m":{"0":"x","3":"y"}}""") === """{"m":{"0":"x","3":"y"}}""")
    assert(rt("""{"bm":{"false":7}}""") === """{"bm":{"false":7}}""")
  }

  test("Any wrapping a well-known scalar-form type round-trips") {
    val wire = enc("testing.Envelope",
      """{"id":1,"content":{"@type":"type.googleapis.com/google.protobuf.Timestamp","value":"2021-06-02T10:15:30Z"}}""")
    assert(dec("testing.Envelope", wire) ===
      """{"id":1,"content":{"@type":"type.googleapis.com/google.protobuf.Timestamp","value":"2021-06-02T10:15:30Z"}}""")
  }

  test("enum allow_alias: the first declared name for a number wins on decode") {
    val schema =
      """syntax = "proto3";
        |package t;
        |enum E {
        |  option allow_alias = true;
        |  ZERO = 0; FIRST = 1; ALIAS_A = 2; ALIAS_B = 2; OTHER = 3; MORE = 4; YET = 5;
        |}
        |message M { E e = 1; }
        |""".stripMargin
    val fs2 = Proto.compile(Seq(schema))
    val wire = Proto.encodeMessage(fs2, "t.M",
      new com.fasterxml.jackson.databind.ObjectMapper().readTree("""{"e":"ALIAS_B"}"""))
    val back = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(
      Proto.decodeMessage(fs2, "t.M", wire))
    assert(back === """{"e":"ALIAS_A"}""")
  }

  test("unterminated string literal in a .proto source is a parse error") {
    val e = intercept[Exception] {
      Proto.compile(Seq("syntax = \"proto3;\npackage t;\nmessage M { int32 a = 1; }"))
    }
    assert(e.getMessage.contains("unterminated"), e.getMessage)
  }

  test("a 2^32+k corrupt length prefix errors instead of Int-wrapping to k") {
    val schema =
      """syntax = "proto3";
        |package t;
        |message M { string s = 1; int32 a = 2; }
        |""".stripMargin
    val fs2 = Proto.compile(Seq(schema))
    // field 1, wire type 2, length varint = 2^32 + 3 (wraps to 3 as Int),
    // then 3 payload bytes — a truncating decoder would "succeed" and
    // misread the stream; the contract is an error
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x0a) // tag: field 1, wt 2
    var v = (1L << 32) + 3
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.write("abc".getBytes("UTF-8"))
    val e = intercept[Exception](Proto.decodeMessage(fs2, "t.M", out.toByteArray))
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("a field resolves a type nested in its OWN message by simple name") {
    // the declaring message is itself a scope: resolution must try
    // t.M.Inner before t.Inner / Inner
    val fs2 = Proto.compile(Seq(
      """syntax = "proto3";
        |package t;
        |message M {
        |  message Inner { int32 a = 1; }
        |  Inner x = 1;
        |}""".stripMargin))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val wire = Proto.encodeMessage(fs2, "t.M", m.readTree("""{"x":{"a":7}}"""))
    assert(m.writeValueAsString(Proto.decodeMessage(fs2, "t.M", wire)) == """{"x":{"a":7}}""")
  }
}
