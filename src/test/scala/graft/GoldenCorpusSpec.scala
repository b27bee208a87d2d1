package graft

import org.apache.spark.sql.functions._
import graft.blob.Blob
import graft.ops.Transforms

/** Golden cases ported VERBATIM from the reference's own declarative test
  * corpus (reference dir `config/test`, runner internal/cli/test/case.go):
  * input batches and expected outputs are copied from the YAML files, the
  * pipelines re-expressed as Catalyst columns. This is the "matches the
  * reference's results on its own test queries" surface.
  */
class GoldenCorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("cities.blobl: filter -> map_each -> sort -> join (cities_test.yaml)") {
    // reference: config/test/bloblang/cities.blobl + cities_test.yaml
    val input = """{"locations":[{"name":"Seattle","state":"WA"},
      |{"name":"New York","state":"NY"},{"name":"Bellevue","state":"WA"},
      |{"name":"Olympia","state":"WA"}]}""".stripMargin.replace("\n", "")
    val locs = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "STRUCT<locations: ARRAY<STRUCT<name: STRING, state: STRING>>>"))
      .getField("locations")
    val got = Seq(input).toDF("doc")
      .select(array_join(array_sort(
        transform(filter(locs, l => l.getField("state") === "WA"),
          l => l.getField("name"))), ", ").as("Cities"))
      .as[String].head()
    assert(got == "Bellevue, Olympia, Seattle")
  }

  test("filters.yaml: deleted() on content match, all three cases") {
    // reference: config/test/filters.yaml — root = if content().contains("delete me") { deleted() }
    def run(batch: Seq[String]): Seq[String] =
      Transforms.filterProc(batch.toDF("content"), col("content").contains("delete me"))
        .as[String].collect().toSeq

    assert(run(Seq("hello world delete me please")).isEmpty) // delete one of one
    assert(run(Seq( // delete all
      "hello world delete me please", "hello world 2 delete me please",
      "hello world 3 delete me please", "hello world 4 delete me please")).isEmpty)
    assert(run(Seq( // delete some
      "hello world delete me please", "hello world 2",
      "hello world 3 delete me please", "hello world 4")) ==
      Seq("hello world 2", "hello world 4"))
  }

  test("csv_formatter.blobl: sorted header + rows joined (csv_formatter_test.yaml)") {
    // reference: config/test/bloblang/csv_formatter.blobl — header from
    // this.0.keys().sort(); rows = values sorted by key, CSV-joined
    val input =
      """[{"foo":"hello world","baz":110,"bar":"bar value","buz":false},
        |{"foo":"hello world 2","bar":"bar value 2","baz":220,"buz":true},
        |{"foo":"hello world 3","bar":"bar value 3","baz":330,"buz":true}]"""
        .stripMargin.replace("\n", "")
    val rows = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL("ARRAY<MAP<STRING, STRING>>"))
    val header = array_join(array_sort(map_keys(element_at(rows, 1))), ",")
    val body = array_join(
      transform(rows, r =>
        array_join(transform(array_sort(map_keys(r)), k => element_at(r, k)), ",")),
      "\n")
    val got = Seq(input).toDF("doc")
      .select(concat(header, lit("\n"), body)).as[String].head()
    assert(got ==
      """bar,baz,buz,foo
        |bar value,110,false,hello world
        |bar value 2,220,true,hello world 2
        |bar value 3,330,true,hello world 3""".stripMargin)
  }

  test("boolean_operands.yaml: and/or over missing fields with catch") {
    // reference: config/test/bloblang/boolean_operands.yaml — SQL
    // three-valued logic reproduces Bloblang's error-catch results exactly
    val inputs = Seq(
      """{"none":"of the target values"}""",
      """{"first":true}""",
      """{"first":false}""",
      """{"first":true,"second":true}""")
    val parsed = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL("STRUCT<first: BOOLEAN, second: BOOLEAN>"))
    val ands = parsed.getField("first") && parsed.getField("second")
    val ors = parsed.getField("first") || parsed.getField("second")
    val got = inputs.toDF("doc").select(
      Blob.catchOr(ands.cast("string"), lit("failed")).as("ands"),
      Blob.catchOr(ors.cast("string"), lit("failed")).as("ors"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("failed", "failed"),  // neither exists
      ("failed", "true"),    // first=true
      ("false", "failed"),   // first=false
      ("true", "true")))     // both
  }

  test("walk_json.yaml: recursive unescape over strings, arrays, objects") {
    // reference: config/test/bloblang/walk_json.yaml — map unescape_values
    val cases = Seq(
      "foo &amp; bar" -> "foo & bar",
      """["foo &amp; bar",10,"1 &lt; 2"]""" -> """["foo & bar",10,"1 < 2"]""",
      """{"first":"foo &amp; bar","second":10,"third":"1 &lt; 2"}""" ->
        """{"first":"foo & bar","second":10,"third":"1 < 2"}""",
      """{"first":{"nested":"foo &amp; bar"},"second":10,"third":"1 &lt; 2"}""" ->
        """{"first":{"nested":"foo & bar"},"second":10,"third":"1 < 2"}""",
      """{"first":{"nested":"foo &amp; bar"},"second":10,"third":["1 &lt; 2",{"also_nested":"2 &gt; 1"}]}""" ->
        """{"first":{"nested":"foo & bar"},"second":10,"third":["1 < 2",{"also_nested":"2 > 1"}]}""")
    def unescape(s: String): String = s
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&#34;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    val got = cases.map(_._1).toDF("doc")
      .select(Blob.jsonWalkStrings(col("doc"), unescape)).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("windowed.yaml values survive end-to-end through the tumbling query shape") {
    // reference: config/test/bloblang/windowed.yaml — counts {243,71,10,333,164}
    // (group-level reduce asserted in GroupOpsSpec; here the full
    // window+agg pipeline over event-time)
    val ts0 = 1704067200L
    val rows = Seq(243, 71, 10, 333, 164).zipWithIndex
      .map { case (v, i) => ("w1", new java.sql.Timestamp((ts0 + i * 60) * 1000), v) }
      .toDF("key", "ts", "count")
    val got = rows.groupBy(col("key"), window(col("ts"), "1 hour"))
      .agg(sum(col("count")).as("sum"), max(col("count")).as("max"))
      .select("sum", "max").as[(Long, Int)].head()
    assert(got == ((821L, 333)))
  }
}
