package graft

import org.apache.spark.sql.{Column, DataFrame}
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

  test("github_releases.blobl: nested map_each -> filter -> flatten (github_releases_test.yaml)") {
    // reference: config/test/bloblang/github_releases.blobl + _test.yaml —
    // the largest real Bloblang program in the corpus
    val input =
      """[{"tag_name":"1.23.4","assets":[
        |{"name":"benthos-lambda_1.23.4_linux_amd64.zip","download_count":123},
        |{"name":"benthos_1.23.4_checksums.txt","download_count":456},
        |{"name":"benthos_1.23.4_darwin_amd64.tar.gz","download_count":789},
        |{"name":"benthos_1.23.4_linux_amd64.tar.gz","download_count":101112},
        |{"name":"benthos_1.23.4_linux_arm64.tar.gz","download_count":131415}]}]"""
        .stripMargin.replace("\n", "")
    val releases = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "ARRAY<STRUCT<tag_name: STRING, assets: ARRAY<STRUCT<name: STRING, download_count: BIGINT>>>>"))
    val distOf = (name: Column) => regexp_replace(name,
      "^benthos-?((lambda_)|_)[0-9\\.]+(-rc[0-9]+)?_([^\\.]+).*", "$2$4")
    val mapped = flatten(transform(releases, release =>
      filter(
        transform(release.getField("assets"), asset => struct(
          lit("github").as("source"),
          distOf(asset.getField("name")).as("dist"),
          asset.getField("download_count").as("download_count"),
          // .trim("v") — cutset trim of the tag
          regexp_replace(release.getField("tag_name"), "^v+|v+$", "").as("version"))),
        asset => asset.getField("dist") =!= "checksums")))
    val got = Seq(input).toDF("doc").select(explode(mapped).as("a"))
      .select("a.dist", "a.download_count", "a.source", "a.version")
      .as[(String, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("lambda_linux_amd64", 123L, "github", "1.23.4"),
      ("darwin_amd64", 789L, "github", "1.23.4"),
      ("linux_amd64", 101112L, "github", "1.23.4"),
      ("linux_arm64", 131415L, "github", "1.23.4")))
  }

  test("message_expansion.yaml: doc_root merged into each item, unarchived") {
    // reference: config/test/bloblang/message_expansion.yaml
    val input =
      """{"id":"foobar","items":[{"content":"foo"},{"content":"bar"},{"content":"baz"}]}"""
    val doc = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "STRUCT<id: STRING, items: ARRAY<STRUCT<content: STRING>>>"))
    val got = Seq(input).toDF("doc")
      .select(doc.getField("id").as("id"), explode(doc.getField("items")).as("item"))
      .select(to_json(struct(col("item.content").as("content"), col("id"))))
      .as[String].collect().toSeq
    assert(got == Seq(
      """{"content":"foo","id":"foobar"}""",
      """{"content":"bar","id":"foobar"}""",
      """{"content":"baz","id":"foobar"}"""))
  }

  test("fans.yaml: match-deleted() filtering inside a nested array") {
    // reference: config/test/bloblang/fans.yaml
    val input =
      """{"id":"foo","fans":[{"name":"bev","obsession":0.57},{"name":"grace","obsession":0.21},
        |{"name":"ali","obsession":0.89},{"name":"vic","obsession":0.43}]}"""
        .stripMargin.replace("\n", "")
    val doc = from_json(col("doc"),
      org.apache.spark.sql.types.DataType.fromDDL(
        "STRUCT<id: STRING, fans: ARRAY<STRUCT<name: STRING, obsession: DOUBLE>>>"))
    val got = Seq(input).toDF("doc")
      .select(to_json(struct(
        filter(doc.getField("fans"), f => f.getField("obsession") > 0.5).as("fans"),
        doc.getField("id").as("id"))))
      .as[String].head()
    assert(got ==
      """{"fans":[{"name":"bev","obsession":0.57},{"name":"ali","obsession":0.89}],"id":"foo"}""")
  }

  test("literals.yaml: conditional literal fields and array elements, both envs") {
    // reference: config/test/bloblang/literals.yaml — if without else deletes
    // the field/element; heterogeneous JSON built as text (Spark arrays are
    // homogeneous, the assertion is on the serialized form like the YAML's)
    def run(fooEnabled: Boolean, counts: Seq[Int]): Seq[String] = {
      val cnt = col("count")
      val f2 = if (fooEnabled) lit("\"2\":\"foo\"") else lit(null).cast("string")
      val f3 = when(cnt > 5, concat(lit("\"3\":"), cnt.cast("string")))
      val arrItems = array(
        lit("\"1\""),
        if (fooEnabled) lit("\"foo\"") else lit(null).cast("string"),
        when(cnt > 5, cnt.cast("string")),
        lit("\"4\""))
      val f4 = concat(lit("\"4\":["),
        array_join(filter(arrItems, x => x.isNotNull), ","), lit("]"))
      val frags = array(lit("\"1\":\"1\""), f2, f3, f4)
      counts.toDF("count")
        .select(concat(lit("{"),
          array_join(filter(frags, x => x.isNotNull), ","), lit("}")))
        .as[String].collect().toSeq
    }
    assert(run(fooEnabled = true, Seq(10, 3)) == Seq(
      """{"1":"1","2":"foo","3":10,"4":["1","foo",10,"4"]}""",
      """{"1":"1","2":"foo","4":["1","foo","4"]}"""))
    assert(run(fooEnabled = false, Seq(10, 3)) == Seq(
      """{"1":"1","3":10,"4":["1",10,"4"]}""",
      """{"1":"1","4":["1","4"]}"""))
  }

  test("csv.yaml: header drop, blank-line drop, per-row trimmed numeric sum") {
    // reference: config/test/bloblang/csv.yaml — both cases (clean + whitespace)
    def run(doc: String): String = {
      val lines = split(col("doc"), "\n")
      val body = filter(
        org.apache.spark.sql.functions.slice(lines, lit(2), size(lines)),
        l => length(trim(l)) > 0)
      val sums = transform(body, l =>
        aggregate(split(l, ","), lit(0.0),
          (acc, x) => acc + coalesce(trim(x).try_cast("double"), lit(0.0)))
          .cast("long"))
      Seq(doc).toDF("doc").select(to_json(sums)).as[String].head()
    }
    assert(run("cat1,cat2,cat3\n1,2,3\n7,11,23\n89,23,2") == "[6,41,114]")
    assert(run("cat1, cat2,cat3\n\n1, 2,3\n7,11 ,23\n\n89 , 23 ,2") == "[6,41,114]")
  }

  test("env.yaml: env() lookups land as nullable fields, all three cases") {
    // reference: config/test/bloblang/env.yaml — missing env var → null
    // field KEPT in the output (unlike literals.yaml's deleted-if)
    def run(environment: Map[String, String]): String =
      Seq(1).toDF("x").select(
        to_json(struct(
          Blob.envFn("BAR", environment).as("bar_env"),
          Blob.envFn("FOO", environment).as("foo_env")),
          Map("ignoreNullFields" -> "false")))
        .as[String].head()
    assert(run(Map("FOO" -> "fooval", "BAR" -> "barval")) ==
      """{"bar_env":"barval","foo_env":"fooval"}""")
    assert(run(Map("FOO" -> "fooval")) == """{"bar_env":null,"foo_env":"fooval"}""")
    assert(run(Map.empty) == """{"bar_env":null,"foo_env":null}""")
  }

  test("files_for_content.yaml: file fixture uppercased equals the output fixture") {
    // reference: config/test/files_for_content.yaml + files/input.txt,
    // files/output.txt (fixtures inlined verbatim)
    val input = Seq("hello world", "", "this file", "", "is a test input", "",
      "and it lives in a file because", "", "it's very large and would", "",
      "look ugly if it were inline in the test").mkString("\n")
    val expected = Seq("HELLO WORLD", "", "THIS FILE", "", "IS A TEST INPUT", "",
      "AND IT LIVES IN A FILE BECAUSE", "", "IT'S VERY LARGE AND WOULD", "",
      "LOOK UGLY IF IT WERE INLINE IN THE TEST").mkString("\n")
    val got = Seq(input).toDF("content")
      .select(Blob.uppercase(col("content"))).as[String].head()
    assert(got == expected)
  }

  test("cookbooks/filtering.yaml: match-deleted() over meta/doc/urls with catch(false)") {
    // reference: config/test/cookbooks/filtering.yaml + _benthos_test.yaml
    val rows = Seq(
      ("""{"doc":{"should":"remain"},"id":"1"}""", null),
      ("""{"doc":{"should":"not remain"},"id":"2"}""", "foo"),
      ("""{"doc":{"should":"not remain","type":"bar"},"id":"3"}""", null),
      ("""{"doc":{"should":"not remain","urls":["https://www.benthos.dev/"]},"id":"4"}""", null))
      .toDF("content", "topic")
    val urls = from_json(get_json_object(col("content"), "$.doc.urls"),
      org.apache.spark.sql.types.DataType.fromDDL("ARRAY<STRING>"))
    val deleteWhen =
      coalesce(col("topic"), lit("")) === "foo" ||
      coalesce(get_json_object(col("content"), "$.doc.type"), lit("")) === "bar" ||
      coalesce(array_contains(urls, "https://www.benthos.dev/"), lit(false)) // .catch(false)
    val got = Transforms.filterProc(rows, deleteWhen)
      .select("content").as[String].collect().toSeq
    assert(got == Seq("""{"doc":{"should":"remain"},"id":"1"}"""))
  }

  test("resources some/other_mappings.yaml: labeled processor resources, whole and singly") {
    // reference: config/test/resources/{some,other}_mappings.yaml — the
    // same labeled resources under two configs; resource reuse = named
    // Column functions
    def prefix(p: String)(c: Column): Column = concat(lit(p + " "), c)
    def upperM(c: Column): Column = Blob.uppercase(c)
    def run(f: Column => Column): String =
      Seq("example content").toDF("content").select(f(col("content"))).as[String].head()
    assert(run(c => upperM(prefix("foo")(c))) == "FOO EXAMPLE CONTENT")
    assert(run(prefix("foo")) == "foo example content")
    assert(run(upperM) == "EXAMPLE CONTENT")
    assert(run(c => upperM(prefix("bar")(c))) == "BAR EXAMPLE CONTENT")
    assert(run(prefix("bar")) == "bar example content")
  }

  test("unit_test_example.yaml: format of uppercased content, metadata preserved") {
    // reference: config/test/unit_test_example.yaml + _benthos_test.yaml
    val df = Seq(("example content", Map("example_key" -> "example metadata value")))
      .toDF("content", "meta")
    val got = df.select(
      format_string("%send", Blob.uppercase(col("content"))).as("content"),
      col("meta"))
    val (content, meta) = got.as[(String, Map[String, String])].head()
    assert(content == "EXAMPLE CONTENTend")
    assert(meta == Map("example_key" -> "example metadata value"))
  }

  test("awk.yaml: goawk json/metadata functions end-to-end (awk_benthos_test.yaml)") {
    // reference: config/test/awk.yaml + awk_benthos_test.yaml — codec text,
    // program json_set_int("result", json_get("result") + metadata_get("foo")
    // + metadata_get("bar")) over content {"result":10} with foo=5, bar=7.
    // The goawk custom functions run through the AwkFuncs POSIX-awk
    // emulation; output is the Go-marshal-shaped mutated JSON.
    val df = Seq(("""{"result":10}""", Map("foo" -> "5", "bar" -> "7")))
      .toDF("text", "meta")
    val out = graft.ops.Awk.proc(df,
      """{
        |  json_set_int("result", json_get("result") + metadata_get("foo") + metadata_get("bar"));
        |}""".stripMargin,
      codec = "text", metaCol = Some("meta"))
    val (content, meta) = out.select(col("text"), col("meta"))
      .as[(String, Map[String, String])].head()
    assert(content == """{"result":22}""")
    assert(meta == Map("foo" -> "5", "bar" -> "7")) // metadata_equals
  }

  test("mock_http_proc.yaml: mock by label replaces the http processor") {
    // reference: config/test/mock_http_proc.yaml test 1 — the `mocks:` map
    // replaces the labeled `get_foobar_api` http processor with a mapping
    // before the pipeline runs; the real endpoint is never contacted.
    val got = mockHttpTopology(labeled = true)
      .withMocks(Map("get_foobar_api" -> ((df: DataFrame) =>
        df.withColumn("content", concat(col("content"), lit(" this is some mock content"))))))
      .build(spark).select("content").as[String].head()
    assert(got == "SIMON SAYS: HELLO WORLD THIS IS SOME MOCK CONTENT")
  }

  test("mock_http_proc_path.yaml: mock by /pipeline/processors/<i> pointer") {
    // reference: config/test/mock_http_proc_path.yaml test 1 — same pipeline
    // with no label; the mock addresses processor index 1 by JSON pointer.
    val got = mockHttpTopology(labeled = false)
      .withMocks(Map("/pipeline/processors/1" -> ((df: DataFrame) =>
        df.withColumn("content", concat(col("content"), lit(" this is some mock content"))))))
      .build(spark).select("content").as[String].head()
    assert(got == "SIMON SAYS: HELLO WORLD THIS IS SOME MOCK CONTENT")
  }

  test("mock_http_proc.yaml: throwing mock sets error; appended /- processor exposes it") {
    // reference: config/test/mock_http_proc.yaml test 2 — the mock is
    // `root = throw("the processor failed")`: a failed mapping leaves the
    // part content UNCHANGED and sets the error flag (bloblang throw,
    // reference internal/bloblang/mapping/executor.go failed-assignment
    // path), downstream processors still apply (only try/catch gate on the
    // flag), and the `/pipeline/processors/-` mock APPENDS a processor
    // exposing {content, error} — expected error text copied verbatim.
    val errMsg = "failed assignment (line 1): the processor failed"
    val got = mockHttpTopology(labeled = true)
      .withMocks(Map(
        "get_foobar_api" -> ((df: DataFrame) =>
          ops.Errors.markError(df, lit(true), lit(errMsg))),
        "/pipeline/processors/-" -> ((df: DataFrame) =>
          df.select(col("content"), col(ops.Errors.ErrCol)))))
      .build(spark)
    val (content, err) = got.as[(String, String)].head()
    assert(content == "SIMON SAYS: HELLO WORLD") // json_equals .content
    assert(err == errMsg)                        // json_equals .error
  }

  test("mocks: unknown target is an error, not a vacuous pass") {
    // reference: internal/cli/test/case.go — an unmatched mock target fails
    // the test definition rather than silently running the real processor.
    val e = intercept[IllegalArgumentException] {
      mockHttpTopology(labeled = true).withMocks(Map("no_such_label" ->
        ((df: DataFrame) => df)))
    }
    assert(e.getMessage.contains("no_such_label"))
  }

  /** The mock_http pipeline: bloblang prefix → (labeled) http GET →
    * bloblang uppercase (reference: config/test/mock_http_proc{,_path}.yaml
    * pipeline block). The http stage is the REAL processor — tests replace
    * it via mocks exactly as the reference runner does.
    */
  private def mockHttpTopology(labeled: Boolean): graft.topo.Topology = {
    val http = (df: DataFrame) =>
      graft.sources.Http.enrich(df, "http://example.com/foobar", "content", "GET")
    val base = graft.topo.Topology(s => {
        import s.implicits._
        Seq("hello world").toDF("content")
      })
      .proc(df => df.withColumn("content", concat(lit("simon says: "), col("content"))))
    val withHttp =
      if (labeled) base.procLabeled("get_foobar_api", http) else base.proc(http)
    withHttp.proc(df => df.withColumn("content", upper(col("content"))))
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
