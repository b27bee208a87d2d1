package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.blob.JsonQuery
import graft.ops.Transforms

/** Ports the reference's jmespath / jq / while processor tests:
  * `internal/old/processor/jmespath_test.go`, `jq_test.go`,
  * `while_test.go`. String expectations that depend on Go's
  * sorted-key map serialisation are compared as parsed trees
  * (Jackson preserves insertion order instead).
  */
class JsonQuerySpec extends SparkTestBase {

  private val mapper = new ObjectMapper
  private def run(query: String, doc: String): String =
    JsonQuery.evalToJsonString(JsonQuery.compile(query), doc)
  private def runJq(query: String, doc: String): String =
    JsonQuery.evalToJsonString(JsonQuery.jqCompile(query), doc)
  private def assertTreeEq(exp: String, act: String): Unit =
    assert(mapper.readTree(act) == mapper.readTree(exp), s"act=$act exp=$exp")

  // ---- jmespath_test.go TestJMESPathAllParts / TestJMESPath ----

  test("jmespath: foo.bar over parts (jmespath_test.go:15-44)") {
    for (i <- 0 until 3)
      assert(run("foo.bar", s"""{"foo":{"bar":$i}}""") == i.toString)
  }

  test("jmespath: select shapes (jmespath_test.go TestJMESPath table)") {
    assert(run("foo.bar", """{"foo":{"bar":{"baz":1}}}""") == """{"baz":1}""")
    assert(run("foo.bar", """{"foo":{"bar":["baz","qux"]}}""") == """["baz","qux"]""")
    assert(run("foo.bar", """{"foo":{"bar":"{\"baz\":1}"}}""") == """"{\"baz\":1}"""")
    assert(run("foo.bar", """{"foo":{"bar":"hello world"}}""") == """"hello world"""")
    assert(run("foo.bar", """{"foo":{"bar":0.123}}""") == "0.123")
    assert(run("foo.bar", """{"foo":{"bar":123}}""") == "123")
    assert(run("foo.bar", """{"foo":{"bar":true}}""") == "true")
    assert(run("baz.qux", """{"foo":{"bar":true}}""") == null) // null result
    assert(run("foo.bar", """{"foo":{"bar":""}}""") == "\"\"")
  }

  test("jmespath: bad json passthrough → null (jmespath_test.go:46-69)") {
    assert(run("foo.bar", "this is bad json") == null)
    assert(run("foo.bar", null) == null)
  }

  test("jmespath: merge mutation (jmespath_test.go:71-100)") {
    val act = run("{foo: merge(foo, {bar:'baz'})}",
      """{"foo":{"original":{"content":"is this"}}}""")
    assertTreeEq("""{"foo":{"bar":"baz","original":{"content":"is this"}}}""", act)
  }

  test("jmespath: doc example — filter, sort, join (jmespath.go:44-68)") {
    val doc =
      """{"locations":[{"name":"Seattle","state":"WA"},{"name":"New York","state":"NY"},
        |{"name":"Bellevue","state":"WA"},{"name":"Olympia","state":"WA"}]}""".stripMargin
    val act = run("locations[?state == 'WA'].name | sort(@) | {Cities: join(', ', @)}", doc)
    assert(act == """{"Cities":"Bellevue, Olympia, Seattle"}""")
  }

  // ---- subset coverage beyond the ported tests ----

  test("jmespath: indexes, slices, flatten, wildcards") {
    val doc = """{"a":[10,20,30,40],"o":{"x":{"v":1},"y":{"v":2}},"n":[[1,2],[3],4]}"""
    assert(run("a[0]", doc) == "10")
    assert(run("a[-1]", doc) == "40")
    assert(run("a[9]", doc) == null)
    assert(run("a[1:3]", doc) == "[20,30]")
    assert(run("a[::2]", doc) == "[10,30]")
    assert(run("a[::-1]", doc) == "[40,30,20,10]")
    assert(run("n[]", doc) == "[1,2,3,4]")
    assert(run("o.*.v", doc) == "[1,2]")
    assert(run("a[*]", doc) == "[10,20,30,40]")
  }

  test("jmespath: projections map dotted chains per element") {
    val doc = """{"xs":[{"a":{"b":1}},{"a":{"b":2}},{"c":3}]}"""
    assert(run("xs[*].a.b", doc) == "[1,2]") // null results dropped
  }

  test("jmespath: filters with comparators and boolean logic") {
    val doc = """{"xs":[{"v":1,"t":"a"},{"v":5,"t":"b"},{"v":9,"t":"a"}]}"""
    assert(run("xs[?v > `4`].t", doc) == """["b","a"]""")
    assert(run("xs[?v >= `5` && t == 'a'].v", doc) == "[9]")
    assert(run("xs[?t == 'a' || v == `5`] | length(@)", doc) == "3")
    assert(run("xs[?!(t == 'a')].v", doc) == "[5]")
  }

  test("jmespath: multi-select list and hash") {
    val doc = """{"a":1,"b":"two","c":[3]}"""
    assert(run("[a, b]", doc) == """[1,"two"]""")
    assertTreeEq("""{"x":1,"y":"two"}""", run("{x: a, y: b}", doc))
  }

  test("jmespath: function library") {
    val doc = """{"s":"hello","xs":[3,1,2],"ws":["bb","a","ccc"],"o":{"k1":1,"k2":2}}"""
    assert(run("length(s)", doc) == "5")
    assert(run("length(xs)", doc) == "3")
    assert(run("sort(xs)", doc) == "[1,2,3]")
    assert(run("sort_by(ws, &length(@))", doc) == """["a","bb","ccc"]""")
    assert(run("max_by(ws, &length(@))", doc) == "\"ccc\"")
    assert(run("min_by(ws, &length(@))", doc) == "\"a\"")
    assert(run("sum(xs)", doc) == "6")
    assert(run("avg(xs)", doc) == "2")
    assert(run("min(xs)", doc) == "1")
    assert(run("max(xs)", doc) == "3")
    assert(run("keys(o)", doc) == """["k1","k2"]""")
    assert(run("values(o)", doc) == "[1,2]")
    assert(run("contains(s, 'ell')", doc) == "true")
    assert(run("contains(xs, `2`)", doc) == "true")
    assert(run("starts_with(s, 'he')", doc) == "true")
    assert(run("ends_with(s, 'lo')", doc) == "true")
    assert(run("to_number('42')", doc) == "42")
    assert(run("to_string(xs)", doc) == "\"[3,1,2]\"")
    assert(run("not_null(missing, s)", doc) == "\"hello\"")
    assert(run("reverse(xs)", doc) == "[2,1,3]")
    assert(run("abs(`-3`)", doc) == "3")
    assert(run("ceil(`1.2`)", doc) == "2")
    assert(run("floor(`1.8`)", doc) == "1")
    assert(run("type(s)", doc) == "\"string\"")
    assert(run("map(&length(@), ws)", doc) == "[2,1,3]")
    assert(run("join('-', ws)", doc) == "\"bb-a-ccc\"")
  }

  test("jmespath: pipe stops projection") {
    val doc = """{"xs":[[1,2],[3,4]]}"""
    assert(run("xs[*] | [0]", doc) == "[1,2]")   // first of outer
    assert(run("xs[*][0]", doc) == "[1,3]")      // first of each (projection)
  }

  // ---- jq_test.go ----

  test("jq: select shapes (jq_test.go TestJQ table)") {
    assert(runJq(".foo.bar", """{"foo":{"bar":{"baz":1}}}""") == """{"baz":1}""")
    assert(runJq(".foo.bar", """{"foo":{"bar":["baz","qux"]}}""") == """["baz","qux"]""")
    assert(runJq(".foo.bar", """{"foo":{"bar":"hello world"}}""") == """"hello world"""")
    assert(runJq(".foo.bar", """{"foo":{"bar":0.123}}""") == "0.123")
    assert(runJq(".foo.bar", """{"foo":{"bar":123}}""") == "123")
    assert(runJq(".foo.bar", """{"foo":{"bar":true}}""") == "true")
    assert(runJq(".baz.qux", """{"foo":{"bar":true}}""") == null)
    assert(runJq(".foo.bar", """{"foo":{"bar":""}}""") == "\"\"")
  }

  test("jq: object construction + path assignment (jq_test.go:58)") {
    val act = runJq("""{foo: .foo} | .foo.bar = "baz"""",
      """{"foo":{"original":{"content":"is this"}},"drop":1}""")
    assertTreeEq("""{"foo":{"bar":"baz","original":{"content":"is this"}}}""", act)
  }

  test("jq: convert to csv (jq_test.go:144 `[.ts,.id,.msg] | @csv`)") {
    val plain = "1641393111,\"1054fe28\",\"sample \"\"log\"\"\""
    val act = runJq("[.ts,.id,.msg] | @csv",
      """{"id":"1054fe28","msg":"sample \"log\"","ts":1641393111}""")
    assert(act == mapper.writeValueAsString(plain))
  }

  test("jq: iterate-all and index paths") {
    val doc = """{"xs":[{"v":1},{"v":2}]}"""
    assert(runJq(".xs[].v", doc) == "[1,2]")
    assert(runJq(".xs[0].v", doc) == "1")
    assert(runJq(".xs[-1].v", doc) == "2")
  }

  test("jmespath: mixed-type ordering keys are invalid-type → null (spec)") {
    val doc = """{"xs":[{"n":1},{"m":2}],"mixed":[1,"a"]}"""
    assert(run("sort(mixed)", doc) == null)
    assert(run("max_by(xs, &n)", doc) == null) // one key resolves to null
    assert(run("sum(mixed)", doc) == null)
    assert(run("join('-', mixed)", doc) == null)
  }

  test("jmespath: unknown function / bad arity fails at compile, not per row") {
    intercept[IllegalArgumentException](JsonQuery.compile("lenght(@)"))
    intercept[IllegalArgumentException](JsonQuery.compile("length(@, @)"))
    intercept[IllegalArgumentException](JsonQuery.jqCompile(". | nope(.)"))
  }

  test("jq: string ending in escaped backslash doesn't break the stage split") {
    val act = runJq(""".msg = "C:\\" | .seen = true""", """{"x":1}""")
    assertTreeEq("""{"x":1,"msg":"C:\\","seen":true}""", act)
  }

  // ---- while_test.go ----

  private def batchOf(contents: String*) = {
    import spark.implicits._
    contents.toSeq.toDF("content")
  }
  private def contents(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("content").collect().map(_.getString(0)).toSeq

  test("while: content check loops until batch size > 3 (while_test.go:53-85)") {
    // check `batch_size() <= 3`, child insert_part "foo" at index 0
    val out = Transforms.whileLoop(
      batchOf("bar"),
      count(lit(1)).over(Window.partitionBy()) <= 3,
      d => batchOf("foo").union(d))
    assert(contents(out).sorted == Seq("bar", "foo", "foo", "foo"))
  }

  test("while: at_least_once runs children before first check (while_test.go:87-121)") {
    val out = Transforms.whileLoop(
      batchOf("bar"),
      lit(false),
      d => batchOf("foo").union(d),
      atLeastOnce = true)
    assert(contents(out).sorted == Seq("bar", "foo"))
  }

  test("while: max_loops caps iterations (while_test.go TestWhileMaxLoops)") {
    val out = Transforms.whileLoop(
      batchOf("bar"),
      lit(true),
      d => batchOf("foo").union(d),
      maxLoops = 2)
    assert(contents(out).sorted == Seq("bar", "foo", "foo"))
  }

  test("while: empty batch exits the loop (while.go:169-171)") {
    val out = Transforms.whileLoop(
      batchOf("a", "b"),
      lit(true),
      d => d.filter(col("content") === "never"),
      maxLoops = 100)
    assert(out.isEmpty)
  }

  test("while: long loops truncate lineage via localCheckpoint and stay correct") {
    import spark.implicits._
    // 20 decrement iterations with checkpointEvery=4: the checkpoint arm
    // runs 5 times and the result still reaches the fixpoint
    val out = Transforms.whileLoop(
      Seq(20, 3).toDF("v"),
      col("v") > 0,
      d => d.withColumn("v", greatest(col("v") - 1, lit(0))),
      maxLoops = 64,
      checkpointEvery = 4)
    assert(out.select("v").as[Int].collect().toSeq == Seq(0, 0))
  }

  test("while: fixpoint halving matches closed form") {
    import spark.implicits._
    val df = Seq(("d1", "x" * 553), ("d2", "y" * 64), ("d3", "z" * 65)).toDF("id", "text")
    val out = Transforms.whileLoop(df,
      length(col("text")) > 64,
      d => d.withColumn("text",
        when(length(col("text")) > 64,
          col("text").substr(lit(1), ceil(length(col("text")) / 2).cast("int")))
          .otherwise(col("text"))),
      maxLoops = 32)
    val lens = out.select(col("id"), length(col("text"))).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // 553 → 277 → 139 → 70 → 35; 65 → 33; 64 stays
    assert(lens == Map("d1" -> 35, "d2" -> 64, "d3" -> 33))
  }

  // ---- Column-level end-to-end ----

  test("jmespath/jq as Columns over a DataFrame") {
    import spark.implicits._
    val df = Seq(
      """{"locations":[{"name":"Olympia","state":"WA"},{"name":"Reno","state":"NV"}]}""",
      """not json at all""").toDF("doc")
    val out = df.select(
      JsonQuery.jmespath(col("doc"), "locations[?state == 'WA'].name | [0]").as("wa"),
      JsonQuery.jq(col("doc"), ".locations[0].name").as("first")).collect()
    assert(out(0) == Row("\"Olympia\"", "\"Olympia\""))
    assert(out(1) == Row(null, null)) // error → null, caller sets the flag
  }
}
