package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.blob.Bloblang

/** The Bloblang TEXT engine against the reference's own declarative test
  * corpus, programs copied verbatim (inputs + expected outputs from the
  * cited YAML files; the engine itself is an original implementation —
  * see Bloblang.scala header). Where GoldenCorpusSpec runs hand-translated
  * Catalyst pipelines, this spec runs the actual `.blobl` source text.
  */
class BloblangSpec extends AnyFunSuite {
  private val M = new ObjectMapper()
  private def run(program: String, content: String,
      meta: Map[String, String] = Map.empty,
      env: Map[String, String] = Map.empty): Bloblang.Result =
    Bloblang.compile(program).run(content.getBytes("UTF-8"), meta, env.get)

  private def jsonEq(actual: String, expected: String): Unit =
    assert(M.readTree(actual) == M.readTree(expected), s"\nactual:   $actual\nexpected: $expected")

  // ---- config/test/bloblang/cities.blobl + cities_test.yaml -------------
  test("cities.blobl: filter -> map_each -> sort -> join") {
    val program =
      """root.Cities = this.locations.
        |                filter(loc -> loc.state == "WA").
        |                map_each(loc -> loc.name).
        |                sort().join(", ")""".stripMargin
    val in =
      """{"locations":[{"name":"Seattle","state":"WA"},{"name":"New York","state":"NY"},
        |{"name":"Bellevue","state":"WA"},{"name":"Olympia","state":"WA"}]}""".stripMargin
    jsonEq(run(program, in).text.get, """{"Cities": "Bellevue, Olympia, Seattle"}""")
  }

  // ---- csv_formatter.blobl + csv_formatter_test.yaml --------------------
  private val csvFormatter =
    """let header_row = this.0.keys().sort().join(",")
      |
      |root = $header_row + "\n" + this.map_each(element -> element.key_values().
      |  sort_by(item -> item.key).
      |  map_each(item -> item.value.string()).
      |  join(",")
      |).join("\n")""".stripMargin

  test("csv_formatter.blobl: consistent objects") {
    val in =
      """[{"foo":"hello world","baz":110,"bar":"bar value","buz":false},
        |{"foo":"hello world 2","bar":"bar value 2","baz":220,"buz":true},
        |{"foo":"hello world 3","bar":"bar value 3","baz":330,"buz":true}]""".stripMargin
    assert(run(csvFormatter, in).text.get ==
      """bar,baz,buz,foo
        |bar value,110,false,hello world
        |bar value 2,220,true,hello world 2
        |bar value 3,330,true,hello world 3""".stripMargin)
  }

  test("csv_formatter.blobl: empty input errors with the reference message") {
    val r = run(csvFormatter, "[]")
    assert(r.error.exists(_.contains("expected object value, got null from field `this.0`")))
    assert(r.text.get == "[]") // content unchanged on mapping failure
  }

  // ---- github_releases.blobl + github_releases_test.yaml ----------------
  test("github_releases.blobl: nested map_each -> filter -> flatten") {
    val program =
      """root = this.map_each(release -> release.assets.map_each(asset -> {
        |  "source":         "github",
        |  "dist":           asset.name.re_replace_all("^benthos-?((lambda_)|_)[0-9\\.]+(-rc[0-9]+)?_([^\\.]+).*", "$2$4"),
        |  "download_count": asset.download_count,
        |  "version":        release.tag_name.trim("v"),
        |}).filter(asset -> asset.dist != "checksums")).flatten()""".stripMargin
    val in =
      """[{"tag_name":"1.23.4","assets":[
        |  {"name":"benthos-lambda_1.23.4_linux_amd64.zip","download_count":123},
        |  {"name":"benthos_1.23.4_checksums.txt","download_count":456},
        |  {"name":"benthos_1.23.4_darwin_amd64.tar.gz","download_count":789},
        |  {"name":"benthos_1.23.4_linux_amd64.tar.gz","download_count":101112},
        |  {"name":"benthos_1.23.4_linux_arm64.tar.gz","download_count":131415}]}]""".stripMargin
    jsonEq(run(program, in).text.get,
      """[{"dist":"lambda_linux_amd64","download_count":123,"source":"github","version":"1.23.4"},
        |{"dist":"darwin_amd64","download_count":789,"source":"github","version":"1.23.4"},
        |{"dist":"linux_amd64","download_count":101112,"source":"github","version":"1.23.4"},
        |{"dist":"linux_arm64","download_count":131415,"source":"github","version":"1.23.4"}]""".stripMargin)
  }

  // ---- config/test/filters.yaml ------------------------------------------
  test("filters.yaml: conditional deleted() drops matching messages") {
    val program = """root = if content().contains("delete me") { deleted() }"""
    val ex = Bloblang.compile(program)
    assert(ex.mapText("hello world delete me please").content.isEmpty)
    assert(ex.mapText("hello world 2").text.get == "hello world 2")
  }

  // ---- config/test/bloblang/walk_json.yaml -------------------------------
  private val walkJson =
    """map unescape_values {
      |  root = match {
      |    this.type() == "object" => this.map_each(this.value.apply("unescape_values")),
      |    this.type() == "array" => this.map_each(this.apply("unescape_values")),
      |    this.type() == "string" => this.unescape_html(),
      |    this.type() == "bytes" => this.unescape_html(),
      |    _ => this,
      |  }
      |}
      |root = this.or(content()).apply("unescape_values")""".stripMargin

  test("walk_json.yaml: recursive string-leaf walk, all five cases") {
    val ex = Bloblang.compile(walkJson)
    assert(ex.mapText("foo &amp; bar").text.get == "foo & bar")
    assert(ex.mapText("""["foo &amp; bar",10,"1 &lt; 2"]""").text.get ==
      """["foo & bar",10,"1 < 2"]""")
    jsonEq(ex.mapText("""{"first":"foo &amp; bar","second":10,"third":"1 &lt; 2"}""").text.get,
      """{"first":"foo & bar","second":10,"third":"1 < 2"}""")
    jsonEq(ex.mapText("""{"first":{"nested":"foo &amp; bar"},"second":10,"third":"1 &lt; 2"}""").text.get,
      """{"first":{"nested":"foo & bar"},"second":10,"third":"1 < 2"}""")
    jsonEq(ex.mapText(
      """{"first":{"nested":"foo &amp; bar"},"second":10,"third":["1 &lt; 2",{"also_nested":"2 &gt; 1"}]}""").text.get,
      """{"first":{"nested":"foo & bar"},"second":10,"third":["1 < 2",{"also_nested":"2 > 1"}]}""")
  }

  // ---- config/test/bloblang/literals.yaml --------------------------------
  private val literals =
    """root = {
      |  "1": "1",
      |  "2": if env("FOO") == "ENABLED" {
      |    "foo"
      |  },
      |  "3": if this.count > 5 {
      |    this.count
      |  } else {
      |    deleted()
      |  },
      |  "4": [
      |    "1",
      |    if env("FOO") == "ENABLED" {
      |      "foo"
      |    },
      |    if this.count > 5 {
      |      this.count
      |    } else {
      |      deleted()
      |    },
      |    "4"
      |  ]
      |}""".stripMargin

  test("literals.yaml: conditional fields/elements omitted, both env settings") {
    val withFoo = Map("FOO" -> "ENABLED")
    assert(run(literals, """{"count":10}""", env = withFoo).text.get ==
      """{"1":"1","2":"foo","3":10,"4":["1","foo",10,"4"]}""")
    assert(run(literals, """{"count":3}""", env = withFoo).text.get ==
      """{"1":"1","2":"foo","4":["1","foo","4"]}""")
    val without = Map("FOO" -> "DISABLED")
    assert(run(literals, """{"count":10}""", env = without).text.get ==
      """{"1":"1","3":10,"4":["1",10,"4"]}""")
    assert(run(literals, """{"count":3}""", env = without).text.get ==
      """{"1":"1","4":["1","4"]}""")
  }

  // ---- config/test/bloblang/csv.yaml --------------------------------------
  private val csvSum =
    """root = content().string().split("\n").enumerated().map_each(match {
      |  index == 0 => deleted() # Drop the first line
      |  _ => match value.trim() {
      |    this.length() == 0 => deleted() # Drop empty lines
      |    _ => this.split(",")            # Split the remaining by comma
      |  }
      |}).map_each(
      |  # Then do something cool like sum each row
      |  this.map_each(this.trim().number(0)).sum()
      |)""".stripMargin

  test("csv.yaml: enumerated + nested match + number(default) + sum") {
    assert(run(csvSum, "cat1,cat2,cat3\n1,2,3\n7,11,23\n89,23,2\n").text.get == "[6,41,114]")
    assert(run(csvSum, "cat1, cat2,cat3\n\n1, 2,3\n7,11 ,23\n\n89 , 23 ,2\n").text.get ==
      "[6,41,114]")
  }

  // ---- config/test/bloblang/env.yaml ---------------------------------------
  test("env.yaml: env() resolves or nulls, all three cases") {
    val program = "foo_env = env(\"FOO\")\nbar_env = env(\"BAR\")"
    assert(run(program, "{}", env = Map("FOO" -> "fooval", "BAR" -> "barval")).text.get ==
      """{"bar_env":"barval","foo_env":"fooval"}""")
    assert(run(program, "{}", env = Map("FOO" -> "fooval")).text.get ==
      """{"bar_env":null,"foo_env":"fooval"}""")
    assert(run(program, "{}").text.get == """{"bar_env":null,"foo_env":null}""")
  }

  // ---- config/test/bloblang/fans.yaml ---------------------------------------
  test("fans.yaml: match-deleted() inside array map_each") {
    val program =
      """root = this
        |fans = fans.map_each(match {
        |  this.obsession > 0.5 => this
        |  _ => deleted()
        |})""".stripMargin
    val in =
      """{"id":"foo","fans":[{"name":"bev","obsession":0.57},{"name":"grace","obsession":0.21},
        |{"name":"ali","obsession":0.89},{"name":"vic","obsession":0.43}]}""".stripMargin
    assert(run(program, in).text.get ==
      """{"fans":[{"name":"bev","obsession":0.57},{"name":"ali","obsession":0.89}],"id":"foo"}""")
  }

  // ---- config/test/bloblang/boolean_operands.yaml ----------------------------
  test("boolean_operands.yaml: short-circuit &&/|| with catch, all four cases") {
    val program =
      """ands = (first && second).catch("failed")
        |ors = (first || second).catch("failed")""".stripMargin
    val ex = Bloblang.compile(program)
    assert(ex.mapText("""{"none":"of the target values"}""").text.get ==
      """{"ands":"failed","ors":"failed"}""")
    assert(ex.mapText("""{"first":true}""").text.get == """{"ands":"failed","ors":true}""")
    assert(ex.mapText("""{"first":false}""").text.get == """{"ands":false,"ors":"failed"}""")
    assert(ex.mapText("""{"first":true,"second":true}""").text.get ==
      """{"ands":true,"ors":true}""")
  }

  // ---- config/test/bloblang/message_expansion.yaml ---------------------------
  test("message_expansion.yaml: doc-root merge into items (mapping stage)") {
    val program =
      """let doc_root = this.without("items")
        |root = items.map_each($doc_root.merge(this))""".stripMargin
    val in =
      """{"id":"foobar","items":[{"content":"foo"},{"content":"bar"},{"content":"baz"}]}"""
    jsonEq(run(program, in).text.get,
      """[{"content":"foo","id":"foobar"},{"content":"bar","id":"foobar"},
        |{"content":"baz","id":"foobar"}]""".stripMargin)
  }

  // ---- config/test/cookbooks/filtering.yaml ----------------------------------
  test("filtering cookbook: match with no default passes unmatched through") {
    val program =
      """root = match {
        |  meta("topic").or("") == "foo" ||
        |  doc.type.or("") == "bar" ||
        |  doc.urls.contains("https://www.benthos.dev/").catch(false) => deleted()
        |}""".stripMargin
    val ex = Bloblang.compile(program)
    assert(ex.run("""{"doc":{"should":"remain"},"id":"1"}""".getBytes("UTF-8")).text.get ==
      """{"doc":{"should":"remain"},"id":"1"}""")
    assert(ex.run("""{"doc":{"should":"not remain"},"id":"2"}""".getBytes("UTF-8"),
      Map("topic" -> "foo")).content.isEmpty)
    assert(ex.run(
      """{"doc":{"should":"not remain","type":"bar"},"id":"3"}""".getBytes("UTF-8"))
      .content.isEmpty)
    assert(ex.run(
      """{"doc":{"should":"not remain","urls":["https://www.benthos.dev/"]},"id":"4"}"""
        .getBytes("UTF-8")).content.isEmpty)
  }

  // ---- config/test/resources/*.yaml + unit_test_example.yaml ------------------
  test("resource mappings and format(): prefix, uppercase, %v format") {
    assert(Bloblang.compile("""root = "foo " + content()""")
      .mapText("example content").text.get == "foo example content")
    assert(Bloblang.compile("root = content().uppercase()")
      .mapText("example content").text.get == "EXAMPLE CONTENT")
    // unit_test_example.yaml's processor line
    assert(Bloblang.compile("""root = "%vend".format(content().uppercase().string())""")
      .mapText("foo bar").text.get == "FOO BARend")
  }

  // ---- engine semantics beyond the corpus -------------------------------------
  test("pipe operator falls back on error or null") {
    assert(Bloblang.compile("""root = this.missing | "dflt"""")
      .mapText("""{"a":1}""").text.get == "dflt")
    assert(Bloblang.compile("""root = this.a | "dflt"""")
      .mapText("""{"a":1}""").text.get == "1")
  }

  test("match with literal cases compares equality; meta statements write metadata") {
    val p =
      """meta tag = match this.role { "user" => "U", "assistant" => "A", _ => "T" }
        |root = this""".stripMargin
    val r = Bloblang.compile(p).run("""{"role":"assistant"}""".getBytes("UTF-8"))
    assert(r.meta("tag") == "A")
  }

  test("path assignment vivifies objects; deleted() removes a path") {
    assert(Bloblang.compile("root.a.b = 1\nroot.a.c = 2\nroot.a.b = deleted()")
      .mapText("{}").text.get == """{"a":{"c":2}}""")
  }

  test("strict JSON: trailing garbage is not structured (Go json.Unmarshal parity)") {
    // Jackson's readTree would silently parse "1 &lt; 2" as 1
    val r = Bloblang.compile("root = this").mapText("1 &lt; 2")
    assert(r.error.exists(_.contains("unable to reference message as structured")))
  }

  test("unknown function or method is a compile-time error; batch fns are rejected") {
    intercept[Bloblang.BloblangError](Bloblang.compile("root = nope(1)"))
    intercept[Bloblang.BloblangError](Bloblang.compile("root = batch_index()"))
    // unknown METHODS surface at eval (dynamic dispatch like the reference's
    // runtime method resolution for unsupported targets)
    assert(Bloblang.compile("root = this.frobnicate()").mapText("{}")
      .error.exists(_.contains("unrecognised method")))
  }

  test("merge combines colliding non-objects into arrays (gabs shape)") {
    assert(Bloblang.compile("""root = {"a":1}.merge({"a":2,"b":3})""")
      .mapText("{}").text.get == """{"a":[1,2],"b":3}""")
  }

  test("range, sum, unique, slice, index behave") {
    assert(Bloblang.compile("root = range(0, 5).sum()").mapText("{}").text.get == "10")
    assert(Bloblang.compile("root = [3,1,3,2].unique().sort()").mapText("{}").text.get ==
      "[1,2,3]")
    assert(Bloblang.compile("root = [1,2,3,4].slice(1, 3)").mapText("{}").text.get == "[2,3]")
    assert(Bloblang.compile("root = [1,2,3].index(-1)").mapText("{}").text.get == "3")
  }

  // ---- per-message error contract hardening (round-3 review) ------------
  test("runtime exceptions inside a statement become the error flag, not a task failure") {
    // invalid regex compiles per-row: must flag the message, never escape the UDF
    val r = run("""root.x = this.s.re_match("[")""", """{"s":"a"}""")
    assert(r.error.exists(_.startsWith("failed assignment (line 1)")))
    assert(r.text.get == """{"s":"a"}""") // content unchanged
    // missing method argument
    assert(run("""root.x = "a".replace_all("x")""", "{}").error.isDefined)
    // empty-array reduce
    assert(run("root.x = [].min()", "{}").error.isDefined)
  }

  test("failed mapping keeps the ORIGINAL metadata — earlier meta writes do not leak") {
    val r = run("meta topic = \"x\"\nroot.y = this.n.number()",
      """{"n":"not a number"}""", meta = Map("keep" -> "1"))
    assert(r.error.isDefined)
    assert(r.meta == Map("keep" -> "1")) // no half-applied topic=x
  }

  test("meta = deleted() clears all metadata; meta = {obj} replaces it") {
    val cleared = run("meta = deleted()", "{}", meta = Map("a" -> "1", "b" -> "2"))
    assert(cleared.error.isEmpty && cleared.meta == Map.empty)
    val replaced = run("""meta = {"only":"this"}""", "{}", meta = Map("a" -> "1"))
    assert(replaced.error.isEmpty && replaced.meta == Map("only" -> "this"))
    val bad = run("meta = 5", "{}", meta = Map("a" -> "1"))
    assert(bad.error.exists(_.contains("setting root meta")))
    assert(bad.meta == Map("a" -> "1"))
  }

  test("naked identifiers are this-paths — a let does not shadow a field") {
    // variables require $: `let role` must not capture the naked field read
    val r = run("let role = \"admin\"\nroot.r = role\nroot.v = $role",
      """{"role":"user"}""")
    jsonEq(r.text.get, """{"r":"user","v":"admin"}""")
    // lambda params stay naked-resolvable
    jsonEq(run("root = this.xs.map_each(x -> x + 1)", """{"xs":[1,2]}""").text.get, "[2,3]")
  }

  test("non-finite floats error the mapping instead of emitting invalid JSON") {
    val r = run("root.x = 1.0 / 0", "{}")
    assert(r.error.exists(_.contains("unsupported value")))
    assert(r.text.get == "{}")
  }
}
