package graft

import graft.topo.ConfigRunner

/** `benthos test` over the reference's OWN config/test corpus, loaded from
  * disk and executed by ConfigRunner — config YAML → processor pipeline →
  * input batches → reference check set. Where GoldenCorpusSpec inlines
  * fixtures and BloblangSpec inlines program text, this spec runs the
  * actual files end-to-end: YAML loading, JSON-pointer targets (incl.
  * cross-file '#'), target_mapping .blobl files, per-test environments,
  * mocks, file_content/file_equals fixtures, and the bloblang predicate
  * checks — internal/cli/test/case.go semantics.
  */
class ConfigCorpusSpec extends SparkTestBase {

  private val Root = "/root/reference/config/test"

  private def runAll(file: String): Unit = {
    val path = java.nio.file.Paths.get(Root, file)
    assume(java.nio.file.Files.exists(path), s"reference corpus not present: $path")
    val results = ConfigRunner.runTests(spark, path.toString)
    assert(results.nonEmpty, s"$file: no tests found")
    val bad = results.filterNot(_.ok)
    assert(bad.isEmpty, bad.map(r => s"${r.name}:\n  ${r.failures.mkString("\n  ")}")
      .mkString(s"\n$file failures:\n", "\n", ""))
  }

  test("filters.yaml: inline tests, conditional deletes")(runAll("filters.yaml"))

  test("bloblang/walk_json.yaml: recursive map apply, 5 cases")(
    runAll("bloblang/walk_json.yaml"))

  test("bloblang/literals.yaml: env-conditional literals")(
    runAll("bloblang/literals.yaml"))

  test("bloblang/csv.yaml: enumerated/match/sum pipeline")(
    runAll("bloblang/csv.yaml"))

  test("bloblang/env.yaml: env() across three environments")(
    runAll("bloblang/env.yaml"))

  test("bloblang/fans.yaml: match-deleted in arrays")(runAll("bloblang/fans.yaml"))

  test("bloblang/boolean_operands.yaml: short-circuit + catch")(
    runAll("bloblang/boolean_operands.yaml"))

  test("bloblang/also_tests_boolean_operands.yaml: cross-file '#' target")(
    runAll("bloblang/also_tests_boolean_operands.yaml"))

  test("bloblang/message_expansion.yaml: mapping + unarchive(json_array)")(
    runAll("bloblang/message_expansion.yaml"))

  test("bloblang/cities_test.yaml: target_mapping .blobl file")(
    runAll("bloblang/cities_test.yaml"))

  test("bloblang/csv_formatter_test.yaml: .blobl file + bloblang error() check")(
    runAll("bloblang/csv_formatter_test.yaml"))

  test("bloblang/github_releases_test.yaml: .blobl file, json_equals")(
    runAll("bloblang/github_releases_test.yaml"))

  test("awk_benthos_test.yaml: sibling-config pairing, awk + metadata_equals")(
    runAll("awk_benthos_test.yaml"))

  test("mock_http_proc.yaml: label mocks + error() exposure via appended mock")(
    runAll("mock_http_proc.yaml"))

  test("mock_http_proc_path.yaml: pointer-addressed mocks")(
    runAll("mock_http_proc_path.yaml"))

  test("protobuf/people.yaml: try/catch protobuf bridge, exact error text")(
    runAll("protobuf/people.yaml"))

  test("protobuf/house.yaml: nested message bridge with pipe fallback")(
    runAll("protobuf/house.yaml"))

  test("resources/some_mappings.yaml: /processor_resources targets, whole + single")(
    runAll("resources/some_mappings.yaml"))

  test("resources/other_mappings_benthos_test.yaml: sibling resources config")(
    runAll("resources/other_mappings_benthos_test.yaml"))

  test("unit_test_example_benthos_test.yaml: metadata preservation + format")(
    runAll("unit_test_example_benthos_test.yaml"))

  test("files_for_content.yaml: file_content input, file_equals check")(
    runAll("files_for_content.yaml"))

  test("cookbooks/filtering_benthos_test.yaml: meta/doc/urls filter")(
    runAll("cookbooks/filtering_benthos_test.yaml"))

  test("guarded try/catch routing keeps the plan linear in child count") {
    // each guarded wrap references its input twice (routed ∪ untouched);
    // without plan truncation a 12-child try block is 2^12 source copies
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Seq((1, null: String), (100, "boom")).toDF("v", "error")
    val out = (1 to 12).foldLeft(base)((d, _) =>
      ConfigRunner.guarded(df => df.withColumn("v", col("v") + 1), onErrored = false)(d))
    val plan = out.queryExecution.optimizedPlan.numberedTreeString
    assert(plan.linesIterator.size < 100, s"plan blew up (${plan.linesIterator.size} lines)")
    val rows = out.collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(rows == Set((13, None), (100, Some("boom")))) // errored row untouched
  }
}
