package graft.topo

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.blob.{Bloblang, Proto}

/** The reference's declarative config + unit-test lifecycle (`benthos -c` /
  * `benthos test`, SURVEY §3.1/§3.3): load a YAML config, resolve a
  * processor target by JSON pointer (internal/cli/test/case.go:66-93),
  * assemble the pipeline as DataFrame stages over a message frame, feed
  * the test's input batch, and judge the output with the reference's
  * check set (content_equals / json_equals / metadata_equals /
  * file_equals / bloblang predicate — internal/cli/test/condition.go).
  *
  * The message frame is the Part in columnar form:
  * (ord, text, bin, meta, error) — `ord` is the stable batch order (a
  * sortable fixed-width string that unarchive extends per derived part),
  * `bin` carries binary contents between protobuf stages, `error` is the
  * reference's error flag. Execution is genuinely Spark: every processor
  * is a DataFrame transform; try/catch split the frame on the flag
  * exactly like the reference routes failed messages.
  *
  * Supported processor set = what the reference's own config/test corpus
  * exercises: bloblang (the text engine), awk, protobuf, http, unarchive,
  * try, catch, label, noop. Mocks replace labeled or pointer-addressed
  * processors via Topology.withMocks.
  */
object ConfigRunner {
  private val yamlMapper = new ObjectMapper(new YAMLFactory())
  private val jsonMapper = new ObjectMapper()

  final case class TestResult(name: String, failures: Vector[String]) {
    def ok: Boolean = failures.isEmpty
  }

  def loadYaml(path: Path): JsonNode = yamlMapper.readTree(Files.readString(path))

  /** Run every test in a `tests:` file. For `X_benthos_test.yaml` the
    * config is the sibling `X.yaml` (the reference test runner's pairing
    * rule); files carrying both `tests:` and the config use themselves.
    */
  def runTests(spark: SparkSession, testsFile: String): Vector[TestResult] = {
    val testsPath = Paths.get(testsFile)
    val testsNode = loadYaml(testsPath)
    val cfgPath = {
      val n = testsPath.getFileName.toString
      if (n.endsWith("_benthos_test.yaml")) {
        val sibling = testsPath.resolveSibling(n.stripSuffix("_benthos_test.yaml") + ".yaml")
        if (Files.exists(sibling)) sibling else testsPath
      } else testsPath
    }
    val cfgNode = if (cfgPath == testsPath) testsNode else loadYaml(cfgPath)
    val tests = Option(testsNode.get("tests")).map(_.elements().asScala.toVector)
      .getOrElse(Vector.empty)
    tests.map(t => runCase(spark, t, cfgNode, testsPath.getParent))
  }

  private def runCase(
      spark: SparkSession,
      t: JsonNode,
      cfgNode: JsonNode,
      baseDir: Path): TestResult = {
    val name = t.path("name").asText("unnamed")
    val env: Map[String, String] = Option(t.get("environment"))
      .map(_.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)

    try {
      // resolve the processor list: target_mapping (a .blobl file) or
      // target_processors (JSON pointer, optionally cross-file via '#')
      val procNodes: Vector[JsonNode] =
        if (t.has("target_mapping")) {
          val p = baseDir.resolve(t.get("target_mapping").asText())
          val blobl = jsonMapper.createObjectNode()
          blobl.put("bloblang", Files.readString(p))
          Vector(blobl)
        } else {
          val target = t.path("target_processors").asText("/pipeline/processors")
          val (node, ptr) = target.split("#", 2) match {
            case Array(file, p) if p.nonEmpty && file.nonEmpty =>
              (loadYaml(baseDir.resolve(file)), p)
            case _ => (cfgNode, target)
          }
          val at = node.at(ptr)
          if (at.isMissingNode) throw new IllegalArgumentException(s"target not found: $target")
          if (at.isArray) at.elements().asScala.toVector else Vector(at)
        }

      // assemble the topology; mocks replace by label or pointer
      var topo = procNodes.foldLeft(Topology(input = _ => null)) { (tp, n) =>
        val label = Option(n.get("label")).map(_.asText())
        val stage = buildProc(spark, n, baseDir, env)
        label.map(tp.procLabeled(_, stage)).getOrElse(tp.proc(stage))
      }
      Option(t.get("mocks")).foreach { ms =>
        topo = topo.withMocks(ms.fields().asScala.map { e =>
          e.getKey -> buildProc(spark, e.getValue, baseDir, env)
        }.toMap)
      }

      // input batch → message frame
      val inputs: Vector[(String, String, Array[Byte], Map[String, String], String)] =
        t.path("input_batch").elements().asScala.toVector.zipWithIndex.map { case (m, i) =>
          val content =
            if (m.has("file_content")) Files.readString(baseDir.resolve(m.get("file_content").asText()))
            else m.path("content").asText("")
          val meta = Option(m.get("metadata"))
            .map(_.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty[String, String])
          (f"$i%06d", content, null: Array[Byte], meta, null: String)
        }
      import spark.implicits._
      val in = inputs.toDF("ord", "text", "bin", "meta", "error")

      val rows = topo.processors.foldLeft(in)((df, p) => p(df))
        .orderBy(col("ord"))
        .select("text", "meta", "error")
        .collect()
        .toVector

      val expected: Vector[JsonNode] = Option(t.get("output_batches"))
        .map(_.elements().asScala.flatMap(_.elements().asScala).toVector)
        .getOrElse(Vector.empty)

      val failures = Vector.newBuilder[String]
      if (rows.length != expected.length)
        failures += s"expected ${expected.length} messages, got ${rows.length}"
      else rows.zip(expected).zipWithIndex.foreach { case ((row, exp), i) =>
        val text = row.getString(0)
        val meta: Map[String, String] =
          Option(row.getJavaMap[String, String](1)).map(_.asScala.toMap).getOrElse(Map.empty)
        val err = row.getString(2)
        exp.fields().asScala.foreach { e =>
          (e.getKey, e.getValue) match {
            case ("content_equals", v) =>
              if (text != v.asText())
                failures += s"msg $i content_equals:\n  actual:   $text\n  expected: ${v.asText()}"
            case ("file_equals", v) =>
              val want = Files.readString(baseDir.resolve(v.asText()))
              if (text != want)
                failures += s"msg $i file_equals mismatch"
            case ("json_equals", v) =>
              val actual = try jsonMapper.readTree(text) catch { case _: Exception => null }
              if (actual != v)
                failures += s"msg $i json_equals:\n  actual:   $text\n  expected: $v"
            case ("metadata_equals", v) =>
              v.fields().asScala.foreach { me =>
                if (!meta.get(me.getKey).contains(me.getValue.asText()))
                  failures += s"msg $i metadata_equals ${me.getKey}: actual ${meta.get(me.getKey)}"
              }
            case ("bloblang", v) =>
              // predicate check: the mapping must resolve root to `true`
              // (QueryPart, executor.go:103-116); error()/errored() see the flag
              val r = Bloblang.compile(v.asText()).run(
                (if (text == null) "" else text).getBytes("UTF-8"),
                meta, env.get(_).orElse(None), Option(err))
              r.error.foreach(em => failures += s"msg $i bloblang check errored: $em")
              if (r.error.isEmpty && !r.text.contains("true"))
                failures += s"msg $i bloblang check false: ${v.asText()} (got ${r.text})"
            case (other, _) => failures += s"msg $i unsupported check '$other'"
          }
        }
      }
      TestResult(name, failures.result())
    } catch {
      case e: Exception => TestResult(name, Vector(s"runner error: ${e.getMessage}"))
    }
  }

  // ------------------------------------------------------- processors --
  /** One processor config node → a message-frame DataFrame stage. */
  def buildProc(
      spark: SparkSession,
      node: JsonNode,
      baseDir: Path,
      env: Map[String, String]): DataFrame => DataFrame = {
    val kinds = node.fieldNames().asScala.filterNot(_ == "label").toVector
    require(kinds.size == 1, s"processor node must have exactly one type, got $kinds")
    val kind = kinds.head
    val conf = node.get(kind)
    kind match {
      case "bloblang" | "mapping" =>
        Bloblang.procStage(conf.asText(), env, errCol = "error")
      case "noop" => identity
      case "awk" =>
        val program = conf.path("program").asText()
        val codec = conf.path("codec").asText("text")
        df => graft.ops.Awk.proc(df, program, codec, "text", Some("meta"))
      case "http" =>
        val url = conf.path("url").asText()
        val verb = conf.path("verb").asText("POST")
        df => graft.sources.Http.enrich(df, url, "text", verb)
      case "protobuf" =>
        val op = conf.path("operator").asText()
        val message = conf.path("message").asText()
        val fs = protoFileSet(conf, baseDir)
        op match {
          case "from_json" => protoStage(Proto.fromJsonErr(fs, message), toBin = true)
          case "to_json" => protoStage(Proto.toJsonErr(fs, message), toBin = false)
          case other => throw new IllegalArgumentException(s"protobuf operator: $other")
        }
      case "unarchive" =>
        conf.path("format").asText() match {
          case "json_array" => unarchiveJsonArrayStage
          case other => throw new IllegalArgumentException(s"unarchive format '$other' not wired here")
        }
      case "try" =>
        val children = conf.elements().asScala.toVector.map(buildProc(spark, _, baseDir, env))
        df => children.foldLeft(df)((d, c) => guarded(c, onErrored = false)(d))
      case "catch" =>
        val children = conf.elements().asScala.toVector.map(buildProc(spark, _, baseDir, env))
        df => {
          val r = children.foldLeft(df)((d, c) => guarded(c, onErrored = true)(d))
          // the reference clears the flag once the catch block completes
          r.withColumn("error", lit(null).cast("string"))
        }
      case other => throw new IllegalArgumentException(s"processor '$other' not supported by the runner")
    }
  }

  /** Route-by-flag application: the reference's try skips failed messages,
    * catch selects only them (processor.go error routing).
    */
  private[graft] def guarded(stage: DataFrame => DataFrame, onErrored: Boolean)(df: DataFrame): DataFrame = {
    // The input is referenced twice (routed branch ∪ untouched branch), so
    // folding this over a try/catch block's children would double the
    // logical plan per child — 2^k source copies at k processors.
    // localCheckpoint truncates each level to a leaf, keeping the plan
    // linear (eager, but the runner's test batches are a handful of rows).
    val in = df.localCheckpoint()
    val cond = if (onErrored) col("error").isNotNull else col("error").isNull
    val miss = if (onErrored) col("error").isNull else col("error").isNotNull
    stage(in.filter(cond)).unionByName(in.filter(miss))
  }

  private def protoFileSet(conf: JsonNode, baseDir: Path): Proto.FileSet = {
    val dirs = conf.path("import_paths").elements().asScala.map(_.asText()).toVector
    val sources = dirs.flatMap { d =>
      val local = baseDir.resolve(d)
      val dir =
        if (Files.isDirectory(local)) local
        else Paths.get("/root/reference").resolve(d) // reference-root-relative paths
      val listing = Files.list(dir)
      val paths =
        try listing.iterator().asScala.toVector
        finally listing.close() // Files.list holds an open DirectoryStream
      paths.filter(_.toString.endsWith(".proto"))
        .sortBy(_.toString)
        .map(Files.readString(_))
    }
    Proto.compile(sources)
  }

  /** protobuf stage: from_json consumes text → bin, to_json bin → text;
    * a failure keeps the content and sets the flag (the (value, err) pair
    * contract in Proto.fromJsonErr/toJsonErr).
    */
  private def protoStage(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      toBin: Boolean): DataFrame => DataFrame = { df =>
    val r = df.withColumn("__p", f(if (toBin) col("text") else col("bin")))
    val failed = col("__p._2").isNotNull
    // a failed conversion keeps the ORIGINAL content (reference contract);
    // success moves content between the text and bin carriers
    r.select(
      col("ord"),
      (if (toBin) when(failed, col("text")).otherwise(lit(null).cast("string"))
       else when(failed, col("text")).otherwise(col("__p._1").cast("string"))).as("text"),
      (if (toBin) when(failed, col("bin")).otherwise(col("__p._1").cast("binary"))
       else when(failed, col("bin")).otherwise(lit(null).cast("binary"))).as("bin"),
      col("meta"),
      coalesce(col("__p._2"), col("error")).as("error"))
  }

  /** unarchive(json_array) over the frame: each element becomes its own
    * message (raw slice, order-extending ord); a non-array payload keeps
    * the row and sets the flag (unarchive.go:223-240).
    */
  private val unarchiveJsonArrayStage: DataFrame => DataFrame = { df =>
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val parts = from_json(col("text"), ArrayType(StringType))
    val tagged = df.withColumn("__parts", parts)
    val good = tagged.filter(col("__parts").isNotNull)
      .select(col("ord"), col("bin"), col("meta"), col("error"),
        posexplode(col("__parts")).as(Seq("__pos", "__part")))
      .select(
        concat(col("ord"), lit("/"), lpad(col("__pos").cast("string"), 6, "0")).as("ord"),
        col("__part").as("text"), col("bin"), col("meta"), col("error"))
    val bad = tagged.filter(col("__parts").isNull)
      .withColumn("error",
        coalesce(col("error"), lit("failed to parse message into JSON array")))
      .drop("__parts")
    good.unionByName(bad.select("ord", "text", "bin", "meta", "error"))
  }
}
