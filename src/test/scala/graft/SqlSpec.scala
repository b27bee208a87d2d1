package graft

import java.util.UUID

import graft.ops.Errors
import graft.sources.Sql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL connector family over embedded Derby (the JDBC engine the Spark
  * distribution ships): sql_insert output → sql_select input round-trip,
  * partitioned parallel scan, sql_raw processor (args binding, json_array
  * result codec, exec_only, error contract). Reference semantics:
  * internal/impl/sql/{input_sql_select,output_sql_insert,processor_sql_raw}.go.
  */
class SqlSpec extends AnyFunSuite with SparkTestBase {

  private def freshDb(): String =
    s"jdbc:derby:memory:graft${UUID.randomUUID().toString.replace("-", "")};create=true"

  test("sql_insert output → sql_select input round-trip (columns + where + args)") {
    import spark.implicits._
    val dsn = freshDb()
    val df = Seq((1, "alice", 30), (2, "bob", 25), (3, "carol", 35))
      .toDF("id", "name", "age")
    Sql.createAndInsert(df, dsn, "people", "name VARCHAR(64)")

    val all = Sql.select(spark, dsn, "people", Seq("id", "name", "age"))
    assert(all.count() === 3)
    // where with ? args (input_sql_select.go args_mapping)
    val adults = Sql.select(spark, dsn, "people", Seq("name"),
      """"age" > ? AND "name" <> ?""", Seq(26, "nobody"))
    assert(adults.as[String].collect().sorted === Array("alice", "carol"))
  }

  test("partitioned sql_select: ranges are disjoint, union is complete, scan is parallel") {
    import spark.implicits._
    val dsn = freshDb()
    val df = (1 to 100).map(i => (i, s"row$i")).toDF("id", "val")
    Sql.createAndInsert(df, dsn, "wide")

    val part = Sql.selectPartitioned(spark, dsn, "wide", Seq("id", "val"),
      partitionCol = "id", lower = 1, upper = 101, numPartitions = 8)
    assert(part.rdd.getNumPartitions === 8)
    assert(part.count() === 100)
    assert(part.agg(sum("id")).as[Long].head === 5050L)
  }

  test("sql_raw processor: per-row args, json_array result codec") {
    import spark.implicits._
    val dsn = freshDb()
    Sql.createAndInsert(
      Seq((1, "red"), (2, "blue"), (3, "green")).toDF("id", "color"), dsn, "colors",
      "color VARCHAR(16)")

    val in = Seq(1, 3).toDF("want")
    val out = Sql.raw(in, dsn,
      """SELECT "id", "color" FROM colors WHERE "id" = ?""", Seq("want"))
      .select("want", "sql_result", Errors.ErrCol)
      .as[(Int, String, String)].collect().sortBy(_._1)
    assert(out(0) === ((1, """[{"id":1,"color":"red"}]""", null)))
    assert(out(1) === ((3, """[{"id":3,"color":"green"}]""", null)))
  }

  test("sql_raw exec_only: row passes through unchanged, effects land") {
    import spark.implicits._
    val dsn = freshDb()
    Sql.exec(dsn, "CREATE TABLE sink (v INT)")
    val in = Seq(10, 20, 30).toDF("v").repartition(2)
    val out = Sql.raw(in, dsn, "INSERT INTO sink VALUES (?)", Seq("v"), execOnly = true)
    assert(out.columns.toSet === Set("v", Errors.ErrCol))
    assert(out.filter(col(Errors.ErrCol).isNull).count() === 3)
    val sunk = Sql.select(spark, dsn, "sink", Seq("V")) // unquoted DDL folded to V
    assert(sunk.as[Int].collect().sorted === Array(10, 20, 30))
  }

  test("sql_raw error contract: failure marks the error column, content kept") {
    import spark.implicits._
    val dsn = freshDb()
    val in = Seq("x").toDF("content")
    val out = Sql.raw(in, dsn, "SELECT * FROM no_such_table", Nil)
      .select("content", Errors.ErrCol).as[(String, String)].head()
    assert(out._1 === "x") // content unchanged (processor_sql_raw.go:21)
    assert(out._2 != null && out._2.startsWith("sql query failed:"))
  }
}
