package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.sources.Tables

/** Oracle-checked queries for the join family (SURVEY.md §2.5): the
  * `sequence` input's sharded join with its three collision strategies and
  * two flush types, the hydration join, and a TPC-H-style 3-way join to
  * prove the relational path (broadcast dim + shuffled fact).
  */
object JoinQueries {
  private val T = Tables.TranscriptsCte

  /** Two per-conversation "inputs" with colliding value columns, mirroring
    * the sharded-join setup (reference: internal/impl/pure/
    * input_sequence.go:84-151 — N bounded inputs bucketed by id).
    */
  private def sides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = Tables.transcripts(s, dir)
    def side(role: String) = t.filter(col("role") === role)
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("sum_chars"))
    (side("user"), side("assistant"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full-outer sharded join, `replace` collision: later input wins
    // (reference: input_sequence.go:190-218 collision fns, :153 types).
    "q_sharded_join_replace" -> ((s, dir) => {
      val (u, a) = sides(s, dir)
      Joins.shardedJoin(u, a, Seq("conv_id"), Seq("n", "sum_chars"), Joins.Replace)
    }),

    // `keep` collision: earlier input wins.
    "q_sharded_join_keep" -> ((s, dir) => {
      val (u, a) = sides(s, dir)
      Joins.shardedJoin(u, a, Seq("conv_id"), Seq("n", "sum_chars"), Joins.Keep)
    }),

    // `array` collision: collect both values.
    "q_sharded_join_array" -> ((s, dir) => {
      val (u, a) = sides(s, dir)
      Joins.shardedJoin(u, a, Seq("conv_id"), Seq("n", "sum_chars"), Joins.Collect)
        .select(col("conv_id"),
          array_join(col("n"), ",").as("n"),
          array_join(col("sum_chars"), ",").as("sum_chars"))
    }),

    // `type: outter`: only keys touched by the LAST input flush
    // (reference: input_sequence.go:372-399).
    "q_sharded_join_outter" -> ((s, dir) => {
      val (u, a) = sides(s, dir)
      Joins.shardedJoinOutter(u, a, Seq("conv_id"), Seq("n", "sum_chars"), Joins.Replace)
    }),

    // hydration join: children carry the parent's payload (reference
    // cookbook: config/examples/joining_streams.yaml:23-56).
    "q_hydrate" -> ((s, dir) => {
      val children = Tables.lineitem(s, dir)
      val parents = Tables.orders(s, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Joins.hydrate(children, parents, Seq("l_orderkey"),
        Map("o_orderdate" -> "order_date", "o_totalprice" -> "order_total"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "order_date", "order_total")
    }),

    // the same hydration with the broadcast knob for dimension-sized
    // parents (VERDICT r1 §wrong-7): the fact side is never shuffled —
    // same oracle SQL, different physical plan (PlanShapeSpec pins the
    // BroadcastHashJoin).
    "q_hydrate_bcast" -> ((s, dir) => {
      val children = Tables.lineitem(s, dir)
      val parents = Tables.orders(s, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Joins.hydrate(children, parents, Seq("l_orderkey"),
        Map("o_orderdate" -> "order_date", "o_totalprice" -> "order_total"),
        broadcastParents = true)
        .select("l_orderkey", "l_linenumber", "l_quantity", "order_date", "order_total")
    }),

    // TPC-H Q3 shape: broadcast customer dim, shuffle join orders⋈lineitem,
    // aggregate, top-10 (not in the reference — free from Catalyst;
    // SURVEY.md §2.5 end note).
    "q3_shipping" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < "1998-01-01")
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > "1998-01-01")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }))

  private val sidesCte: String =
    T.stripSuffix("\n") +
      """, u AS (SELECT conv_id, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |        FROM transcripts WHERE role = 'user' GROUP BY 1),
        |  a AS (SELECT conv_id, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |        FROM transcripts WHERE role = 'assistant' GROUP BY 1)
        |""".stripMargin

  private lazy val hydrateSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  o_orderdate AS order_date, o_totalprice AS order_total
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sharded_join_replace" -> (sidesCte +
      """SELECT coalesce(u.conv_id, a.conv_id) AS conv_id,
        |  coalesce(a.n, u.n) AS n,
        |  coalesce(a.sum_chars, u.sum_chars) AS sum_chars
        |FROM u FULL OUTER JOIN a ON u.conv_id = a.conv_id""".stripMargin),
    "q_sharded_join_keep" -> (sidesCte +
      """SELECT coalesce(u.conv_id, a.conv_id) AS conv_id,
        |  coalesce(u.n, a.n) AS n,
        |  coalesce(u.sum_chars, a.sum_chars) AS sum_chars
        |FROM u FULL OUTER JOIN a ON u.conv_id = a.conv_id""".stripMargin),
    "q_sharded_join_array" -> (sidesCte +
      """SELECT coalesce(u.conv_id, a.conv_id) AS conv_id,
        |  array_to_string(list_filter([CAST(u.n AS VARCHAR), CAST(a.n AS VARCHAR)],
        |    x -> x IS NOT NULL), ',') AS n,
        |  array_to_string(list_filter([CAST(u.sum_chars AS VARCHAR), CAST(a.sum_chars AS VARCHAR)],
        |    x -> x IS NOT NULL), ',') AS sum_chars
        |FROM u FULL OUTER JOIN a ON u.conv_id = a.conv_id""".stripMargin),
    "q_sharded_join_outter" -> (sidesCte +
      """SELECT a.conv_id AS conv_id,
        |  coalesce(a.n, u.n) AS n,
        |  coalesce(a.sum_chars, u.sum_chars) AS sum_chars
        |FROM u RIGHT JOIN a ON u.conv_id = a.conv_id""".stripMargin),
    "q_hydrate" -> hydrateSql,
    "q_hydrate_bcast" -> hydrateSql, // same SQL by construction; plans differ
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  )
}
