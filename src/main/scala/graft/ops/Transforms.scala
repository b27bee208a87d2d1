package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-row processors (SURVEY.md §2.4): the reference's `bloblang` /
  * `branch` / `workflow` processors as declarative column operations.
  *
  * A Benthos mapping is an ordered list of `root.x = <query>` statements
  * executed per message (reference: internal/bloblang/mapping/
  * executor.go:126-228). Here a "mapping" is a list of named Column
  * expressions applied in order; Catalyst folds the whole list into one
  * codegen stage, so N statements cost the same as one projection.
  */
object Transforms {

  /** bloblang processor (internal/old/processor/bloblang.go:130-181):
    * ordered assignments. Later assignments may reference earlier ones
    * (they see the updated row, like Bloblang statement order).
    */
  def mapProc(df: DataFrame, assignments: (String, Column)*): DataFrame =
    assignments.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }

  /** `root = deleted()` filtering (functions.go:277): drop rows where the
    * delete predicate holds.
    */
  def filterProc(df: DataFrame, deleteWhen: Column): DataFrame =
    df.filter(!coalesce(deleteWhen, lit(false)))

  /** branch processor (internal/old/processor/branch.go:191-194,327-480):
    * request_map → child transform → result_map overlaid onto the original
    * row. In columnar form the "child pipeline" is a Column built from the
    * request columns; the overlay is a withColumn — the original row is
    * never lost, matching the reference's enrichment contract.
    */
  def branch(df: DataFrame, resultField: String, child: DataFrame => Column): DataFrame =
    df.withColumn(resultField, child(df))

  /** branch with a lookup child: the reference's enrichment-join shape
    * (SURVEY.md §2.5, cookbook joining_streams.yaml). `dim` is expected
    * small → broadcast, no shuffle of the fact side.
    */
  def enrich(df: DataFrame, dim: DataFrame, key: Seq[String], how: String = "left"): DataFrame =
    df.join(broadcast(dim), key, how)

  /** workflow processor (internal/old/processor/workflow.go:48-116): a DAG
    * of named branches executed in dependency order. The reference infers
    * order from mapping read/write targets; Catalyst resolves column
    * dependencies natively, so tiers are just sequential withColumns —
    * cycles fail analysis exactly like the reference rejects them.
    */
  def workflow(df: DataFrame, tiers: Seq[Seq[(String, DataFrame => Column)]]): DataFrame =
    tiers.foldLeft(df) { (d, tier) =>
      d.withColumns(tier.map { case (n, f) => n -> f(d) }.toMap)
    }

  /** A workflow branch with declared read/write targets — the columnar
    * mapping of the reference's `TargetsUsed`/`TargetsProvided` dependency
    * declaration (internal/old/processor/branch.go:271-318).
    *
    * `writes` is the column the branch provides; `reads` the columns its
    * request map consumes. A branch depends on every branch whose write it
    * reads; reads of pre-existing input columns impose no ordering.
    */
  final case class Branch(name: String, reads: Set[String], writes: String,
      f: DataFrame => Column)

  /** Automatic DAG resolution (the workflow feature's point — reference
    * `resolveDynamicBranchDAG`, workflow_branch_map.go:273-302): layer the
    * branches into tiers by Kahn's algorithm over the read→write edges,
    * then execute via `workflow`. Branches in one tier are independent and
    * fuse into a single projection.
    *
    * Throws IllegalArgumentException naming the unresolvable branches on a
    * circular dependency, mirroring the reference's "failed to
    * automatically resolve DAG, circular dependencies detected for
    * branches: %v" (workflow_branch_map.go:302), and on duplicate write
    * targets (two branches providing one column has no defined order).
    */
  def workflowAuto(df: DataFrame, branches: Seq[Branch]): DataFrame =
    workflow(df, resolveDag(branches).map(_.map(b => b.writes -> b.f)))

  /** `while` processor (internal/old/processor/while.go:147-186): run the
    * child processors over the batch for as long as the check query holds,
    * with `at_least_once` (do-while) and `max_loops` caps, exiting early
    * when the batch empties.
    *
    * The distributed reading of "batch" is the whole DataFrame: the loop
    * is inherently driver-side in the reference too (its `ProcessBatch`
    * re-runs children until `checkMsg` flips), so each iteration here is
    * one action to evaluate the check plus a deferred transformation. Rows
    * NOT matching `check` still flow through `step` unchanged-or-not as
    * the step decides — exactly like reference children see the whole
    * batch — and per-group while loops precompute a group-level check
    * column with a window function. Lineage is truncated every
    * `checkpointEvery` iterations so long loops don't accumulate an
    * unbounded plan (the scale concern: each iteration is a full pass, so
    * loop counts must stay O(log n) — e.g. halving loops — never O(rows)).
    */
  def whileLoop(
      df: DataFrame,
      check: Column,
      step: DataFrame => DataFrame,
      maxLoops: Int = 0,
      atLeastOnce: Boolean = false,
      checkpointEvery: Int = 8): DataFrame = {
    var cur = df
    var loops = 0
    // project-then-filter so the check may be a window expression
    // (e.g. a batch_size() analogue), which WHERE would reject
    def anyMatch: Boolean =
      !cur.select(check.as("__check")).filter(col("__check")).isEmpty
    var cond = atLeastOnce || anyMatch
    while (cond && (maxLoops <= 0 || loops < maxLoops)) {
      cur = step(cur)
      loops += 1
      if (loops % checkpointEvery == 0) cur = cur.localCheckpoint(true)
      // an emptied batch exits here too (no rows survive the filter), so
      // the reference's empty-batch exit needs no separate isEmpty action
      cond = anyMatch
    }
    cur
  }

  /** The tier layering alone (exposed for WorkflowSpec). */
  def resolveDag(branches: Seq[Branch]): Seq[Seq[Branch]] = {
    val dupes = branches.groupBy(_.writes).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"multiple branches write the same target(s): ${dupes.mkString(", ")}")
    val byWrite = branches.map(b => b.writes -> b).toMap
    var remaining = branches
    val tiers = Seq.newBuilder[Seq[Branch]]
    var done = Set.empty[String]
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition { b =>
        // a read of an undone write target blocks; a self-read is a cycle
        b.reads.forall(r => done.contains(r) || !byWrite.contains(r))
      }
      if (ready.isEmpty)
        throw new IllegalArgumentException(
          "failed to automatically resolve DAG, circular dependencies detected " +
            s"for branches: ${blocked.map(_.name).sorted.mkString(", ")}")
      tiers += ready
      done ++= ready.map(_.writes)
      remaining = blocked
    }
    tiers.result()
  }

  /** count(name) monotonic counter (bloblang functions.go:233): a counter
    * starting at 1 that increments once per message. The reference's
    * counter numbers messages in arrival order of one process; a
    * distributed engine has no arrival order, so the caller names the
    * total order explicitly (`orderCols` must be a unique key) and the
    * counter is that order's 1-based ordinal.
    *
    * Scale shape: range-repartition on the key, sort within partitions,
    * then `zipWithIndex` (a count-per-partition job + an offset map) — the
    * global ordinal WITHOUT a single-partition window (`row_number()` over
    * an unpartitioned window funnels 100 TB through one task; this is the
    * distributed equivalent). Costs one extra count job and drops out of
    * whole-stage codegen for the stamping map — use only when a global
    * ordinal is genuinely required, which is why the reference marks the
    * function "shared state, avoid where possible" too (SURVEY §2.6).
    */
  def counter(df: DataFrame, orderCols: Seq[Column], out: String = "count"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val stamped = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(stamped, schema)
  }
}
