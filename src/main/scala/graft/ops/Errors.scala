package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-handling operators (SURVEY.md §2.9). The reference marks failed
  * parts with an error flag and routes on it rather than aborting
  * (reference: internal/message/part.go:129-138); our rows carry a nullable
  * `error` column with the same contract.
  */
object Errors {

  val ErrCol = "error"

  /** Ensure the error column exists (healthy = null). */
  def withErrorCol(df: DataFrame): DataFrame =
    if (df.columns.contains(ErrCol)) df
    else df.withColumn(ErrCol, lit(null).cast("string"))

  /** Mark rows failing `check` with `msg` — the processor-failure path
    * (internal/old/processor/util.go:149).
    */
  def markError(df: DataFrame, failWhen: Column, msg: Column): DataFrame =
    withErrorCol(df).withColumn(
      ErrCol,
      when(col(ErrCol).isNotNull, col(ErrCol)).when(failWhen, msg))

  /** try processor (internal/old/processor/try.go:83-153): apply the child
    * transform only to rows not already failed; failed rows pass through
    * untouched.
    */
  def tryProc(df: DataFrame, field: String, child: Column): DataFrame =
    withErrorCol(df).withColumn(
      field,
      when(col(ErrCol).isNull, child).otherwise(col(field)))

  /** catch processor (catch.go:120-152): apply the child transform only to
    * failed rows, then CLEAR the error flag (flag reset at 146-149).
    */
  def catchProc(df: DataFrame, field: String, child: Column): DataFrame =
    withErrorCol(df)
      .withColumn(field, when(col(ErrCol).isNotNull, child).otherwise(col(field)))
      .withColumn(ErrCol, lit(null).cast("string"))

  /** switch processor (switch.go:94-105,169-191): route each row to the
    * first matching case's transform; `fallthrough` not modeled (the
    * reference discourages it).
    */
  def switchProc(df: DataFrame, field: String, cases: Seq[(Column, Column)]): DataFrame = {
    val routed = cases.foldRight(col(field)) { case ((check, out), acc) =>
      when(check, out).otherwise(acc)
    }
    df.withColumn(field, routed)
  }

  /** output `reject` / DLQ split (internal/old/output/reject.go): failed
    * rows to a dead-letter frame, healthy rows onward.
    */
  def splitDlq(df: DataFrame): (DataFrame, DataFrame) = {
    val d = withErrorCol(df)
    (d.filter(col(ErrCol).isNull), d.filter(col(ErrCol).isNotNull))
  }
}
