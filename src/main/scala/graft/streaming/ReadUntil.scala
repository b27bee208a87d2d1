package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** read_until input wrapper (reference: internal/impl/pure/
  * input_read_until.go:28-40): consume a child stream until a row passes
  * the check; the triggering row is emitted — flagged like the
  * reference's `benthos_read_until: final` metadata — and everything
  * after it is dropped, then the query stops.
  *
  * Micro-batch mapping: the cut is found at the driver inside
  * foreachBatch (which runs serially per batch), rows after the first
  * match by `ord` within the matching batch are discarded, later batches
  * short-circuit without reading payloads, and the query is stopped
  * asynchronously (stop() from inside foreachBatch would deadlock the
  * micro-batch thread).
  */
object ReadUntil {

  /** Start `stream` into `sink`, cutting at the first row where `check`
    * holds (rows ordered by `ord` within each batch; batch order is the
    * stream's arrival order, as in the reference). Returns the running
    * query — await it as usual.
    */
  def run(
      stream: DataFrame,
      check: Column,
      ord: Seq[Column],
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    @volatile var finished = false
    @volatile var queryRef: StreamingQuery = null
    // foreachBatch for batch 0 can run before start() returns: the stopper
    // must wait until queryRef is published or a first-batch terminator
    // would leave the query running forever under continuous triggers
    val started = new java.util.concurrent.CountDownLatch(1)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!finished) {
          val flagged = batch
            .withColumn("read_until_final", coalesce(check, lit(false)))
          // one pass: does this batch contain the terminator?
          val cached = flagged.persist()
          try {
            val hit = cached.filter(col("read_until_final"))
              .select(struct(ord: _*).as("o")).orderBy(col("o")).limit(1)
              .collect().headOption
            hit match {
              case None => sink(cached, batchId)
              case Some(row) =>
                val cut = row.getStruct(0)
                val lim = struct(ord: _*) <= struct(cut.toSeq.map(lit): _*)
                sink(cached.filter(lim), batchId)
                finished = true
                // stop from a side thread once this batch commits
                val stopper = new Thread(() => {
                  started.await()
                  queryRef.stop()
                })
                stopper.setDaemon(true)
                stopper.start()
            }
          } finally cached.unpersist(): Unit
        }
      }
      .start()
    queryRef = q
    started.countDown()
    q
  }
}
