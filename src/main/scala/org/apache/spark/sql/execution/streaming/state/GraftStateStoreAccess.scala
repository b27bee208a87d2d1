package org.apache.spark.sql.execution.streaming.state

/** Package-placed accessor for `StateStore.unloadAll()`, which is
  * private[sql]. Spark's executor-global provider cache keeps a stopped
  * query's RocksDB providers — native block cache + memtables — loaded
  * until the next maintenance tick; when back-to-back bounded runs each
  * use a fresh single-use checkpoint (graft.Flagship), those providers
  * are pure dead weight the moment the query terminates, and deferred
  * maintenance (graft.Bench tunes it past the trial window so it cannot
  * fire mid-measurement) means they accumulate across runs. This is the
  * same package-placement pattern Spark's own test utilities use; the
  * one call site is Flagship.runStaged teardown.
  */
object GraftStateStoreAccess {
  def unloadAll(): Unit = StateStore.unloadAll()
}
