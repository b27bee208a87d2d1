package graft.tools

import org.apache.spark.sql.SparkSession

/** The one SparkSession builder every forked benchmark block uses, so a
  * measurement at 2 cores and one at 32 differ ONLY in core count and
  * explicitly-passed knobs. Mirrors the production shape for a large
  * stateful streaming job: RocksDB state store (state off-heap so GC cost
  * doesn't grow with state size), changelog checkpointing (per-batch
  * deltas, not full snapshots), block cache sized to the hot state
  * working set, maintenance deferred past bounded runs (a real cluster
  * runs it on idle executor threads; mid-trial it steals measured cores).
  */
object BenchSession {

  def build(cores: Int, shufflePartitions: Int = -1,
      blockCacheMB: Int = 512, appName: String = "graft-bench"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"$appName-$cores")
      .config("spark.sql.shuffle.partitions",
        if (shufflePartitions > 0) shufflePartitions else cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Tmp.dir("spark-local"))
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // the default 8 MB block cache forces every per-key get() of a
      // multi-hundred-MB-per-partition state store back to SST files +
      // block decompression — pure memory-bandwidth burn at high core
      // counts; on a real cluster pair this with boundedMemoryUsage
      .config("spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB", blockCacheMB.toString)
      .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "256")
      .config("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "3")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    // ad-hoc experiment overrides: "k=v;k=v" applied last
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
