package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage the sustained-bench input and compute its batch-oracle pair
  * count, in a JVM of its own: generating + globally sorting ~10 GB and
  * window-scanning 100 M+ rows inside the bench parent (after dozens of
  * streaming rigs' native residue) is what OOM-killed campaign runs A4
  * and B4. Prints ONE JSON line `{"dir":…,"batch_pairs":N}`; the parent
  * forks this, then forks one `graft.Flagship` child per engine over the
  * staged dir, then deletes the dir with plain file IO.
  */
object SustainedStage {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 5000000L
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-sustained-stage")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Tmp.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.Flagship.stage(spark, nConvs, nFiles = nFiles)
    val bp = graft.streaming.SessionJoin.pairBatch(spark.read.parquet(dir)).count()
    println(s"""{"dir":"$dir","batch_pairs":$bp}""")
    spark.stop()
  }
}
