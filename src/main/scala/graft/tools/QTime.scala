package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time one SparkEntry query at a given sf dir. */
object QTime {
  def main(args: Array[String]): Unit = {
    val (name, dir) = (args(0), if (args.length > 1) args(1) else "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]").appName("qtime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id * 2)").collect()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.foreach(_ => ())
    println(f"[qtime] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
