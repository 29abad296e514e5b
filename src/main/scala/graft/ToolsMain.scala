package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named SparkEntry query.
  * Usage: runMain graft.TimeOne <queryName> [sfDir] [cpus]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm-up run then timed run (SPARK_GRAFT_NOWARM=1 to measure cold)
    if (!sys.env.contains("SPARK_GRAFT_NOWARM")) fn(spark, sfDir).collect()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).collect().length
    println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
