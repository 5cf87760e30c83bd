package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query by name with timing and optional
  * explain. `runMain graft.tools.QueryProbe <name> [sfDir] [explain]`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      // noop sink = full evaluation of every output column (count() lets
      // Catalyst prune agg value expressions — same honesty rule as Bench)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
    sys.exit(0)
  }
}
