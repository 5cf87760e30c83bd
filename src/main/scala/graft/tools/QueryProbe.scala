package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query by name with timing and optional
  * explain. `runMain graft.tools.QueryProbe <name> [runs] [jobs] [explain]`.
  * `jobs` prints per-Spark-job wall times (attribution for multi-stage
  * pipelines); `runs` defaults to 2.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.drop(1).find(_.matches("\\d+")).map(_.toInt).getOrElse(2)
    val showJobs = args.contains("jobs")
    val doExplain = args.contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (showJobs) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          starts.put(j.jobId, j.time)
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          val dur = (j.time - starts.getOrDefault(j.jobId, j.time)) / 1e3
          println(f"[job] id=${j.jobId}%3d ${dur}%6.2fs")
        }
      })
    }
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      // noop sink = full evaluation of every output column (count() lets
      // Catalyst prune agg value expressions — same honesty rule as Bench)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.ops.Par.releaseCaches()
    }
    spark.stop()
    sys.exit(0)
  }
}
