package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev measurement tool (guide §1): run named gates exactly like Bench
  * (noop sink, caches released) and report the scheduling-vs-compute
  * breakdown — #jobs, #stages, #tasks, summed task time and wall time —
  * so "overhead-dominated" claims are measured, not guessed.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <name,name,...> [iters]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    // same warmup as Bench: parquet reader + shuffle + codegen paths
    locally {
      import org.apache.spark.sql.functions._
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      nation.groupBy(col("n_regionkey")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }

    for (name <- names; i <- 1 to iters) {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0); shuffleRead.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.Par.releaseCaches()
      Thread.sleep(300) // let straggling listener events drain
      println(f"[profile] $name iter$i wall=$wall%.2fs jobs=${jobs.get}" +
        f" stages=${stages.get} tasks=${tasks.get}" +
        f" taskTime=${taskNanos.get / 1e9}%.2fs" +
        f" shufRead=${shuffleRead.get / 1048576.0}%.1fMiB" +
        f" shufWrite=${shuffleWrite.get / 1048576.0}%.1fMiB")
    }
    spark.stop()
    sys.exit(0)
  }
}
