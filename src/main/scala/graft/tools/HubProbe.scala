package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the planted-hub PageRank smoke step: per-stage MAX task
  * shuffle-read records, so a read-bound brush is attributable to a
  * specific stage (combined hub fan-in vs a benign wide stage).
  */
object HubProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxByStage = new TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          maxByStage.updateWith(t.stageId) {
            case Some((old, nm)) if old >= r => Some((old, nm))
            case Some((_, nm)) => Some((r, nm))
            case _ => Some((r, ""))
          }
        }
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        maxByStage.updateWith(s.stageInfo.stageId) {
          case Some((r, _)) => Some((r, s.stageInfo.name.take(120)))
          case None => Some((0L, s.stageInfo.name.take(120)))
        }
    })
    val n = 4000000L
    val hub = n / 2
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val ids = s2.range(n).select(col("id"))
    val edges = ids
      .select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
      .union(ids.filter(col("id") =!= hub)
        .select(col("id").as("src"), lit(hub).as("dst")))
    graft.ops.PageRank.ranks(edges, "src", "dst", iters = 3)
      .write.format("noop").mode("overwrite").save()
    graft.ops.Par.releaseCaches()
    Thread.sleep(500)
    maxByStage.toSeq.sortBy(_._1).foreach { case (sid, (mx, nm)) =>
      if (mx > 100000) println(f"[hubprobe] stage $sid%4d maxRead=$mx  $nm")
    }
    println("[hubprobe] global max = " + maxByStage.values.map(_._1).max)
    spark.stop()
    sys.exit(0)
  }
}
