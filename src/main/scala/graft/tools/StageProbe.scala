package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: run ONE gate and print every completed stage's task count
  * and name, so partition-count overhead is attributable stage by stage.
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <name>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // experimental confs: SPARK_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new TrieMap[Int, (Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.put(
          s.stageInfo.stageId,
          (s.stageInfo.numTasks, s.stageInfo.name))
    })
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.ops.Par.releaseCaches()
    Thread.sleep(500)
    val byTasks = stages.toSeq.sortBy(_._1)
    byTasks.foreach { case (id, (n, nm)) =>
      println(f"[stage] $id%4d tasks=$n%4d  ${nm.take(90)}")
    }
    println(s"[stageprobe] $name stages=${byTasks.size} " +
      s"tasks=${byTasks.map(_._2._1).sum}")
    spark.stop()
    sys.exit(0)
  }
}
