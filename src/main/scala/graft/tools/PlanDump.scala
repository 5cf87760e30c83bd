package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev measurement tool: dump `.explain("formatted")` for named gates to
  * files (plans/rNN/<name>_<tag>.txt) so plan-shape claims in the round
  * notes are checkable without running Spark.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [name,name,...]
  * (no name list = every declared query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"[plandump] $name ok (${plan.linesIterator.size} lines)")
        } catch {
          case e: Throwable =>
            println(s"[plandump] $name FAILED: ${e.getMessage}")
        } finally graft.ops.Par.releaseCaches()
      }
    spark.stop()
    sys.exit(0)
  }
}
