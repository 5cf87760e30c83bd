package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: counts plan-shape features (exchanges, join strategies) for
  * named gates at sf0.001 — the numbers PlanGuardSpec pins.
  */
object PlanShapeProbe {
  def shape(plan: String): Map[String, Int] =
    Map(
      "exchange" -> "(?m)^.*Exchange (hash|range|single)".r
        .findAllIn(plan).size,
      "bnlj" -> "BroadcastNestedLoopJoin".r.findAllIn(plan).size,
      "cartesian" -> "CartesianProduct".r.findAllIn(plan).size,
      "smj" -> "SortMergeJoin".r.findAllIn(plan).size,
      "bhj" -> "BroadcastHashJoin".r.findAllIn(plan).size,
      "sort_global" -> "(?m)^.*Sort \\[.*\\], true".r.findAllIn(plan).size)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("plan-shape-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val s = shape(plan)
        println(
          s"SHAPE $name exchanges=${s("exchange")} bnlj=${s("bnlj")} " +
            s"cartesian=${s("cartesian")} smj=${s("smj")} bhj=${s("bhj")} " +
            s"globalSort=${s("sort_global")}")
      } catch {
        case e: Throwable => println(s"SHAPE $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
