package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: counts plan-shape features (exchanges, join strategies) for
  * named gates at sf0.001 — the numbers PlanGuardSpec pins.
  */
object PlanShapeProbe {
  /** Exchanges are counted as DISTINCT operator lines (leading tree-art
    * stripped): a `Par.cached` subtree prints its child plan verbatim at
    * every InMemoryRelation occurrence — same plan object, same
    * expression ids — but runs ONCE, so identical lines are one runtime
    * exchange. Genuinely separate exchanges always carry distinct
    * expression ids and survive the dedup.
    */
  def shape(plan: String): Map[String, Int] =
    Map(
      // 'Single' capitalized: Spark prints "Exchange SinglePartition" —
      // a lowercase alternative silently missed every global-agg /
      // coalesce(1)-style exchange (r14 review fix)
      "exchange" -> "(?m)^.*Exchange (hash|range|Single)[^\\n]*".r
        .findAllIn(plan)
        .map(_.dropWhile(c => !c.isLetter))
        .toSet
        .size,
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
