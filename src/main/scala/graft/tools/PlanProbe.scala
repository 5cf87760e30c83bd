package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: prints the physical plan of named gated queries at sf0.001
  * (plan-shape audits for SURVEY §2.5 X6 without a bench run).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("plan-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .getOrCreate()
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
