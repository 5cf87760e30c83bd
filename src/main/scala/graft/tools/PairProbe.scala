package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: interleave two SparkEntry queries N times in ONE JVM and print
  * per-iteration seconds + medians — built to adjudicate the BENCH_r07
  * `h_table_lookup_join` (9.68s) vs `h_lookup_join` (2.77s) gap, which the
  * builder's own measurements said was an environment stall, not plan cost.
  * Interleaving means a time-localized sandbox stall hits both queries
  * symmetrically instead of poisoning whichever ran during the bad window.
  *
  * `runMain graft.tools.PairProbe <nameA> <nameB> [iters]`
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val (a, b) = (args(0), args(1))
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      // same noop-sink evaluation Bench uses
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warmup of both paths
    run(a); run(b)
    val (as, bs) = (Array.ofDim[Double](iters), Array.ofDim[Double](iters))
    for (i <- 0 until iters) {
      as(i) = run(a)
      bs(i) = run(b)
      println(f"[pair] iter=$i $a=${as(i)}%.2fs $b=${bs(i)}%.2fs")
    }
    def med(xs: Array[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(f"[pair] MEDIAN $a=${med(as)}%.2fs $b=${med(bs)}%.2fs " +
      f"ratio=${med(bs) / med(as)}%.2f")
    spark.stop()
    sys.exit(0)
  }
}
