package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for phase timing. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // phase breakdown of the u_pagerank gate
    def runGate(): Unit = {
      val docs = graft.ops.Par
        .fan(spark.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"))
      val n = time("docs.count")(docs.count())
      val e1 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      val e2 = docs.select(
        col("doc_id").as("src"), ((col("doc_id") * 13 + 5) % n).as("dst"))
      val e3 = docs.filter(col("doc_id") % 5 === 0).select(
        col("doc_id").as("src"), (col("doc_id") % 37).as("dst"))
      val edges = e1.union(e2).union(e3)
      val out = time("ranks build+eval") {
        graft.ops.PageRank.ranks(edges, "src", "dst", iters = 5)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ops.Par.releaseCaches()
      out
    }
    // warm
    spark.read.parquet(s"$dir/nation.parquet").count()
    (1 to 3).foreach(_ => time("u_pagerank full")(runGate()))
    spark.stop()
    sys.exit(0)
  }
}
