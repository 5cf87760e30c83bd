package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextFunctions

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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("count docs")(docs.count())
    val words = docs.select(col("doc_id"), TextFunctions.words(col("text")).as("ws"))
    time("words pass")(words.selectExpr("sum(size(ws))").collect())
    val sh = docs.select(col("doc_id"), TextFunctions.shingleSet(col("text"), 3).as("sh"))
    time("shingle pass")(sh.selectExpr("sum(size(sh))").collect())
    time("shingle pass again")(sh.selectExpr("sum(size(sh))").collect())
    val hs = docs.select(
      col("doc_id"),
      TextFunctions.shingleHashes(col("text"), 3).as("hs"))
    time("hash pass")(hs.selectExpr("sum(size(hs))").collect())
    val wmins = transform(
      sequence(lit(1), size(col("hs"))),
      i => array_min(slice(col("hs"), i, lit(4))))
    time("winnow over materialized")(
      hs.persist().select(col("doc_id"), size(array_distinct(wmins)).as("n"))
        .selectExpr("sum(n)").collect())
    time("winnow again")(
      hs.select(col("doc_id"), size(array_distinct(wmins)).as("n"))
        .selectExpr("sum(n)").collect())
    spark.stop()
    sys.exit(0)
  }
}
