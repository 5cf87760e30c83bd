package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for phase timing / floor measurement. Currently:
  * size + wall-time of the file-scale WARC fixture and its one-task
  * ingest (the r16 `u_warc_file_ingest` gate parameters).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.Warc

    val t0 = System.nanoTime()
    val big = Warc.stagedWarcFile("scratch-big", seed = 1L,
      nResponses = 110000, gzip = true)
    val t1 = System.nanoTime()
    println(f"[scratch] fixture: ${big.length() / 1048576.0}%.1f MiB " +
      f"in ${(t1 - t0) / 1e9}%.1f s (>=256 MiB: ${big.length >= (256L << 20)})")

    val t2 = System.nanoTime()
    val n = Warc
      .warcIngestFiles(Seq(("big", big.getPath)).toDF("fid", "path"), "path")
      .groupBy(col("warc_type"))
      .agg(count(lit(1)).as("n"), sum(col("payload_len")).as("len"))
      .collect()
    val t3 = System.nanoTime()
    println(f"[scratch] ingest: ${(t3 - t2) / 1e9}%.1f s " +
      n.map(r => s"${r.get(0)}=${r.get(1)}/${r.get(2)}").mkString(" "))
    spark.stop()
  }
}
