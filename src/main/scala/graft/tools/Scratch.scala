package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for phase timing / floor measurement. r16: split the
  * file-scale WARC walk cost into its gzip-inflate floor vs parse
  * overhead (the u_warc_file_ingest serial-task budget).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    import graft.ops.Warc
    val big = Warc.stagedWarcFile("big", seed = 1L, nResponses = 110000,
      gzip = true)
    println(f"[scratch] fixture: ${big.length() / 1048576.0}%.1f MiB")

    // floor: decompress + discard
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val in = new java.util.zip.GZIPInputStream(
        new java.io.BufferedInputStream(
          new java.io.FileInputStream(big), 64 * 1024), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) { total += n; n = in.read(buf) }
      in.close()
      println(f"[scratch] gunzip-only pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($total bytes)")
    }

    // full walk via the library iterator, pruned and unpruned
    for (includePayload <- Seq(false, true); i <- 1 to 2) {
      val t0 = System.nanoTime()
      var cnt = 0
      val it = Warc.probeFileRecords(big.getPath, includePayload)
      while (it.hasNext) { it.next(); cnt += 1 }
      println(f"[scratch] walk(includePayload=$includePayload) pass $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt records)")
    }

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t2 = System.nanoTime()
    val n = Warc
      .warcIngestFiles(Seq(("big", big.getPath)).toDF("fid", "path"), "path",
        includePayload = false)
      .groupBy(col("warc_type"))
      .agg(count(lit(1)).as("n"), sum(col("payload_len")).as("len"))
      .collect()
    val t3 = System.nanoTime()
    println(f"[scratch] spark pruned ingest: ${(t3 - t2) / 1e9}%.1f s " +
      n.map(r => s"${r.get(0)}=${r.get(1)}/${r.get(2)}").mkString(" "))
    spark.stop()
    sys.exit(0)
  }
}
