package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Dev scratchpad for phase timing / floor measurement. r16 (second
  * use): split the exact-similarity join cost (p_prefix_jaccard) into
  * its pipeline phases — shingle+hash build, frequency join, rarest-
  * first ordering, prefix explode, full join — so "compute-bound"
  * claims name the phase. (First use this round measured the WARC
  * walk's gzip-inflate floor; see OPTIMIZATION_r16.md C3.)
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Par, SkewJoin, TextFunctions}

    def time(tag: String)(df: => DataFrame): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        Par.releaseCaches()
        println(f"[scratch] $tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val docs = Par.fan(spark.read.parquet(s"$sfDir/documents.parquet"))

    def shFrame = docs.select(
      col("doc_id").as("id"),
      array_distinct(
        transform(
          TextFunctions.shingleSet(col("text"), 3),
          s => TextFunctions.hash61(s))).as("sh"))
      .filter(size(col("sh")) > 0)

    time("1 shingle+hash61 build")(shFrame)

    def toks = shFrame.select(
      col("id"), size(col("sh")).as("len"), explode(col("sh")).as("tok"))
    time("2 + explode")(toks)

    def withFreq = {
      val t = toks
      SkewJoin.hotTailEquiJoin(
        t, t.groupBy(col("tok")).agg(count(lit(1)).as("df")), "tok",
        Seq(col("df").desc, col("tok")), 1024)
    }
    time("3 + freq join")(withFreq)

    def ordered = withFreq
      .groupBy(col("id"), col("len"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
    time("4 + collect_list sort")(ordered)

    val threshold = 0.5
    def prefix = ordered
      .select(
        col("id"), col("len"),
        posexplode(slice(
          col("ord"), lit(1),
          (col("len") - ceil(col("len") * threshold - lit(1e-9)) + 1)
            .cast(IntegerType))).as(Seq("pos0", "st")))
    time("5 + prefix explode")(prefix)

    time("6 full prefixJaccardPairs")(
      graft.ops.Dedup.prefixJaccardPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", 3, 0.5))

    spark.stop()
    sys.exit(0)
  }
}
