package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Par, TextFunctions}

/** Dev probe: per-stage timing of the minhash-LSH pipeline (mirrors
  * Dedup.minhashLshPairs).
  */
object MinhashProbe {
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
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs count")(docs.count())

    val sh = Par.cached(Par.fan(docs).select(
      col("doc_id").as("id"),
      array_distinct(
        transform(
          TextFunctions.shingleSet(col("text"), 3),
          s => TextFunctions.hash61(s))).as("sh")))
    time("sh materialize")(sh.selectExpr("sum(size(sh))").collect())

    val hashed = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), (col("s") % Dedup.MinhashP).as("h"))
    val minAggs = Dedup.MinhashA.indices.map { i =>
      coalesce(
        min((lit(Dedup.MinhashA(i)) * col("h") + lit(Dedup.MinhashB(i))) % Dedup.MinhashP),
        lit(Dedup.MinhashP)).as(s"m$i")
    }
    val sig = Par.cached(hashed.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*))
    time("sig materialize")(sig.count())

    val banded = sig.select(
      col("id"),
      posexplode(
        array((0 until 4).map { b =>
          concat_ws(
            "-",
            (0 until 4).map(j => col(s"m${b * 4 + j}").cast("string")): _*)
        }: _*)).as(Seq("band", "band_key")))
    val candidates = banded
      .join(
        banded.select(col("band"), col("band_key"), col("id").as("id_b")),
        Seq("band", "band_key"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct()
    time("candidates")(candidates.count())
    val cand2 = Par.cached(candidates)
    time("candidates persist")(cand2.count())

    val candIds = cand2.select(col("id_a").as("id"))
      .union(cand2.select(col("id_b").as("id")))
      .distinct()
    val shNarrow = sh.join(candIds, Seq("id"), "left_semi")
    val verified = cand2
      .join(shNarrow.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shNarrow.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    val i = size(array_intersect(col("sh_a"), col("sh_b")))
    val ss = size(col("sh_a")) + size(col("sh_b"))
    val jac = i.cast("double") / (ss - i).cast("double")
    val out = verified
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("verify+score")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
    sys.exit(0)
  }
}
