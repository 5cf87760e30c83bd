package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for phase timing / floor measurement. Currently:
  * measure the in-gate recall values of s_ivf_topk and s_pca_ann at each
  * sf dir (the floors those gates REQUIRE — r15).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops.{AnnEval, Similarity}

    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")

      // s_ivf_topk recall@5 (cells=8, nprobe=3, trainIters=2)
      locally {
        val qs = emb.filter(col("vec_id") < 50)
        val ann = Similarity.ivfTopK(emb, "vec_id", "embedding",
          qs, "vec_id", "embedding", k = 5, cells = 8, nprobe = 3,
          trainIters = 2)
        val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          qs, "vec_id", "embedding", k = 5)
        val rec = AnnEval.recallAtK(ann, truth, "query_id", "neighbor_id")
          .agg(sum(col("n_hits")).as("h"), sum(col("n_truth")).as("t"))
          .collect().head
        println(f"[scratch] $sf s_ivf_topk recall@5 = " +
          f"${rec.getLong(0).toDouble / rec.getLong(1)}%.3f")
      }

      // s_pca_ann captured-variance share (8 of 64 dims)
      locally {
        val model = graft.ops.Pca.fit(emb, "embedding", 8)
        val st = emb.agg(
          sum(Similarity.norm2(col("embedding").cast("array<float>"))
            .cast("double"))
            .as("ss"),
          count(lit(1)).as("n")).collect().head
        val total =
          st.getDouble(0) / st.getLong(1) - model.mean.map(m => m * m).sum
        println(f"[scratch] $sf s_pca_ann variance share = " +
          f"${model.explainedVariance.sum / total}%.4f")
        graft.ops.Par.releaseCaches()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
