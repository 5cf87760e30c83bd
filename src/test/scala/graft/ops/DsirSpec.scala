package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  test("bucket weights: smoothed integer-scaled target/raw ratio") {
    // one-bigram corpora so each side's histogram is a single known bucket
    val raw = Seq((1L, "xx yy"), (2L, "xx yy"), (3L, "xx yy")).toDF("doc_id", "text")
    val tgt = Seq((9L, "aa bb")).toDF("doc_id", "text")
    val w = Dsir.bucketWeights(raw, tgt, "doc_id", "text", B, 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    w should have size B.toLong.toInt
    val rawBucket = Seq("xx yy").toDF("g")
      .select(TextFunctions.hash61(col("g")) % B).as[Long].head()
    val tgtBucket = Seq("aa bb").toDF("g")
      .select(TextFunctions.hash61(col("g")) % B).as[Long].head()
    // raw-only bucket: (0+1)*1000 div (3+1) = 250
    w(rawBucket) shouldBe 250L
    // target-only bucket: (1+1)*1000 div (0+1) = 2000
    w(tgtBucket) shouldBe 2000L
    // untouched bucket: (0+1)*1000 div (0+1) = 1000
    val other = (0L until B).find(b => b != rawBucket && b != tgtBucket).get
    w(other) shouldBe 1000L
  }

  test("selection ranks target-resembling docs first; short docs never score") {
    // target speaks "alpha beta gamma"; raw has lookalikes, noise, and a
    // one-word doc that carries no bigram (must emit no row at all)
    val tgt = Seq((100L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta eta theta"),
      (3L, "alpha beta noise"),
      (4L, "word")).toDF("doc_id", "text")
    val w = Dsir.bucketWeights(raw, tgt, "doc_id", "text", B)
    val scored = Dsir.scoreDocs(raw, "doc_id", "text", w, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    scored.keySet shouldBe Set(1L, 2L, 3L) // doc 4 has no bigrams
    scored(1L) should be > scored(2L)
    scored(3L) should be > scored(2L)
    val top = Dsir.selectTopK(raw, tgt, "doc_id", "text", k = 2, buckets = B)
      .collect().map(_.getLong(0)).toSet
    top shouldBe Set(1L, 3L)
  }

  test("weights score corpora beyond the raw-histogram source (smoothing)") {
    val raw = Seq((1L, "xx yy zz")).toDF("doc_id", "text")
    val tgt = Seq((9L, "aa bb")).toDF("doc_id", "text")
    val w = Dsir.bucketWeights(raw, tgt, "doc_id", "text", B)
    // a doc whose grams hit buckets absent from BOTH histograms still
    // scores (smoothed weight), instead of dropping rows on the inner join
    val other = Seq((50L, "qq rr ss tt")).toDF("doc_id", "text")
    val out = Dsir.scoreDocs(other, "doc_id", "text", w, B).collect()
    out should have length 1
    out.head.getLong(1) shouldBe 3L // n_grams
    out.head.getDouble(2) should be > 0.0
  }
}
