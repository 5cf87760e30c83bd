package graft.ops

import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def evalOne(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).collect().head.get(0)

  test("tokenCount / wordSet / meanTokenLength") {
    evalOne(TextFunctions.tokenCount(col("text")), "a bb  ccc a") shouldBe 4
    evalOne(functions.size(TextFunctions.wordSet(col("text"))), "a bb ccc a") shouldBe 3
    evalOne(TextFunctions.meanTokenLength(col("text")), "a bb ccc a") shouldBe 1.75
  }

  test("shingles windows of 3 words; short docs empty") {
    val sh = Seq("w1 w2 w3 w4")
      .toDF("text")
      .select(TextFunctions.shingleSet(col("text"), 3).as("v"))
      .collect()
      .head
      .getSeq[String](0)
    sh shouldBe Seq("w1 w2 w3", "w2 w3 w4")
    evalOne(functions.size(TextFunctions.shingleSet(col("text"), 3)), "only two") shouldBe 0
  }

  test("bpe estimate adds pieces for long words") {
    // "internationalization" = 20 chars -> 1 + (20-4)/4 = 5 pieces
    evalOne(TextFunctions.bpeTokenEstimate(col("text")),
      "internationalization is") shouldBe 6L
  }

  test("stopword hits and ratio") {
    evalOne(
      TextFunctions.stopwordHits(col("text"), Seq("the", "a")),
      "the cat and a dog the end") shouldBe 3
  }

  test("langId picks profile with most stopword hits") {
    evalOne(TextFunctions.langId(col("text")),
      "the cat is in the house and it is fine") shouldBe "en"
    evalOne(TextFunctions.langId(col("text")),
      "der hund ist nicht mit der katze und") shouldBe "de"
    evalOne(TextFunctions.langId(col("text")), "xyzzy plugh") shouldBe "und"
  }

  test("hash61 is stable and matches the md5-derived definition") {
    val h = evalOne(TextFunctions.hash61(col("text")), "hello")
    // first 15 hex chars of md5("hello") = 5d41402abc4b2a7
    h shouldBe java.lang.Long.parseLong("5d41402abc4b2a7", 16)
  }

  test("punctRatio counts punctuation chars") {
    evalOne(TextFunctions.punctRatio(col("text")), "ab, cd!") shouldBe (2.0 / 7.0)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight", "en", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog today", "en", "s1"),
    (3L, "completely different text with other words entirely here now", "en", "s1"),
    (4L, "the quick brown fox jumps over the lazy dog tonight", "en", "s2"), // exact dup of 1
    (5L, "unrelated short doc", "en", "s2"))

  private def df = docs.toDF("doc_id", "text", "lang", "source")

  test("exact dedup keeps min id per content hash") {
    val out = Dedup.exact(df, "doc_id", "text").collect()
    out should have size 4
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    dup.getAs[Long]("doc_id_kept") shouldBe 1L
  }

  test("ngram jaccard finds near-dups within blocks") {
    val out = Dedup
      .ngramJaccardPairs(df, "doc_id", "text", Seq("lang"), 3, 0.5)
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 4L)) // exact dup -> jaccard 1.0
    out.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
      .get.getAs[Double]("jaccard") shouldBe 1.0
    pairs.exists { case (a, b) => a == 3L || b == 3L } shouldBe false
  }

  test("minhash LSH finds the same high-jaccard pairs as exact search") {
    val exact = Dedup
      .ngramJaccardPairs(df, "doc_id", "text", Seq("lang"), 3, 0.5)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup
      .minhashLshPairs(df, "doc_id", "text", 3, 4, 0.5)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // identical signatures guarantee the exact pair is found; near pairs
    // found with high probability (fixed seed -> deterministic here)
    lsh should contain((1L, 4L))
    lsh shouldBe exact
  }

  test("simhash: identical docs same signature; near docs close; far docs far") {
    val sigs = df
      .select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    sigs(1L) shouldBe sigs(4L)
    java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) should be <= 6
    java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) should be >= 3
  }

  test("simhashPairs finds exact dup at hamming 0") {
    val out = Dedup
      .simhashPairs(df, "doc_id", "text", Seq("lang"), maxHamming = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out should contain((1L, 4L))
  }

  test("winnowing fingerprints: identical docs identical fingerprints") {
    val out = Dedup
      .winnowingFingerprints(df, "doc_id", "text", 3, 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    out(1L) shouldBe out(4L)
    out(1L) should not be out(3L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("cos"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    df(1L) shouldBe 1.0 +- 1e-12
    df(2L) shouldBe 0.0 +- 1e-12
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val out = Similarity
      .bruteForceTopK(corpus, "vec_id", "embedding", queries, "vec_id",
        "embedding", k = 2)
      .orderBy("rank")
      .collect()
    out.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(2L, 3L)
  }

  test("lshTopK finds an identical-direction vector in the same bucket") {
    // varied directions; vec 50 is an exact scaled copy of vec 25, so it
    // shares vec 25's bucket by construction and ranks first on cosine
    def vec(i: Int): Array[Float] =
      Array.tabulate(8)(d => (((i * 31 + d * 17) % 13) - 6).toFloat)
    val rows = (1 to 49).map(i => (i.toLong, vec(i))) :+
      (50L, vec(25).map(_ * 2.0f))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 25L)
    val out = Similarity
      .lshTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 3, planes = 4)
      .orderBy("rank")
      .collect()
    // (vec(i) cycles mod 13, so id 12 is also an exact copy and may tie)
    out.map(_.getAs[Long]("neighbor_id")) should contain(50L)
    out.head.getAs[Double]("cos_sim") shouldBe 1.0 +- 1e-9
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta runs the stub decoder partition-wise with stable schema") {
    val df = Seq((1L, "abcd"), (2L, "abcdefghij"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("blob"))
    val out = Multimodal.extractMeta(df, "id", "blob").orderBy("id").collect()
    out.map(_.getAs[Long]("n_bytes")).toSeq shouldBe Seq(4L, 10L)
    out.head.getAs[Int]("width") shouldBe 20 // 4 % 640 + 16
    out.head.getAs[Int]("height") shouldBe 44 // 28 % 480 + 16
    out.head.getAs[String]("format") shouldBe "even"
    out.map(_.schema.fieldNames.toSeq).head shouldBe
      Seq("id", "n_bytes", "width", "height", "n_frames", "format")
  }
}
