package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def codesOf(v: Seq[Float]): (Double, Seq[Int]) =
    Quantize
      .quantize(Seq((1L, v)).toDF("id", "vec"), "id", "vec")
      .select($"scale", $"q")
      .as[(Double, Seq[Int])]
      .head()

  test("codes are floor(x/scale + 0.5), always within [-127, 127]") {
    val (s, q) = codesOf(Seq(1.0f, -1.0f, 0.5f, -0.5f, 0.25f))
    s shouldBe (1.0 / 127) +- 1e-15
    // 0.5/scale = 63.5 -> round-half-UP -> 64; -0.5/scale -> -63
    q shouldBe Seq(127, -127, 64, -63, 32)
  }

  test("zero vector quantizes to scale 1.0 and all-zero codes") {
    val (s, q) = codesOf(Seq(0.0f, 0.0f, 0.0f))
    s shouldBe 1.0
    q shouldBe Seq(0, 0, 0)
  }

  test("quantized cosine is invariant under vector scaling") {
    // cosine over codes divides out the per-vector scales: a vector and
    // its 1000x copy produce identical codes, hence identical ranking
    val (_, q1) = codesOf(Seq(0.3f, -0.7f, 0.2f))
    val (_, q2) = codesOf(Seq(300f, -700f, 200f))
    q1 shouldBe q2
  }

  test("intDot is the exact integer dot product") {
    val df = Seq((Seq(1, -2, 3), Seq(4, 5, -6))).toDF("a", "b")
    df.select(Quantize.intDot($"a", $"b")).as[Long].head() shouldBe
      (4L - 10L - 18L)
  }

  test("quantizedTopK ranks by quantized cosine with id tie-break") {
    // corpus vectors at distinct angles from the query direction (1, 0)
    val corpus = Seq(
      (10L, Seq(10f, 0.1f)), // ~aligned
      (11L, Seq(5f, 2f)),
      (12L, Seq(1f, 3f)),
      (13L, Seq(-4f, 0.5f)) // anti-aligned
    ).toDF("id", "vec")
    val queries = Seq((1L, Seq(1f, 0f))).toDF("id", "vec")
    val got = Quantize
      .quantizedTopK(corpus, "id", "vec", queries, "id", "vec", k = 4)
      .select($"neighbor_id", $"rank")
      .as[(Long, Int)]
      .collect()
      .sortBy(_._2)
      .map(_._1)
    got shouldBe Array(10L, 11L, 12L, 13L)
  }

  test("quantized top-k recall vs exact cosine on angular data") {
    // 40 unit vectors at 4.5° steps: symmetric ± neighbors of a query tie
    // in exact cosine up to float noise, so exact ORDER can legitimately
    // flip under quantization — the honest claim is high recall, plus
    // exact agreement for the asymmetric query 0
    val vecs = (0 until 40).map { i =>
      val ang = i * math.Pi / 40
      (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }
    val corpus = vecs.toDF("id", "vec")
    val queries = vecs.take(5).toDF("id", "vec")
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id")
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .view
        .mapValues(_.map(_._2).toSet)
        .toMap
    val exact = topSets(
      Similarity
        .bruteForceTopK(corpus, "id", "vec", queries, "id", "vec", k = 3))
    val quant = topSets(
      Quantize.quantizedTopK(corpus, "id", "vec", queries, "id", "vec", k = 3))
    quant.keySet shouldBe exact.keySet
    for ((q, ex) <- exact)
      (ex intersect quant(q)).size should be >= 2
    // query 0 has no symmetric tie: its neighborhood must match exactly
    quant(0L) shouldBe exact(0L)
  }

  test("quantize stages max|x| and scale (one eval per row, not inlined)") {
    // the optimized plan must not re-inline the array_max fold into the
    // per-element codes lambda, nor duplicate it across the scale CASE
    // branches (CollapseProject staging guard)
    val df = spark
      .range(4)
      .select(
        col("id"),
        org.apache.spark.sql.functions
          .array(col("id").cast("float"), (col("id") + 1).cast("float"))
          .as("vec"))
    val plan = Quantize
      .quantize(df, "id", "vec")
      .queryExecution
      .optimizedPlan
      .toString
    "array_max".r.findAllIn(plan).size shouldBe 1
    // the codes lambda divides by the staged scale ATTRIBUTE (scale#<id>)
    plan should include regex "/ scale#\\d+"
  }

  test("dequantize reconstructs within scale/2 per dimension") {
    val vec = Seq(0.93f, -0.41f, 0.07f, 0.555f)
    val got = Quantize
      .quantize(Seq((1L, vec)).toDF("id", "vec"), "id", "vec")
      .select($"scale", Quantize.dequantize($"q", $"scale").as("r"))
      .as[(Double, Seq[Float])]
      .head()
    val (scale, recon) = got
    recon.zip(vec).foreach { case (r, x) =>
      math.abs(r.toDouble - x.toDouble) should be <= (scale / 2 + 1e-7)
    }
  }

  test("codegen IntDotF equals the interpreted HOF fold (incl. empty)") {
    val df = Seq(
      (Seq(1, -2, 3, 127), Seq(4, 5, -6, 127)),
      (Seq.empty[Int], Seq.empty[Int]),
      (Seq(0, 0), Seq(0, 0)))
      .toDF("a", "b")
    val rows = df
      .select(
        Quantize.intDot($"a", $"b").as("native"),
        Quantize.intDotHof($"a", $"b").as("hof"))
      .as[(Long, Long)]
      .collect()
    rows.foreach { case (n, h) => n shouldBe h }
    rows.head._1 shouldBe (4L - 10L - 18L + 127L * 127L)
  }

  test("graft.syntax exposes the quantization ops") {
    import graft.syntax._
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "vec")
    df.quantizeInt8("id", "vec").columns.toSeq shouldBe
      Seq("id", "scale", "q")
    df.quantizedTopK("id", "vec", df, "id", "vec", k = 1)
      .count() shouldBe 2L
  }

  test("signPack packs sign bits 32 per word, high-to-low exact") {
    // dims 0..63: positive where dim % 3 == 0 -> bit j of word w set iff
    // (w*32 + j) % 3 == 0; expected words computed independently here
    val vec = (0 until 64).map(d => if (d % 3 == 0) 0.5f else -0.5f)
    def expectedWord(w: Int): Long =
      (0 until 32).map(j => if ((w * 32 + j) % 3 == 0) 1L << j else 0L).sum
    val df = Seq(Tuple1(vec)).toDF("v")
    val got = df.select(Quantize.signPack($"v", 64).as("sig"))
      .as[Seq[Long]].head()
    got shouldBe Seq(expectedWord(0), expectedWord(1))
  }

  test("signPack treats +0.0 as set and negatives as clear") {
    val df = Seq(Tuple1(Seq(0.0f, -0.0001f, 1e-30f, -1e30f) ++
      Seq.fill(28)(-1f))).toDF("v")
    val sig = df.select(Quantize.signPack($"v", 32).as("s"))
      .as[Seq[Long]].head()
    sig.head shouldBe (1L | (1L << 2))
  }

  test("hamming is the popcount of the word XORs") {
    val df = Seq((Seq(0L, -1L), Seq(0L, -1L), Seq(1L, 0L)))
      .toDF("a", "same", "other")
    df.select(Quantize.hamming($"a", $"same")).head().getLong(0) shouldBe 0L
    // a=(0, all-ones), other=(bit0, 0): differs in 1 + 64 bits
    df.select(Quantize.hamming($"a", $"other")).head().getLong(0) shouldBe 65L
  }
}
