package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for web-scale corpora.
  *
  * Scale posture: every variant shuffles at most once on a *bucketing* key
  * (content hash, LSH band bucket, blocking columns) and never materializes
  * an unblocked cross join — the candidate-pair space is always bounded by
  * bucket sizes, which is what makes these runnable on 100 TB. Exact-integer
  * and md5-based arithmetic keeps results engine-portable for the DuckDB
  * oracles.
  */
object Dedup {

  /** Exact dedup by content hash: one surviving row (minimum id) per
    * distinct content. Partial aggregation makes the shuffle carry one row
    * per distinct hash per map partition.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(
        min(col(idCol)).as("doc_id_kept"),
        count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs within blocking buckets.
    *
    * `blockCols` bound the pair space (classic blocking); the join shuffles
    * on the block key only. Output: (id_a, id_b, jaccard) with id_a < id_b
    * and jaccard ≥ `threshold`.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val withSh = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        TextFunctions.shingleSet(col(textCol), n).as("sh"): _*)
    val a = withSh.select(
      col("id").as("id_a") +: col("sh").as("sh_a") +: blockCols.map(col): _*)
    val b = withSh.select(
      col("id").as("id_b") +: col("sh").as("sh_b") +: blockCols.map(col): _*)
    val joined = a.join(b, blockCols).filter(col("id_a") < col("id_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    joined
      .withColumn(
        "jaccard",
        inter.cast(DoubleType) / uni.cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Fixed MinHash permutation parameters (seeded once, hardcoded so the SQL
    * oracle can replicate them): h_i(x) = (A(i)*x + B(i)) mod P.
    */
  val MinhashP = 1000000007L
  val MinhashA: Seq[Long] = Seq(472882049L, 741895923L, 183624417L,
    910391749L, 562090211L, 354879673L, 639364277L, 87534581L, 805306457L,
    232792561L, 433494437L, 715827883L, 97546891L, 512927377L, 679938767L,
    322147223L)
  val MinhashB: Seq[Long] = Seq(268435459L, 522133279L, 57885161L, 782715677L,
    377211941L, 611603069L, 148102319L, 923456789L, 43112609L, 700417303L,
    296065411L, 835153489L, 174440041L, 498537509L, 66600049L, 753377617L)

  /** MinHash signature (k = MinhashA.length) of a hashed-shingle array
    * column; empty shingle sets get P as a sentinel min.
    */
  def minhashSignature(hashedShingles: Column): Column =
    array(MinhashA.indices.map { i =>
      coalesce(
        array_min(
          transform(
            hashedShingles,
            h => (lit(MinhashA(i)) * (h % MinhashP) + MinhashB(i)) % MinhashP)),
        lit(MinhashP))
    }: _*)

  /** MinHash + banded LSH near-dup pairs, verified by exact Jaccard.
    *
    * Pipeline (all deterministic, so oracle-reproducible):
    *   1. distinct n-gram shingles → portable 60-bit hashes,
    *   2. k minhashes (fixed permutations) → signature,
    *   3. `bands` bands of `k/bands` rows: band key = signature slice,
    *   4. explode bands → shuffle on (band index, band key) → candidate
    *      pairs within equal buckets (the ONLY shuffle that moves documents,
    *      and buckets are tiny for non-duplicate data),
    *   5. distinct candidate pairs → exact Jaccard verify ≥ `threshold`.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val k = MinhashA.length
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands

    val sig = df.select(
      col(idCol).as("id"),
      TextFunctions.shingleSet(col(textCol), n).as("sh"))
      .withColumn(
        "sig",
        minhashSignature(transform(col("sh"), s => TextFunctions.hash61(s))))

    val banded = sig.select(
      col("id"),
      col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            concat_ws(
              "-",
              (1 to rows).map(j =>
                element_at(
                  col("sig"),
                  (b * rows + j).cast(IntegerType)).cast(StringType)): _*)))
        .as(Seq("band", "band_key")))

    val left = banded.select(
      col("band"),
      col("band_key"),
      col("id").as("id_a"),
      col("sh").as("sh_a"))
    val right = banded.select(
      col("band"),
      col("band_key"),
      col("id").as("id_b"),
      col("sh").as("sh_b"))
    val candidates = left
      .join(right, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    candidates
      .withColumn("jaccard", inter.cast(DoubleType) / uni.cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 16-bit SimHash over the distinct word set (portable md5-derived word
    * hashes; bit i set when the ±1 votes of that bit across words sum
    * positive). 16 bits keeps the oracle SQL tractable while exercising the
    * real bit-vote structure; widen by changing `SimhashBits`.
    */
  val SimhashBits = 16

  def simhash(text: Column): Column = {
    val hs = transform(TextFunctions.wordSet(text), w => TextFunctions.hash61(w))
    val bitCols = (0 until SimhashBits).map { i =>
      val votes = aggregate(
        hs,
        lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(1L) * 2L - 1L))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup pairs within blocking buckets: hamming distance ≤
    * `maxHamming` via `bit_count(xor)`.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      maxHamming: Int = 2): DataFrame = {
    val withSig = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        simhash(col(textCol)).as("sig"): _*)
    val a = withSig.select(
      col("id").as("id_a") +: col("sig").as("sig_a") +: blockCols.map(col): _*)
    val b = withSig.select(
      col("id").as("id_b") +: col("sig").as("sig_b") +: blockCols.map(col): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03): minimum
    * shingle-hash per sliding window of `w` hashes; the distinct minima are
    * the document's fingerprints. Implemented with posexplode + a bounded
    * following window — shuffles once on the document id.
    */
  def winnowingFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      w: Int = 4): DataFrame = {
    val exploded = df
      .select(
        col(idCol).as(idCol),
        posexplode(TextFunctions.shingleHashes(col(textCol), n))
          .as(Seq("pos", "h")))
    val win = Window
      .partitionBy(col(idCol))
      .orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    exploded
      .withColumn("wmin", min(col("h")).over(win))
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("wmin")).as("n_fingerprints"),
        min(col("wmin")).as("min_fingerprint"))
  }
}
