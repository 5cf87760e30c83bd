package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Integer-exact IVF ([[IvfInt]]): training vs an independent in-test
  * reference implementation, empty-cell carry, partitioning invariance,
  * and exact agreement with brute-force quantized ranking at full probe.
  */
class IvfIntSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Deterministic pseudo-random corpus: `n` vectors in `clusters` groups;
    * group g points along axis block g with hash-derived jitter.
    */
  private def corpus(n: Int, clusters: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val g = i % clusters
      val v = Array.tabulate(dim) { d =>
        val base = if (d / (dim / clusters) == g) 1.0f else 0.0f
        val jitter = ((refHash61(s"v$i:$d") % 41L) - 20L) / 200.0f
        base + jitter
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** The portable 60-bit hash, reimplemented independently of the library
    * (first 15 md5 hex chars, base 16).
    */
  private def refHash61(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Reference quantization: scale = max|x|/127 (1 for zero), code =
    * floor(x/scale + 0.5).
    */
  private def refQuantize(v: Seq[Float]): Array[Int] = {
    val m = v.map(x => math.abs(x.toDouble)).max
    val s = if (m == 0.0) 1.0 else m / 127.0
    v.map(x => math.floor(x.toDouble / s + 0.5).toInt).toArray
  }

  /** Reference trainer: mirrors the pinned semantics with plain loops. */
  private def refTrain(
      vecs: Seq[(Long, Seq[Float])],
      cells: Int,
      iters: Int): Array[Array[Int]] = {
    val codes = vecs.map { case (id, v) => (id, refQuantize(v)) }
    var cent = codes
      .sortBy { case (id, _) => (refHash61(id.toString), id.toString) }
      .take(cells)
      .map(_._2.clone())
      .toArray
    for (_ <- 0 until iters) {
      def best(q: Array[Int]): Int = {
        val scores = cent.map { c =>
          val n2c = c.foldLeft(0L)((a, x) => a + x.toLong * x)
          if (n2c == 0L) 0.0
          else {
            val dot = q.zip(c).foldLeft(0L) { case (a, (x, y)) =>
              a + x.toLong * y
            }
            dot.toDouble / math.sqrt(n2c.toDouble)
          }
        }
        scores.indexOf(scores.max)
      }
      val assigned = codes.groupBy { case (_, q) => best(q) }
      cent = cent.zipWithIndex.map { case (old, ci) =>
        assigned.get(ci) match {
          case None => old
          case Some(members) =>
            Array.tabulate(dim) { d =>
              val s = members.foldLeft(0L)((a, m) => a + m._2(d))
              math.floor(s.toDouble / members.size).toInt
            }
        }
      }
    }
    cent
  }

  test("trained centroids match the independent reference implementation") {
    val df = corpus(48, 4)
    val vecs = df
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    val expected = refTrain(vecs, cells = 4, iters = 2)
    val got = IvfInt
      .trainedCentroids(df, "vec_id", "embedding", cells = 4, iters = 2)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2)))
      .toMap
    for (ci <- 0 until 4; d <- 0 until dim)
      withClue(s"cell $ci dim $d: ") {
        got((ci, d)) shouldBe expected(ci)(d)
      }
  }

  test("empty cells carry their seed centroid unchanged") {
    // all vectors identical -> every vector ties to cell 0; cell 1 must
    // keep its seed (which equals the common code vector here)
    val df = (0L until 6L)
      .map(i => (i, Seq.fill(dim)(0.5f)))
      .toDF("vec_id", "embedding")
    val cent = IvfInt
      .trainedCentroids(df, "vec_id", "embedding", cells = 2, iters = 2)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2)))
      .toMap
    val common = refQuantize(Seq.fill(dim)(0.5f))
    for (ci <- 0 to 1; d <- 0 until dim)
      cent((ci, d)) shouldBe common(d)
  }

  test("centroids and top-k are invariant to input partitioning") {
    val df = corpus(60, 3)
    def run(parts: Int): (Seq[Row], Seq[Row]) = {
      val d = df.repartition(parts)
      val c = IvfInt
        .trainedCentroids(d, "vec_id", "embedding", cells = 4, iters = 2)
        .orderBy("cell", "dim")
        .collect()
        .toSeq
      val t = IvfInt
        .topK(
          d, "vec_id", "embedding",
          d.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 3, cells = 4, nprobe = 2, iters = 2)
        .orderBy("query_id", "rank")
        .collect()
        .toSeq
      (c, t)
    }
    val (c1, t1) = run(1)
    val (c13, t13) = run(13)
    c13 shouldBe c1
    t13 shouldBe t1
  }

  test("nprobe = cells reproduces the exact quantized brute-force ranking") {
    val df = corpus(40, 2)
    val queries = df.filter(col("vec_id") < 8)
    val ivf = IvfInt
      .topK(
        df, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, cells = 4, nprobe = 4, iters = 2)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val brute = Quantize
      .quantizedTopK(
        df, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    ivf shouldBe brute
  }

  test("partial probe keeps a sane recall floor on clustered data") {
    val df = corpus(90, 3)
    val queries = df.filter(col("vec_id") < 15)
    def pairs(res: DataFrame): Set[(Long, Long)] =
      res
        .select("query_id", "neighbor_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    val ivf = pairs(
      IvfInt.topK(
        df, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, cells = 3, nprobe = 1, iters = 2))
    val brute = pairs(
      Quantize.quantizedTopK(
        df, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5))
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    withClue(s"recall $recall: ") { recall should be >= 0.6 }
  }

  test("centroid values stay within int8 code range") {
    val df = corpus(48, 4)
    val vals = IvfInt
      .trainedCentroids(df, "vec_id", "embedding", cells = 4, iters = 2)
      .select("value")
      .collect()
      .map(_.getInt(0))
    all(vals.map(math.abs).toSeq) should be <= 127
  }
}
