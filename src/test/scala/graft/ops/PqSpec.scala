package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization ([[Pq]]): codebook training vs an independent
  * in-test reference, ADC ranking invariants, and reconstruction sanity.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def refHash61(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def refQuantize(v: Seq[Float]): Array[Int] = {
    val m = v.map(x => math.abs(x.toDouble)).max
    val s = if (m == 0.0) 1.0 else m / 127.0
    v.map(x => math.floor(x.toDouble / s + 0.5).toInt).toArray
  }

  private def corpus(n: Int, clusters: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val g = i % clusters
      val v = Array.tabulate(dim) { d =>
        val base = if (d / (dim / clusters) == g) 1.0f else 0.0f
        base + ((refHash61(s"p$i:$d") % 41L) - 20L) / 200.0f
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Plain-loop reference trainer mirroring the pinned semantics. */
  private def refTrain(
      vecs: Seq[(Long, Seq[Float])],
      m: Int,
      cells: Int,
      iters: Int): Array[Array[Array[Int]]] = {
    val sub = dim / m
    val codes = vecs.map { case (id, v) => (id, refQuantize(v)) }
    val seeds = codes
      .sortBy { case (id, _) => (refHash61(id.toString), id.toString) }
      .take(cells)
      .map(_._2)
    var books = Array.tabulate(m)(s =>
      seeds.map(_.slice(s * sub, s * sub + sub)).toArray)
    def best(book: Array[Array[Int]], x: Array[Int]): Int = {
      val scores = book.map { c =>
        val dot = x.zip(c).foldLeft(0L) { case (a, (p, q)) =>
          a + p.toLong * q
        }
        val n2c = c.foldLeft(0L)((a, v) => a + v.toLong * v)
        2L * dot - n2c
      }
      scores.indexOf(scores.max)
    }
    for (_ <- 0 until iters) {
      books = books.zipWithIndex.map { case (book, s) =>
        val slices = codes.map(_._2.slice(s * sub, s * sub + sub))
        val byCell = slices.groupBy(x => best(book, x))
        book.zipWithIndex.map { case (old, ci) =>
          byCell.get(ci) match {
            case None => old
            case Some(ms) =>
              Array.tabulate(sub) { d =>
                val sm = ms.foldLeft(0L)((a, x) => a + x(d))
                math.floor(sm.toDouble / ms.size).toInt
              }
          }
        }
      }
    }
    books
  }

  test("trained codebooks match the independent reference implementation") {
    val df = corpus(48, 4)
    val vecs = df
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    val expected = refTrain(vecs, m = 2, cells = 4, iters = 2)
    val got = Pq
      .trainedCodebooks(df, "vec_id", "embedding", m = 2, cells = 4,
        iters = 2)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getInt(3)))
      .toMap
    for (s <- 0 until 2; c <- 0 until 4; d <- 0 until dim / 2)
      withClue(s"subspace $s cell $c dim $d: ") {
        got((s, c, d)) shouldBe expected(s)(c)(d)
      }
  }

  test("codebooks and ADC top-k are invariant to input partitioning") {
    val df = corpus(60, 3)
    def run(parts: Int): (Seq[Row], Seq[Row]) = {
      val d = df.repartition(parts)
      val b = Pq
        .trainedCodebooks(d, "vec_id", "embedding", m = 2, cells = 4,
          iters = 2)
        .orderBy("subspace", "cell", "dim")
        .collect()
        .toSeq
      val t = Pq
        .adcTopK(
          d, "vec_id", "embedding",
          d.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 3, m = 2, cells = 4, iters = 2)
        .orderBy("query_id", "rank")
        .collect()
        .toSeq
      (b, t)
    }
    val (b1, t1) = run(1)
    val (b11, t11) = run(11)
    b11 shouldBe b1
    t11 shouldBe t1
  }

  test("one cell per subspace reduces ADC to a constant ranking by id") {
    // cells=1: every vector gets the same code, every ADC score per query
    // is identical -> ranking degenerates to the neighbor-id tie-break
    val df = corpus(20, 2)
    val res = Pq
      .adcTopK(
        df, "vec_id", "embedding", df.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 3, m = 2, cells = 1, iters = 1)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    res shouldBe Seq(
      (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (1L, 2L), (1L, 3L))
  }

  test("ADC neighbors come from the query's cluster") {
    // within-cluster order in this fixture is pure jitter noise, which a
    // lossy code legitimately scrambles — the robust quality property is
    // that compressed search still finds the right NEIGHBORHOOD: the
    // fraction of top-5 ADC neighbors sharing the query's cluster
    // (random ≈ 1/3 with 3 clusters) must stay high
    val df = corpus(90, 3)
    val queries = df.filter(col("vec_id") < 15)
    val adc = Pq
      .adcTopK(
        df, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, m = 2, cells = 8, iters = 2)
      .select("query_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sameCluster =
      adc.count { case (q, n) => q % 3 == n % 3 }.toDouble / adc.length
    withClue(s"same-cluster precision $sameCluster: ") {
      sameCluster should be >= 0.9
    }
  }

  test("m must divide the dimension") {
    val df = corpus(8, 2)
    an[IllegalArgumentException] should be thrownBy
      Pq.trainedCodebooks(df, "vec_id", "embedding", m = 3, cells = 2,
        iters = 1)
  }
}
