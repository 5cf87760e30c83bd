package graft.ops

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def runDf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("q", "d", "rank")
  private def qrelsDf(rows: Seq[(Long, String)]) =
    rows.toDF("q", "d")

  private def eval(
      run: Seq[(Long, String, Long)],
      qrels: Seq[(Long, String)],
      k: Int = 5) =
    RankEval
      .perQuery(runDf(run), qrelsDf(qrels), "q", "d", "rank", k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap

  test("hand-checked MRR and per-term-floored AP") {
    // q1: rels {a,b,c}; hits at ranks 2 (j=1) and 4 (j=2), c missed
    val out = eval(
      run = Seq((1L, "x", 1L), (1L, "a", 2L), (1L, "y", 3L), (1L, "b", 4L),
        (1L, "z", 5L)),
      qrels = Seq((1L, "a"), (1L, "b"), (1L, "c")))
    // (n_rel, n_hits_at_k, first_rank, rr_ppm, ap_ppm)
    out(1L) shouldBe ((3L, 2L, 2L, 500000L, 333333L))
  }

  test("judged query with no retrieved relevant scores zeros; unjudged query is excluded") {
    val out = eval(
      run = Seq((1L, "x", 1L), (2L, "a", 1L)),
      qrels = Seq((1L, "a"))) // q2 has no judgments
    out(1L) shouldBe ((1L, 0L, 0L, 0L, 0L))
    out.contains(2L) shouldBe false
  }

  test("rank cutoff k excludes hits past it") {
    val out = eval(
      run = Seq((1L, "a", 6L)),
      qrels = Seq((1L, "a")),
      k = 5)
    out(1L) shouldBe ((1L, 0L, 0L, 0L, 0L))
  }

  test("duplicate run rows keep the best rank; duplicate qrels collapse") {
    val out = eval(
      run = Seq((1L, "a", 4L), (1L, "a", 2L)),
      qrels = Seq((1L, "a"), (1L, "a")))
    out(1L) shouldBe ((1L, 1L, 2L, 500000L, 500000L))
  }

  test("summary is the floor mean over judged queries") {
    val per = RankEval.perQuery(
      runDf(Seq((1L, "a", 2L), (2L, "x", 1L))),
      qrelsDf(Seq((1L, "a"), (2L, "b"))),
      "q", "d", "rank", 5)
    val s = RankEval.summary(per).collect().head
    s.getAs[Long]("n_queries") shouldBe 2L
    s.getAs[Long]("mrr_ppm") shouldBe 250000L  // (500000 + 0) / 2
    s.getAs[Long]("map_ppm") shouldBe 250000L
    s.getAs[Long]("hit_rate_ppm") shouldBe 500000L
  }

  private def ndcg(
      run: Seq[(Long, String, Long)],
      qrels: Seq[(Long, String, Long)],
      k: Int = 5) =
    RankEval
      .ndcgPerQuery(
        runDf(run), qrels.toDF("q", "d", "rel"), "q", "d", "rank", "rel", k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("ndcg: hand-checked against the frozen discount table") {
    val D = RankEval.DiscountPpm
    // rels a:3 (gain 7), b:1 (gain 1); run ranks b first — the penalized order
    val out = ndcg(
      run = Seq((1L, "b", 1L), (1L, "a", 2L)),
      qrels = Seq((1L, "a", 3L), (1L, "b", 1L)))
    val dcg = 1L * D(0) + 7L * D(1)
    val idcg = 7L * D(0) + 1L * D(1)
    out(1L) shouldBe ((2L, dcg, idcg, dcg * 1000000L / idcg))
    // the ideal order scores exactly 1e6
    val perfect = ndcg(
      run = Seq((1L, "a", 1L), (1L, "b", 2L)),
      qrels = Seq((1L, "a", 3L), (1L, "b", 1L)))
    perfect(1L)._4 shouldBe 1000000L
  }

  test("ndcg: grades clamp at 16; duplicates keep best rank / max grade") {
    val D = RankEval.DiscountPpm
    val out = ndcg(
      run = Seq((1L, "a", 3L), (1L, "a", 1L)), // duplicate doc: rank 1 wins
      qrels = Seq((1L, "a", 50L), (1L, "a", 2L))) // grade clamps to 16
    val g = (1L << 16) - 1L
    out(1L) shouldBe ((1L, g * D(0), g * D(0), 1000000L))
  }

  test("ndcg rejects k beyond the frozen table") {
    an[IllegalArgumentException] should be thrownBy
      ndcg(Seq((1L, "a", 1L)), Seq((1L, "a", 1L)), k = 65)
  }

  test("bad k is rejected") {
    an[IllegalArgumentException] should be thrownBy
      RankEval.perQuery(
        runDf(Seq((1L, "a", 1L))), qrelsDf(Seq((1L, "a"))),
        "q", "d", "rank", 0)
  }
}
