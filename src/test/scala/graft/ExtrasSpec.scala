package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.http.{HttpForeachWriter, Json}
import graft.http.testkit.StubServer
import graft.ops.Similarity
import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot registers and evaluates in SQL") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val out =
      spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect().head.getDouble(0)
    out shouldBe 32.0
  }

  test("graft_dot matches the HOF formulation bit-for-bit") {
    val df = spark.range(200).select(
      col("id"),
      transform(sequence(lit(1), lit(64)), i =>
        (sin(i * (col("id") + 1))).cast("float")).as("v"))
    val cmp = df.select(
      Similarity.dot(col("v"), col("v")).as("native"),
      Similarity.dotHof(col("v"), col("v")).as("hof"))
      .filter(col("native") =!= col("hof"))
    cmp.count() shouldBe 0L
  }
}

class CosineNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("cosineNearDupPairs finds exact and near duplicates via LSH blocking") {
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(d => (((seed * 31 + d * 7) % 11) - 5).toFloat)
    val rows = Seq(
      (1L, vec(1)),
      (2L, vec(2)),
      (3L, vec(3)),
      (4L, vec(1).map(_ * 3.0f)), // exact direction dup of 1
      (5L, vec(1).zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x })) // near dup of 1
      .toDF("vec_id", "embedding")
    val out = Similarity
      .cosineNearDupPairs(rows, "vec_id", "embedding", threshold = 0.999, planes = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    out should contain((1L, 4L))
    out should contain((1L, 5L))
    out should contain((4L, 5L))
    out.exists(p => p._1 == 2L || p._2 == 2L) shouldBe false
  }

  test("cosinePairsExact agrees with cosineNearDupPairs on guaranteed-same-bucket pairs") {
    def vec(seed: Int): Array[Float] =
      Array.tabulate(16)(d => (((seed * 13 + d * 5) % 9) - 4).toFloat)
    val rows = (1 to 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val exact = Similarity
      .cosinePairsExact(rows, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity
      .cosineNearDupPairs(rows, "vec_id", "embedding", 0.9, planes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh.subsetOf(exact) shouldBe true
  }
}

class HttpForeachWriterSpec extends SparkSpec with BeforeAndAfterAll {
  private var server: StubServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = StubServer().route("/row")(_ => (200, "{}")).start()
  }
  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  test("streaming foreach writer posts one request per row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val query = input
      .toDF()
      .toDF("v")
      .select(to_json(struct(col("v"))).as("payload"))
      .writeStream
      .foreach(new HttpForeachWriter(Map("url" -> server.url("/row"))))
      .start()
    try {
      input.addData(1L, 2L, 3L)
      query.processAllAvailable()
      val bodies = server.requests.map(_.body).sorted
      bodies shouldBe List("""{"v":1}""", """{"v":2}""", """{"v":3}""")
    } finally query.stop()
  }

  test("error status fails the stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val fail = StubServer().route("/bad")(_ => (500, "no")).start()
    try {
      val input = MemoryStream[Long]
      val query = input
        .toDF()
        .toDF("v")
        .select(to_json(struct(col("v"))).as("payload"))
        .writeStream
        .foreach(new HttpForeachWriter(Map("url" -> fail.url("/bad"))))
        .start()
      try {
        input.addData(1L)
        a[Throwable] should be thrownBy query.processAllAvailable()
      } finally query.stop()
    } finally fail.stop()
  }
}
