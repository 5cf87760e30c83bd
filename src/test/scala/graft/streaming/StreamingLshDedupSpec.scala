package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Dedup
import graft.queries.GateTemp

/** Streaming LSH dedup registry semantics: the streamed band-bucket state
  * must equal the batch aggregation of [[Dedup.lshBandKeys]], and the
  * join-back verdict must keep exactly the minimum id of each duplicate
  * group while letting unique documents through.
  */
class StreamingLshDedupSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
      (7L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
      (3L, "one two three four five six seven eight nine"),
      (9L, "totally different words entirely here right now"),
      (11L, "xy")) // shorter than one 3-gram shingle: NO bands
      .toDF("doc_id", "text")
  }

  private def streamedRegistry(name: String) = {
    val docs = fixture
    val dir = GateTemp.dir(s"graft-stream-lsh-$name").toString + "/docs"
    docs.write.parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = Dedup.streamingLshRegistry(stream, "doc_id", "text")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streamed registry equals the batch aggregation of lshBandKeys") {
    val streamed = streamedRegistry("lsh_spec_reg_eq")
    val batch = Dedup.lshBandKeys(fixture, "doc_id", "text")
      .groupBy(col("band"), col("band_key"))
      .agg(min(col("id")).as("min_id"), count(lit(1)).as("n_docs"))
    streamed.exceptAll(batch).count() shouldBe 0L
    batch.exceptAll(streamed).count() shouldBe 0L
    // exact copies share every one of the 4 buckets: those buckets hold 3
    // members with min 1
    streamed.filter(col("n_docs") === 3 && col("min_id") === 1L)
      .count() shouldBe 4L
  }

  test("join-back verdict keeps bucket minima, drops dominated copies") {
    val registry = streamedRegistry("lsh_spec_reg_verdict")
    val verdict = Dedup.lshBandKeys(fixture, "doc_id", "text")
      .join(registry, Seq("band", "band_key"))
      .groupBy(col("id"))
      .agg(min(col("min_id")).as("m"), count(lit(1)).as("n_bands"))
      .select(col("id"), (col("m") === col("id")).as("survived"),
        col("n_bands"))
    // doc 11 produced no bands at all
    verdict.count() shouldBe 5L
    val byId = verdict.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    byId(1L) shouldBe ((true, 4L))
    byId(5L) shouldBe ((false, 4L))
    byId(7L) shouldBe ((false, 4L))
    byId(3L) shouldBe ((true, 4L))
    byId(9L) shouldBe ((true, 4L))
  }

  test("lshBandKeys yields one row per (doc, band) and skips shingle-less docs") {
    val banded = Dedup.lshBandKeys(fixture, "doc_id", "text")
    banded.count() shouldBe 5L * 4L
    banded.filter(col("id") === 11L).count() shouldBe 0L
    banded.groupBy("id").count().filter(col("count") =!= 4L)
      .count() shouldBe 0L
  }
}
