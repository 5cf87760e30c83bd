package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.GateTemp

/** Storage-layout contracts behind the t_codec_roundtrip and
  * t_partitioned_layout gates: the codec option must actually take effect
  * (or the fidelity gate would pass vacuously), and a deterministic
  * predicate on a hive-partition column must PRUNE the scan to matching
  * directories — the property that turns a 100 TB full scan into a
  * per-partition read.
  */
class StorageLayoutSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 400L)
      .map(i => (i, s"l${i % 4}", ("word" + i + " ") * 40))
      .toDF("id", "lang", "text")
  }

  /** Executes `df` and returns the file-source scan's `numFiles` metric —
    * the files the scan SELECTED after partition pruning (`df.inputFiles`
    * reflects the unfiltered relation and is useless here).
    */
  private def filesScanned(df: DataFrame): Long = {
    // collect() (NOT count()) — count builds its own query execution and
    // would leave THIS plan's metrics unpopulated
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case other => other.collect { case s: FileSourceScanExec => s }
    }
    val ss = scans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "no FileSourceScanExec in the executed plan")
    ss.map(_.metrics("numFiles").value).sum
  }

  private def dirBytes(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_))
      .mapToLong(Files.size(_)).sum()
    finally s.close()
  }

  test("parquet codec option takes effect: gzip output is smaller") {
    val root = GateTemp.dir("graft-layout-codec")
    Seq("uncompressed", "gzip").foreach { c =>
      corpus.write.mode("overwrite")
        .option("compression", c).parquet(s"$root/$c")
    }
    val raw = dirBytes(root.resolve("uncompressed"))
    val gz = dirBytes(root.resolve("gzip"))
    assert(
      gz < raw,
      s"gzip ($gz B) not smaller than uncompressed ($raw B) — option ignored?")
    // and all codecs read back identically
    val a = spark.read.parquet(s"$root/uncompressed")
    val b = spark.read.parquet(s"$root/gzip")
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  test("literal partition predicate prunes the scan to one directory") {
    val root = GateTemp.dir("graft-layout-prune") + "/p"
    corpus.write.mode("overwrite").partitionBy("lang").parquet(root)
    val all = filesScanned(spark.read.parquet(root))
    val pruned = spark.read.parquet(root).filter(col("lang") === "l1")
    val sel = filesScanned(pruned)
    val onDisk = {
      val s = Files.walk(java.nio.file.Paths.get(root, "lang=l1"))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(
      sel == onDisk && sel < all,
      s"pruning ineffective: scanned $sel files (lang=l1 holds $onDisk of $all)")
    pruned.count() shouldBe 100L
  }

  test("mergeSchema surfaces the union schema with nulls for old rows") {
    import spark.implicits._
    val root = GateTemp.dir("graft-layout-evolve") + "/t"
    Seq((1L, "a"), (3L, "b")).toDF("id", "lang")
      .write.parquet(s"$root/gen=1")
    Seq((2L, "a", 10L), (4L, "b", 20L)).toDF("id", "lang", "extra")
      .write.parquet(s"$root/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    merged.columns.toSet shouldBe Set("id", "lang", "extra", "gen")
    merged.filter(col("gen") === 1 && col("extra").isNotNull)
      .count() shouldBe 0L
    merged.filter(col("gen") === 2).agg(sum("extra")).head().getLong(0) shouldBe 30L
    merged.count() shouldBe 4L
  }

  test("deterministic hash predicate on the partition column also prunes") {
    val root = GateTemp.dir("graft-layout-prune-hash") + "/p"
    corpus.write.mode("overwrite").partitionBy("lang").parquet(root)
    val keep = (0 until 4).map(i => s"l$i")
      .filter(l => {
        // replicate hash61 driver-side via the expression itself
        import spark.implicits._
        Seq(l).toDF("lang")
          .select(pmod(TextFunctions.hash61(col("lang")), lit(2L)))
          .head().getLong(0) == 0L
      }).toSet
    assert(keep.nonEmpty && keep.size < 4, s"degenerate fixture: $keep")
    val all = filesScanned(spark.read.parquet(root))
    val pruned = spark.read.parquet(root)
      .filter(pmod(TextFunctions.hash61(col("lang")), lit(2L)) === 0)
    val sel = filesScanned(pruned)
    val onDisk = {
      val s = Files.walk(java.nio.file.Paths.get(root))
      try s.filter(p => p.toString.endsWith(".parquet") &&
        keep.exists(l => p.toString.contains(s"lang=$l"))).count()
      finally s.close()
    }
    assert(
      sel == onDisk && sel < all,
      s"hash-predicate pruning ineffective: scanned $sel, expected $onDisk of $all (keep=$keep)")
    pruned.count() shouldBe keep.size * 100L
  }
}
