package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test decontamination: flag training documents that share word
  * n-grams with a benchmark / evaluation set (the contamination check run
  * before any pretraining corpus ships — the GPT-3 appendix-C / PaLM style
  * "13-gram collision" sweep, here parameterized over n).
  *
  * Scale posture: the benchmark side is an eval suite — thousands of
  * documents, millions of n-grams at most — while the corpus is the 100 TB
  * side. So the benchmark's distinct n-gram hashes are broadcast and the
  * corpus is only ever map-scanned: shingle+hash per row (codegen), explode,
  * broadcast-hash semi-join. The single shuffle is the per-doc count of
  * MATCHED grams, whose input is bounded by contamination volume (rare by
  * construction), not corpus size. The corpus never repartitions.
  */
object Decontaminate {

  /** Hashed distinct n-gram set of a text column (60-bit md5 hashes; same
    * construction as the dedup family so DuckDB oracles replay it).
    */
  private def gramSet(text: Column, n: Int): Column =
    array_distinct(
      transform(TextFunctions.shingleSet(text, n), s => TextFunctions.hash61(s)))

  /** Per-document overlap counts against the benchmark:
    * (idCol, n_shared_ngrams) for every corpus document sharing at least one
    * distinct n-gram with any benchmark document. Anti-join the result
    * against the corpus to drop contaminated docs.
    *
    * `broadcastBenchmark=false` falls back to a shuffle hash join for
    * benchmark sets too large to broadcast (unusual — eval suites are small).
    */
  def ngramOverlap(
      corpus: DataFrame,
      idCol: String,
      textCol: Column,
      benchmark: DataFrame,
      benchTextCol: Column,
      n: Int = 3,
      broadcastBenchmark: Boolean = true): DataFrame = {
    val benchGrams = benchmark
      .select(explode(gramSet(benchTextCol, n)).as("g"))
      .distinct()
    val bench = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    // Per-doc grams are distinct (gramSet), bench grams are distinct, so the
    // post-join count(1) per doc IS the distinct shared-gram count — no
    // second distinct pass needed.
    Par.fan(corpus)
      .select(col(idCol), explode(gramSet(textCol, n)).as("g"))
      .join(bench, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }
}
