package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking for RAG / training-sequence prep: split documents into
  * fixed-size word windows with configurable overlap.
  *
  * Spark-first shape: pure Catalyst expressions (`split` → `sequence` →
  * `slice` → `posexplode`), shuffle-free at any corpus size — chunking is
  * per-row, so the operator scales linearly with input splits and never
  * moves data. The words array is staged through its own projection and
  * referenced twice so CollapseProject does not re-inline the split into
  * the per-chunk lambda (the r2 lesson: interpreted HOF lambdas re-evaluate
  * referenced subtrees per element).
  */
object Chunking {

  /** Number-of-chunks expression for a word count `len`: 1 chunk when the
    * doc fits, else one chunk per `stride` words with the final window
    * starting before `len`.
    */
  private def nChunks(len: Column, chunkSize: Int, stride: Int): Column =
    when(len <= chunkSize, lit(1L)).otherwise(
      ceil((len - chunkSize).cast(DoubleType) / stride) + 1L)

  /** Split `textCol` into whitespace words and emit one row per chunk of
    * `chunkSize` words, consecutive chunks sharing `overlap` words.
    *
    * Output: (`idCol`, `chunk_idx` INT, `chunk_text` STRING, `n_words` INT).
    * The final chunk may be shorter than `chunkSize` (never shorter than
    * `overlap+1` words for multi-chunk docs); chunk `i` covers words
    * `[i*stride, i*stride + chunkSize)` with `stride = chunkSize - overlap`.
    */
  def chunkWords(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(
      overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): got $overlap for chunkSize $chunkSize")
    val stride = chunkSize - overlap
    // staged projection: __w referenced twice below keeps the split
    // un-inlined (one regex split per row, lambdas read the attribute)
    val staged = df.select(
      col(idCol),
      split(trim(textCol), "\\s+").as("__w"))
    val len = size(col("__w")).cast(LongType)
    staged
      .select(
        col(idCol),
        len.as("__len"),
        posexplode(
          transform(
            sequence(lit(0L), nChunks(len, chunkSize, stride) - 1L),
            i =>
              array_join(
                slice(col("__w"), (i * stride + 1L).cast(IntegerType), lit(chunkSize)),
                " "))).as(Seq("chunk_idx", "chunk_text")))
      .select(
        col(idCol),
        col("chunk_idx").cast(IntegerType).as("chunk_idx"),
        col("chunk_text"),
        least(lit(chunkSize.toLong), col("__len") - col("chunk_idx") * stride)
          .cast(IntegerType)
          .as("n_words"))
  }

  /** The chunk texts as an array column (disjoint segments when
    * `overlap = 0`) — the building block [[graft.ops.Dedup.dedupSegments]]
    * consumes. Evaluating this column re-runs the split per reference; when
    * chaining several word-window expressions over the same text, stage the
    * split once as its own projected column instead.
    */
  def wordWindows(textCol: Column, chunkSize: Int, overlap: Int = 0): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(
      overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): got $overlap for chunkSize $chunkSize")
    val stride = chunkSize - overlap
    val w = split(trim(textCol), "\\s+")
    transform(
      sequence(lit(0L), nChunks(size(w).cast(LongType), chunkSize, stride) - 1L),
      i => array_join(slice(w, (i * stride + 1L).cast(IntegerType), lit(chunkSize)), " "))
  }
}
