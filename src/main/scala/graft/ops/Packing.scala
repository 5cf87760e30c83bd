package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning tokenized documents to fixed-capacity
  * training sequences (the "pack to 4096 tokens" step between a cleaned
  * corpus and a training dataloader).
  *
  * Contiguous packing: documents are laid out in deterministic order and
  * cut into bins of `capacity` tokens by cumulative token count — bin id
  * and offset derive from a running sum, so the layout is reproducible
  * run-to-run and engine-to-engine (pure integer arithmetic).
  *
  * Scale posture: packing is inherently sequential WITHIN a stream, so the
  * corpus is split into `shards` deterministic shards per `partCols` group
  * (hash of the id), each packed independently — one window task per
  * (group, shard), bounded by shard size, not corpus size. That mirrors how
  * production packers shard: global packing order is not meaningful across
  * a distributed corpus, per-shard order is.
  */
object Packing {

  /** Pack documents into `capacity`-token bins within (partCols, shard).
    *
    * Output columns: partCols..., `shard`, doc id, `n_tokens`, `bin` (0-based
    * within the shard) and `bin_offset` (token offset where the document
    * starts inside its bin; a document whose tokens cross a bin boundary
    * starts in `bin` and spills forward, the standard contiguous layout).
    */
  def sequencePack(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      capacity: Long,
      partCols: Seq[String] = Nil,
      shards: Int = 16): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shards > 0, "shards must be positive")
    val shard = pmod(TextFunctions.hash61(col(idCol).cast("string")),
      lit(shards.toLong)).as("shard")
    val staged = Par.fan(df).select(
      (partCols.map(col) :+ col(idCol) :+ shard :+
        tokensCol.cast("long").as("n_tokens")): _*)
    val w = Window
      .partitionBy((partCols.map(col) :+ col("shard")): _*)
      .orderBy(col(idCol))
    val cumBefore =
      coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L))
    // integer `div`, not `/` (double division would round past 2^53)
    staged
      .withColumn("__cum", cumBefore)
      .withColumn("bin", expr(s"__cum div ${capacity}L"))
      .withColumn("bin_offset", expr(s"__cum % ${capacity}L"))
      .drop("__cum")
  }
}
