package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StructType

import graft.http.{HttpLookup, HttpSink}
import graft.ops.{AsOfJoin, Dedup, Multimodal, Similarity}

/** Fluent entry points: `import graft.syntax._` and every operator hangs off
  * DataFrame — the one-line switch path for users of the reference connector
  * (their `CREATE TABLE ... WITH ('connector'='http')` options map is passed
  * through verbatim as `options`).
  */
object syntax {

  implicit final class GraftDataFrameOps(private val df: DataFrame)
      extends AnyVal {

    /** HTTP enrichment lookup join (reference: the `http` lookup connector
      * used via `FOR SYSTEM_TIME AS OF` joins). Works on batch and streaming
      * DataFrames.
      */
    def httpLookup(
        keyCols: Seq[String],
        responseSchema: StructType,
        options: Map[String, String],
        includeMetadata: Boolean = false): DataFrame =
      HttpLookup.join(df, keyCols, responseSchema, options, includeMetadata)

    /** HTTP sink (reference: the `http-async-sink` connector). For streams
      * use `writeStream.foreachBatch(HttpSink.foreachBatchWriter(options))`.
      */
    def writeHttp(
        options: Map[String, String],
        payload: Option[Column] = None): Unit =
      HttpSink.write(df, options, payload)

    // ----- training-data pipeline operators -----

    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exact(df, idCol, textCol)

    def nearDupMinhashLsh(
        idCol: String,
        textCol: String,
        n: Int = 3,
        bands: Int = 4,
        threshold: Double = 0.5): DataFrame =
      Dedup.minhashLshPairs(df, idCol, textCol, n, bands, threshold)

    def nearDupJaccard(
        idCol: String,
        textCol: String,
        blockCols: Seq[String],
        n: Int = 3,
        threshold: Double = 0.5): DataFrame =
      Dedup.ngramJaccardPairs(df, idCol, textCol, blockCols, n, threshold)

    def nearDupSimhash(
        idCol: String,
        textCol: String,
        blockCols: Seq[String],
        maxHamming: Int = 2): DataFrame =
      Dedup.simhashPairs(df, idCol, textCol, blockCols, maxHamming)

    def winnowFingerprints(
        idCol: String,
        textCol: String,
        n: Int = 3,
        w: Int = 4): DataFrame =
      Dedup.winnowingFingerprints(df, idCol, textCol, n, w)

    def cosineTopK(
        idCol: String,
        vecCol: String,
        queries: DataFrame,
        queryId: String,
        queryVec: String,
        k: Int): DataFrame =
      Similarity.bruteForceTopK(df, idCol, vecCol, queries, queryId, queryVec, k)

    def cosineTopKLsh(
        idCol: String,
        vecCol: String,
        queries: DataFrame,
        queryId: String,
        queryVec: String,
        k: Int,
        planes: Int = 8): DataFrame =
      Similarity.lshTopK(df, idCol, vecCol, queries, queryId, queryVec, k, planes)

    def mediaMeta(idCol: String, blobCol: String): DataFrame =
      Multimodal.extractMeta(df, idCol, blobCol)

    def asOfJoinLeft(
        leftTime: String,
        right: DataFrame,
        rightTime: String,
        keys: Seq[(String, String)],
        payload: Seq[String],
        tieBreak: Option[String] = None): DataFrame =
      AsOfJoin.leftAsOf(df, leftTime, right, rightTime, keys, payload, tieBreak)
  }
}
