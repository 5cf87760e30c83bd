package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.StructType

import graft.http.{HttpLookup, HttpSink}
import graft.ops.{AnnEval, AsOfJoin, Bfs, BloomJoin, Bm25, Chunking, ConnectedComponents, CountMin, DataQuality, Dedup, Formats, HeavyHitters, Intervals, Multimodal, Packing, Pca, Quantize, RankEval, Sampling, Scd, Similarity, TfIdf, Unigram, Urls, WordPiece, Vocab, ZOrder}

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

    /** Streaming lookup join with a state-store-backed cache (survives
      * checkpointed restarts — Flink operator-state cache semantics).
      */
    def httpLookupStateCached(
        keyCols: Seq[String],
        responseSchema: StructType,
        options: Map[String, String],
        includeMetadata: Boolean = false): DataFrame =
      HttpLookup.joinStateCached(
        df, keyCols, responseSchema, options, includeMetadata)

    def chunkWords(
        idCol: String,
        textCol: Column,
        chunkSize: Int,
        overlap: Int = 0): DataFrame =
      Chunking.chunkWords(df, idCol, textCol, chunkSize, overlap)

    def dedupSegmentsWithinDoc(idCol: String, segments: Column): DataFrame =
      Dedup.dedupSegmentsWithinDoc(df, idCol, segments)

    def dedupSegments(
        idCol: String,
        segments: Column,
        sep: String = " ",
        skewSafe: Boolean = true): DataFrame =
      Dedup.dedupSegments(df, idCol, segments, sep, skewSafe)

    def dropFrequentSegments(
        idCol: String,
        segments: Column,
        minDocs: Long,
        sep: String = " ",
        groupCols: Seq[String] = Nil): DataFrame =
      Dedup.dropFrequentSegments(df, idCol, segments, minDocs, sep, groupCols)

    def semanticDedup(
        idCol: String,
        vecCol: String,
        threshold: Double = 0.95,
        planes: Int = 0): DataFrame =
      Similarity.semanticDedup(df, idCol, vecCol, threshold, planes)

    def dropNearSeenIn(
        textCol: String,
        seen: DataFrame,
        seenTextCol: String,
        threshold: Double = 0.5): DataFrame =
      Dedup.dropNearSeenIn(df, textCol, seen, seenTextCol,
        threshold = threshold)

    def dropSeenIn(
        textCol: String,
        seen: DataFrame,
        seenTextCol: String): DataFrame =
      Dedup.dropSeenIn(df, textCol, seen, seenTextCol)

    def bloomAntiJoin(
        probeKey: String,
        build: DataFrame,
        buildKey: String,
        expectedItems: Long = 0L,
        fpp: Double = BloomJoin.DefaultFpp): DataFrame =
      BloomJoin.antiJoin(df, probeKey, build, buildKey, expectedItems, fpp)

    def bloomSemiJoin(
        probeKey: String,
        build: DataFrame,
        buildKey: String,
        expectedItems: Long = 0L,
        fpp: Double = BloomJoin.DefaultFpp): DataFrame =
      BloomJoin.semiJoin(df, probeKey, build, buildKey, expectedItems, fpp)

    def exactQuantiles(
        idCol: String,
        value: Column,
        qs: Seq[Double]): DataFrame =
      Sampling.exactQuantiles(df, idCol, value, qs)

    def groupQuantiles(
        groupCols: Seq[String],
        idCol: String,
        value: Column,
        qs: Seq[Double]): DataFrame =
      Sampling.groupQuantiles(df, groupCols, idCol, value, qs)

    def groupTokenBudget(
        idCol: String,
        tokens: Column,
        score: Column,
        groupCol: String,
        budgets: Map[String, Long]): DataFrame =
      Sampling.groupTokenBudget(df, idCol, tokens, score, groupCol, budgets)

    def tokenBudgetSelect(
        idCol: String,
        tokens: Column,
        score: Column,
        budget: Long): DataFrame =
      Sampling.tokenBudgetSelect(df, idCol, tokens, score, budget)

    def quotaSample(
        idCol: String,
        k: Int,
        strataCols: Seq[String]): DataFrame =
      Sampling.quotaSample(df, idCol, k, strataCols)

    def keepOnePerCluster(idCol: String, pairs: DataFrame): DataFrame =
      Dedup.keepOnePerCluster(df, idCol, pairs)

    def pcaReduce(vecCol: String, k: Int, outCol: String = "pca"): DataFrame =
      Pca.reduce(df, vecCol, k, outCol)

    def tfidfScores(idCol: String, textCol: String): DataFrame =
      TfIdf.scoreDocs(df, idCol, textCol)

    def topKeywords(idCol: String, textCol: String, k: Int = 3): DataFrame =
      TfIdf.topKeywords(df, idCol, textCol, k)

    def bm25TopK(
        idCol: String,
        textCol: String,
        query: Seq[String],
        k: Int): DataFrame =
      Bm25.searchTopK(df, idCol, textCol, query, k)

    def asOfJoinLeft(
        leftTime: String,
        right: DataFrame,
        rightTime: String,
        keys: Seq[(String, String)],
        payload: Seq[String],
        tieBreak: Option[String] = None): DataFrame =
      AsOfJoin.leftAsOf(df, leftTime, right, rightTime, keys, payload, tieBreak)

    def quantizeInt8(idCol: String, vecCol: String): DataFrame =
      Quantize.quantize(df, idCol, vecCol)

    def quantizedTopK(
        idCol: String,
        vecCol: String,
        queries: DataFrame,
        queryId: String,
        queryVec: String,
        k: Int): DataFrame =
      Quantize.quantizedTopK(df, idCol, vecCol, queries, queryId, queryVec, k)

    def capPerDomain(idCol: String, urlCol: String, k: Int): DataFrame =
      Urls.capPerDomain(df, idCol, urlCol, k)

    def dedupByCanonicalUrl(idCol: String, urlCol: String): DataFrame =
      Urls.dedupByCanonicalUrl(df, idCol, urlCol)

    def heavyHitters(key: Column, k: Int): DataFrame =
      HeavyHitters.topK(df, key, k)

    def countMinSketch(key: Column, width: Int, depth: Int): DataFrame =
      CountMin.sketch(df, key, width, depth)

    def balancedShards(idCol: String, weight: Column, n: Int): DataFrame =
      Packing.balancedShards(df, idCol, weight, n)

    def zorderRepartition(
        keyCols: Seq[String],
        bits: Int,
        numPartitions: Int): DataFrame =
      ZOrder.zorderRepartition(df, keyCols, bits, numPartitions)

    def dropBlockedDomains(
        urlCol: String,
        blocked: DataFrame,
        blockedDomainCol: String): DataFrame =
      Urls.dropBlockedDomains(df, urlCol, blocked, blockedDomainCol)

    def containmentPairs(
        idCol: String,
        textCol: String,
        n: Int = 3,
        thresholdPpm: Long = 800000L): DataFrame =
      Dedup.containmentPairs(df, idCol, textCol, n, thresholdPpm)

    def vocabulary(
        textCol: String,
        minCount: Long = 1L,
        topV: Int = 1000): DataFrame =
      Vocab.vocabulary(df, textCol, minCount, topV)

    def pmiBigrams(
        textCol: String,
        minCount: Long = 5L,
        topP: Int = 100): DataFrame =
      Vocab.pmiBigrams(df, textCol, minCount, topP)

    def winsorize(
        groupCols: Seq[String],
        idCol: String,
        value: Column,
        pLo: Double,
        pHi: Double): DataFrame =
      Sampling.winsorize(df, groupCols, idCol, value, pLo, pHi)

    def snapshotDiffTo(
        newSnapshot: DataFrame,
        idCol: String,
        textCol: String): DataFrame =
      Dedup.snapshotDiff(df, newSnapshot, idCol, textCol)

    def dedupExactKeepBest(
        idCol: String,
        textCol: String,
        score: Column): DataFrame =
      Dedup.exactKeepBest(df, idCol, textCol, score)

    def fetchSlots(idCol: String, urlCol: String, slots: Int): DataFrame =
      Urls.fetchSlots(df, idCol, urlCol, slots)

    def mipsTopK(
        corpusId: String,
        corpusVec: String,
        queries: DataFrame,
        queryId: String,
        queryVec: String,
        k: Int): DataFrame =
      Quantize.mipsTopK(df, corpusId, corpusVec, queries, queryId, queryVec, k)

    def oovReport(
        textCol: String,
        groupCol: String,
        minCount: Long = 1L,
        topV: Int = 1000): DataFrame =
      Vocab.oovReport(df, textCol, groupCol, minCount, topV)

    def recallAgainst(
        truth: DataFrame,
        queryCol: String,
        neighborCol: String): DataFrame =
      AnnEval.recallAtK(df, truth, queryCol, neighborCol)

    /** Rank-aware eval of this ranked run against binary qrels
      * ([[RankEval.perQuery]]: MRR / integer-AP / hit@k).
      */
    def rankEvalAgainst(
        qrels: DataFrame,
        queryCol: String,
        docCol: String,
        rankCol: String,
        k: Int): DataFrame =
      RankEval.perQuery(df, qrels, queryCol, docCol, rankCol, k)

    /** Recall audit of this corpus's banded-MinHash config against the
      * lossless exact-Jaccard truth ([[Dedup.lshRecallReport]]).
      */
    def lshRecallReport(
        idCol: String,
        textCol: String,
        n: Int = 3,
        bands: Int = 4,
        threshold: Double = 0.5): DataFrame =
      Dedup.lshRecallReport(df, idCol, textCol, n, bands, threshold)

    /** Star-contraction CC over this pair frame — the arbitrary-diameter
      * alternative to [[keepOnePerCluster]]'s label propagation.
      */
    def connectedComponents(
        idA: String = "id_a",
        idB: String = "id_b"): DataFrame =
      ConnectedComponents.components(df, idA, idB)

    /** Systematic PPS sample: exactly `k` weight-proportional picks. */
    def systematicSample(
        idCol: String,
        weight: Column,
        k: Long): DataFrame =
      Sampling.systematicSample(df, idCol, weight, k)

    /** Deterministic global shuffle + contiguous shards. */
    def globalShuffle(
        idCol: String,
        seed: String = "shuffle",
        shardSize: Long = 64L): DataFrame =
      Packing.globalShuffle(df, idCol, seed, shardSize)

    /** Exact edit-distance pairs (FastSS deletion-neighborhood blocking). */
    def editDistancePairs(
        idCol: String,
        title: Column,
        maxDist: Int = 1): DataFrame =
      Dedup.editDistancePairs(df, idCol, title, maxDist)

    /** BFS min-hop layers from `seeds` over this edge list. */
    def crawlDepths(
        srcCol: String,
        dstCol: String,
        seeds: DataFrame,
        seedCol: String,
        maxDepth: Int): DataFrame =
      Bfs.depths(df, srcCol, dstCol, seeds, seedCol, maxDepth)

    /** Mutual top-1 pairs between this corpus (side A) and `b`. */
    def mutualTopPairs(
        idCol: String,
        vecCol: String,
        b: DataFrame,
        bId: String,
        bVec: String): DataFrame =
      Quantize.mutualTopPairs(df, idCol, vecCol, b, bId, bVec)

    /** Tukey IQR outlier filter with exact rank-selected fences. */
    def iqrFilter(idCol: String, value: Column, k: Double = 1.5): DataFrame =
      Sampling.iqrFilter(df, idCol, value, k)

    /** Source-interleaved training order (proportional every prefix). */
    def interleaveBySource(
        idCol: String,
        sourceCol: String,
        seed: String = "interleave"): DataFrame =
      Packing.interleaveBySource(df, idCol, sourceCol, seed)

    /** Exact-total largest-remainder slot allocation per group
      * ([[Sampling.apportion]]).
      */
    def apportion(groupCol: String, weight: Column, total: Long): DataFrame =
      Sampling.apportion(df, groupCol, weight, total)

    /** Minimal-movement rendezvous sharding ([[Packing.rendezvousAssign]]). */
    def rendezvousAssign(
        idCol: String,
        workers: Seq[String],
        outCol: String = "worker"): DataFrame =
      Packing.rendezvousAssign(df, idCol, workers, outCol)

    /** WordPiece greedy longest-match-first tokens ([[WordPiece.tokens]]). */
    def wordpieceTokens(
        textCol: Column,
        vocab: Seq[String] = WordPiece.Frozen): Column =
      WordPiece.tokens(textCol, vocab)

    /** Unigram-LM (SentencePiece-style) tokens for a frozen vocabulary. */
    def unigramTokens(
        textCol: Column,
        vocab: Seq[(String, Int)]): Column =
      Unigram.tokens(textCol, vocab)

    /** Positional posting lists (term, doc, tf, first position, df). */
    def postings(idCol: String, textCol: String): DataFrame =
      TfIdf.postings(df, idCol, textCol)

    /** Exact consecutive-word phrase matches with counts + positions. */
    def phraseMatches(
        idCol: String,
        textCol: String,
        phrase: Seq[String]): DataFrame =
      TfIdf.phraseMatches(df, idCol, textCol, phrase)

    /** RFC 9309 robots decisions (longest match, allow ties, agent groups). */
    def robotsDecisions(
        idCol: String,
        urlCol: String,
        rules: DataFrame,
        agent: String): DataFrame =
      Urls.robotsDecisions(df, idCol, urlCol, rules, agent)

    /** Raw robots.txt bodies → rule rows (groups, stacking, sitemap). */
    def parseRobots(idCol: String, textCol: String): DataFrame =
      Urls.parseRobots(df, idCol, textCol)

    /** Sitemap XML bodies → one frontier row per entry. */
    def parseSitemap(idCol: String, xmlCol: String): DataFrame =
      Urls.parseSitemap(df, idCol, xmlCol)

    /** Binary (optionally .xml.gz) sitemap blobs → frontier rows. */
    def parseSitemapBlobs(idCol: String, blobCol: String): DataFrame =
      Urls.parseSitemapBlobs(df, idCol, blobCol)

    /** Typed per-domain politeness: crawl-delay rules → exact ms. */
    def crawlDelayMs(agent: String): DataFrame =
      Urls.crawlDelayMs(df, agent)

    /** WARC record rows streamed from .warc(.gz) FILE paths. */
    def warcIngestFiles(
        pathCol: String,
        includePayload: Boolean = true): DataFrame =
      graft.ops.Warc.warcIngestFiles(df, pathCol, includePayload)

    /** Char-shingle MinHash near-dup pairs (unsegmented text). */
    def nearDupMinhashChars(
        idCol: String,
        textCol: String,
        n: Int = 5,
        bands: Int = 4,
        threshold: Double = 0.5): DataFrame =
      Dedup.minhashLshPairsChars(df, idCol, textCol, n, bands, threshold)

    /** Per-domain anchor-text mention counts feed from [[Urls.anchors]]. */
    def anchorsOf(htmlCol: Column): Column = Urls.anchors(htmlCol)

    /** Round-trip through an interchange format (orc/csv/json) with the
      * pinned byte-fidelity options ([[Formats.roundTrip]]).
      */
    def formatRoundTrip(format: String, dir: String): DataFrame =
      Formats.roundTrip(df, format, dir)

    /** Banded minhash LSH keys, batch or streaming
      * ([[Dedup.lshBandKeys]]).
      */
    def lshBandKeys(
        idCol: String,
        textCol: String,
        n: Int = 3,
        bands: Int = 4): DataFrame =
      Dedup.lshBandKeys(df, idCol, textCol, n, bands)

    /** Streaming dedup-on-ingest band-bucket registry
      * ([[Dedup.streamingLshRegistry]]).
      */
    def lshRegistry(
        idCol: String,
        textCol: String,
        n: Int = 3,
        bands: Int = 4): DataFrame =
      Dedup.streamingLshRegistry(df, idCol, textCol, n, bands)

    /** SCD-2 dimension history from a per-key observation log
      * ([[Scd.scd2History]]).
      */
    def scd2History(
        keyCols: Seq[String],
        attrCol: String,
        tsCol: String,
        tieCol: String): DataFrame =
      Scd.scd2History(df, keyCols, attrCol, tsCol, tieCol)

    /** CDC latest-wins snapshot from a keyed changelog with tombstones
      * ([[Scd.latestSnapshot]]).
      */
    def latestSnapshot(
        keyCols: Seq[String],
        tsCol: String,
        tieCol: String,
        isDelete: Column): DataFrame =
      Scd.latestSnapshot(df, keyCols, tsCol, tieCol, isDelete)

    /** Per-key interval-union coverage (gaps and islands)
      * ([[Intervals.coverage]]).
      */
    def intervalCoverage(
        keyCols: Seq[String],
        start: Column,
        end: Column,
        tie: Column): DataFrame =
      Intervals.coverage(df, keyCols, start, end, tie)

    /** Real JDK audio decode: per-sample integer amplitude statistics
      * ([[Multimodal.audioStats]]).
      */
    def audioStats(idCol: String, blobCol: String): DataFrame =
      Multimodal.audioStats(df, idCol, blobCol)

    /** Data-quality expectations: all row predicates in one aggregate
      * pass ([[DataQuality.predicateReport]]).
      */
    def qualityChecks(checks: Seq[(String, Column)]): DataFrame =
      DataQuality.predicateReport(df, checks)

    /** Per-node triangle counts over this edge list
      * ([[graft.ops.GraphStats.triangles]]).
      */
    def triangleCounts(srcCol: String, dstCol: String): DataFrame =
      graft.ops.GraphStats.triangles(df, srcCol, dstCol)

    /** Local clustering coefficients (exact integer ppm) over this edge
      * list ([[graft.ops.GraphStats.clusteringReport]]).
      */
    def clusteringCoefficients(srcCol: String, dstCol: String): DataFrame =
      graft.ops.GraphStats.clusteringReport(df, srcCol, dstCol)
  }

  /** Column-level sugar for the sign-quantization ladder end
    * ([[Quantize.signPack]] / [[Quantize.hamming]]).
    */
  implicit final class GraftSignOps(private val c: Column) extends AnyVal {
    def signPacked(dim: Int): Column = Quantize.signPack(c, dim)
    def hammingTo(other: Column): Column = Quantize.hamming(c, other)
  }
}
