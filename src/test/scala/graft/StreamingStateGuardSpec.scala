package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming twin of [[PlanGuardSpec]] (r14, per the r13 verdict): pins
  * each named streaming gate's STATE-OPERATOR inventory — the operator
  * names and counts Spark reports in `StreamingQueryProgress`. A Spark
  * upgrade or refactor that silently changes the stateful shape (an
  * extra aggregation state store, a dedup that stops being
  * within-watermark, a static join that starts keeping state) fails here
  * instead of only showing up as checkpoint growth in production.
  *
  * Mechanism: a [[StreamingQueryListener]] captures the last
  * non-empty state-operator set per query name while the REAL gates run
  * at sf0.001 — no duplicated query definitions, the gates themselves
  * are the units under guard.
  */
class StreamingStateGuardSpec extends AnyFunSuite with Matchers {

  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  /** gate -> (progress query name, expected operatorName -> count) */
  private val pinned: Seq[(String, String, Map[String, Int])] = Seq(
    ("q_stream_events_hourly", "q_stream_events_hourly_out",
      Map("stateStoreSave" -> 1)),
    ("q_stream_dedup_watermark", "q_stream_dedup_watermark_out",
      Map("dedupeWithinWatermark" -> 1)),
    // static joins are STATELESS by design — state here means a broken
    // plan (the stream side started buffering)
    ("q_stream_static_join", "q_stream_static_join_out", Map.empty),
    ("q_stream_sessions", "q_stream_sessions_out",
      Map("flatMapGroupsWithState" -> 1)),
    ("q_stream_scd2", "q_stream_scd2_out",
      Map("flatMapGroupsWithState" -> 1)),
    ("q_stream_range_join", "q_stream_range_join_out",
      Map("symmetricHashJoin" -> 1)),
    // both dedup registries are keep-min AGGREGATIONS (state = one row
    // per content hash / band bucket), not fMGWS — one agg state store
    ("p_stream_exact_dedup", "p_stream_exact_dedup_out",
      Map("stateStoreSave" -> 1)),
    ("p_stream_lsh_dedup", "p_stream_lsh_registry_out",
      Map("stateStoreSave" -> 1)))

  test("streaming gates keep their state-operator inventories") {
    assume(
      new java.io.File(dir).isDirectory,
      s"needs the driver-generated testdata at $dir")
    // last non-empty operator inventory per query name (batch 0 of an
    // AvailableNow pass can report before state operators materialize)
    val seen = TrieMap[String, Map[String, Int]]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val name = e.progress.name
        if (name != null) {
          val ops = e.progress.stateOperators
            .groupBy(_.operatorName)
            .map { case (k, v) => k -> v.length }
          seen.get(name) match {
            case Some(prev) if ops.isEmpty && prev.nonEmpty => ()
            case _ => seen.put(name, ops)
          }
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      pinned.foreach { case (gate, _, _) =>
        SparkEntry.queries(gate)(spark, dir).count()
        graft.ops.Par.releaseCaches()
      }
      // the listener bus is async: wait until every pinned query reported
      // a SATISFYING inventory — name presence alone is not enough (an
      // empty batch-0 event can land before the real non-empty one)
      def settled(p: (String, String, Map[String, Int])): Boolean =
        seen.get(p._2).exists(got => p._3.isEmpty || got.nonEmpty)
      val deadline = System.currentTimeMillis() + 30000L
      while (!pinned.forall(settled) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally spark.streams.removeListener(listener)

    val failures = pinned.flatMap { case (gate, qName, expected) =>
      seen.get(qName) match {
        case None => Some(s"$gate: no progress observed for query $qName")
        case Some(got) if got != expected =>
          Some(s"$gate: state operators $got != pinned $expected")
        case _ => None
      }
    }
    withClue("state-operator inventory drift: ") {
      failures shouldBe empty
    }
  }
}
