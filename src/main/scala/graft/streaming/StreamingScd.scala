package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming SCD-2 history via `flatMapGroupsWithState` — the streaming
  * twin of [[graft.ops.Scd.scd2History]] and the batch/stream pairing the
  * reference's temporal-table changelog view gives Flink users: the
  * dimension history builds INCREMENTALLY as the changelog streams in.
  *
  * Emission contract (append mode): a version row is emitted when its run
  * CLOSES — an observation with a different attribute value arrives and
  * supplies the half-open `eff_to`. The open (current) run lives only in
  * state and is never emitted, exactly like open sessions in
  * [[StreamingSessions]] — so the gated oracle is the batch history
  * MINUS each key's open row (`eff_to IS NOT NULL`).
  *
  * Timestamps travel as epoch MICROS (`Long`): the events fixture is
  * microsecond-grained and `java.sql.Timestamp.getTime` truncates to
  * millis, which would silently break both within-key ordering and the
  * epoch_us oracle hash.
  *
  * State per key: the open run (attribute, eff_from, closed-run count) —
  * O(keys), partitioned by the grouping key, the standard stateful-
  * operator shape; provider-independent (replayed under RocksDB with the
  * other streaming gates).
  *
  * Ordering contract: observations are sorted by `(us, tie)` WITHIN a
  * micro-batch, but an append-only history cannot retro-insert — a key's
  * observations must arrive in event-time order ACROSS micro-batches
  * (the reference's temporal tables get this from event-time watermarks;
  * here the source must deliver per-key in order, e.g. a keyed log).
  * An observation older than the key's event-time FRONTIER (the max us
  * already folded into its history — not just the open run's eff_from:
  * an arrival inside the open run would retro-split it) is DROPPED —
  * the same fate watermark-late rows meet in a streaming aggregation —
  * rather than silently corrupting run boundaries and mis-numbering
  * every later version. Drops are OBSERVABLE: pass `lateDrops` (a
  * registered [[LongAccumulator]]) and every cross-batch late drop
  * increments it — the numRowsDroppedByWatermark analog for this
  * operator, so an out-of-order source violating the ordering contract
  * is detectable in production rather than silently diverging from the
  * batch history. (Accumulator semantics: task retries can overcount —
  * fine for a detection signal, not a ledger.)
  */
object StreamingScd {

  /** One changelog observation; `us` = event-time epoch micros, `tie`
    * breaks equal timestamps (the batch op's tieCol).
    */
  final case class Obs(key: Long, us: Long, tie: Long, attr: String)

  /** The open run: `attr` is Option so a null attribute is a tracked
    * state, matching the batch op's null-safe `<=>` change detection.
    * `frontierUs` is the max event time already folded into this key's
    * history (≥ effFromUs: unchanged-attr observations advance it) —
    * the late-arrival cutoff.
    */
  final case class OpenRun(
      attr: Option[String],
      effFromUs: Long,
      nClosed: Int,
      frontierUs: Long)

  final case class ClosedVersion(
      key: Long,
      version: Int,
      attr: String,
      eff_from_us: Long,
      eff_to_us: Long)

  def history(
      obs: Dataset[Obs],
      lateDrops: Option[LongAccumulator] = None): Dataset[ClosedVersion] = {
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(
        (key: Long, batch: Iterator[Obs], state: GroupState[OpenRun]) => {
          val sorted = batch.toSeq.sortBy(o => (o.us, o.tie))
          val closed =
            scala.collection.mutable.ArrayBuffer.empty[ClosedVersion]
          var current = state.getOption
          sorted.foreach { o =>
            val attr = Option(o.attr)
            current match {
              case Some(run) if o.us < run.frontierUs =>
                // late cross-batch arrival: older than event time already
                // folded into this key's history (NOT just the open run's
                // eff_from — an arrival INSIDE the open run would also
                // retro-split it). Dropped per the ordering contract
                // above, and counted so the drop is observable.
                lateDrops.foreach(_.add(1L))
              case Some(run) if run.attr == attr =>
                // unchanged: same run, but the frontier advances
                current = Some(run.copy(frontierUs = o.us))
              case Some(run) =>
                closed += ClosedVersion(
                  key,
                  run.nClosed + 1,
                  run.attr.orNull,
                  run.effFromUs,
                  o.us)
                current = Some(OpenRun(attr, o.us, run.nClosed + 1, o.us))
              case None =>
                current = Some(OpenRun(attr, o.us, 0, o.us))
            }
          }
          current.foreach(state.update)
          closed.iterator
        })
  }
}
