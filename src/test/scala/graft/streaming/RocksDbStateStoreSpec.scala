package graft.streaming

import java.io.File

import graft.SparkSpec

/** Cross-provider state-store posture for the stateful streaming gates.
  *
  * The driver gates exercise the DEFAULT (HDFS-backed, in-memory map)
  * state store provider; at 100 TB state the RocksDB provider is the
  * deployment reality (state larger than executor heap, incremental
  * checkpointing). Provider choice must be a pure deployment knob: this
  * spec re-runs one gate from each stateful-operator family —
  * watermarked dedup (`dropDuplicates` state), windowed aggregation
  * (agg state), and the stream-stream interval join (symmetric join
  * state, the most provider-sensitive machinery) — under
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` and requires row-for-row identical output
  * vs the default provider.
  *
  * Documented in SURVEY par.5 (state-store posture).
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def runGate(name: String): Seq[String] = {
    val out = graft.SparkEntry.queries(name)(spark, dir)
    try out.collect().map(_.toString).sorted.toSeq
    finally graft.ops.Par.releaseCaches()
  }

  private def crossProvider(gate: String): Unit = {
    assume(new File(dir).isDirectory, s"driver testdata not present at $dir")
    val defaultRows = runGate(gate)
    defaultRows should not be empty
    val before = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val rocksRows = runGate(gate)
      withClue(s"$gate: RocksDB provider diverged from the default provider") {
        rocksRows shouldBe defaultRows
      }
    } finally before match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("watermarked dedup state is provider-independent (RocksDB)") {
    crossProvider("q_stream_dedup_watermark")
  }

  test("windowed aggregation state is provider-independent (RocksDB)") {
    crossProvider("q_stream_events_hourly")
  }

  test("stream-stream interval join state is provider-independent (RocksDB)") {
    crossProvider("q_stream_range_join")
  }

  test("checkpoint RESTART recovers RocksDB dedup state (provider-independent)") {
    // q_stream_restart internally stops mid-stream and restarts from its
    // checkpoint — under RocksDB this exercises the provider's
    // snapshot-upload + restore path, the machinery a 100 TB-state
    // deployment actually leans on
    crossProvider("q_stream_restart")
  }
}
