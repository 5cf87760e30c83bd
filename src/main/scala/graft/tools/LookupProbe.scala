package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.http.HttpLookup
import graft.http.testkit.StubServer

/** Scratch harness for lookup-join throughput experiments (not part of the
  * driver contract; run via `sbt "runMain graft.tools.LookupProbe"`).
  */
object LookupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    val t0 = System.nanoTime()
    val rows = spark.read.parquet(s"$dir/customer.parquet")
      .select(
        col("c_custkey").cast(StringType).as("key"),
        to_json(struct(col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))).as("payload"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val server = StubServer.serveOnly().route("/customer") { req =>
      StubServer.queryMap(req.query).get("c_custkey").flatMap(rows.get) match {
        case Some(json) => (200, json)
        case None => (404, """{"error":"not found"}""")
      }
    }
    server.start()
    println(f"[probe] stub setup: ${(System.nanoTime() - t0) / 1e9}%.2f s (${rows.size} keys)")

    val schema = StructType(Seq(
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))

    def run(label: String, threads: Int, partitions: Int): Unit = {
      val probe = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
      val t = System.nanoTime()
      val n = HttpLookup.join(probe, Seq("c_custkey"), schema, Map(
        "url" -> server.url("/customer"),
        "lookup-method" -> "GET",
        "asyncPolling" -> "true",
        "http.source.lookup.request.thread-pool.size" -> threads.toString,
        "http.source.lookup.partitions" -> partitions.toString,
        "http.source.lookup.dedup-keys" -> "true",
        // fresh cache id per run (cache key includes options map)
        "probe-run" -> label,
        "http.source.lookup.ignored-response-codes" -> "404")).count()
      val dt = (System.nanoTime() - t) / 1e9
      println(f"[probe] $label threads=$threads parts=$partitions: $dt%.2f s " +
        f"(${rows.size / dt}%.0f req/s) rows=$n")
    }

    val cfg = sys.env.getOrElse("PROBE_CFG", "8,32").split(",")
    run("cold", cfg(0).toInt, cfg(1).toInt)
    run("warm", cfg(0).toInt, cfg(1).toInt)
    sys.exit(0)
  }
}
