package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third wave of driver-gated coverage: argmin-per-group join-back,
  * having-filters on aggregates, multi-distinct counts, regex tokenization.
  */
object MoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def dec2(c: Column) = c.cast(DecimalType(18, 2))

  /** Portable word-or-number-or-symbol token pattern (Java and RE2-safe). */
  private val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- Q2-style argmin: cheapest part per brand, join back for detail --
    "q02_min_price_part" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val w = Window
        .partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      part
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("p_brand"),
          col("p_partkey"),
          col("p_name"),
          dec2(col("p_retailprice")).cast(DoubleType).as("min_price"))
    },

    // ----- Q18-style: customers with total spend above a threshold -----
    "q18_big_spenders" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val spend = ord
        .groupBy(col("o_custkey"))
        .agg(
          round(sum(dec2(col("o_totalprice"))), 2).cast(DoubleType)
            .as("total_spend"),
          count(lit(1)).as("n_orders"))
        .filter(col("total_spend") > 1500000.0d)
      spend
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"),
          col("c_name"),
          col("c_mktsegment"),
          col("total_spend"),
          col("n_orders"))
    },

    // ----- Q16-style: supplier/part-type diversity counts -----
    "q16_part_type_counts" -> { (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_type"), col("p_size"))
        .agg(
          countDistinct(col("p_brand")).as("n_brands"),
          count(lit(1)).as("n_parts"),
          round(sum(dec2(col("p_retailprice"))), 2).cast(DoubleType)
            .as("sum_price"))
    },

    // ----- regex tokenization (BPE-ish splitting: words / numbers / symbols) --
    "t_regex_tokens" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(TokenRe), lit(0)))
            .as("n_regex_tokens"),
          size(array_distinct(
            regexp_extract_all(col("text"), lit(TokenRe), lit(0))))
            .as("n_uniq_regex_tokens"))
    },

    // ----- pivot: spend per priority x status as columns (explicit value
    // list = deterministic schema; SUM not COUNT so an empty cell is NULL
    // in both engines) -----
    "q_pivot_status" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(dec2(col("o_totalprice"))), 2).cast(DoubleType))
    },

    // ----- unpivot/melt: lineitem rate columns to long format -----
    "q_unpivot_rates" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(
            dec2(col("l_quantity")).cast(DoubleType).as("l_quantity"),
            dec2(col("l_discount")).cast(DoubleType).as("l_discount"),
            dec2(col("l_tax")).cast(DoubleType).as("l_tax")),
          "measure",
          "value")
    },

    // ----- GROUPING SETS (beyond rollup/cube: an explicit set list with
    // the region-only and segment-only marginals plus the grand total) --
    "q_grouping_sets" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(
          broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(
          broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("c_mktsegment")), Seq()),
          col("r_name"),
          col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum(dec2(col("c_acctbal"))), 2).cast(DoubleType)
            .as("sum_acctbal"))
    })

  val oracles: Map[String, String] = Map(
    "q02_min_price_part" ->
      """SELECT p_brand, p_partkey, p_name,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS min_price
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice ASC, p_partkey ASC) AS rn
        |  FROM part)
        |WHERE rn = 1""".stripMargin,
    "q18_big_spenders" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spend,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |  HAVING CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) > 1500000.0)
        |SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders
        |FROM spend JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q16_part_type_counts" ->
      """SELECT p_type, p_size,
        |  count(DISTINCT p_brand) AS n_brands,
        |  count(*) AS n_parts,
        |  CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_type, p_size""".stripMargin,
    "t_regex_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_regex_tokens,
        |  len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS n_uniq_regex_tokens
        |FROM documents""".stripMargin,
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'O'), 2) AS DOUBLE) AS O,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'F'), 2) AS DOUBLE) AS F,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (o_orderstatus = 'P'), 2) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_unpivot_rates" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |  CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE)
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax',
        |  CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE)
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin,
    "q_grouping_sets" ->
      """SELECT r_name, c_mktsegment, count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())""".stripMargin
  )
}
