package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Num, Tables}

/** General relational checks on the TPC-H-ish tables — the SQL surface the
  * reference gets from ClickHouse on top of its schema (SURVEY.md §2.6), so
  * our engine demonstrates it natively: multi-way joins, semi-joins,
  * broadcast dimension joins, grouped aggregates, window functions.
  *
  * Scale notes: dimension tables (part, supplier, nation, region, customer)
  * are broadcast — the lineitem fact never shuffles for them; fact-fact
  * joins (orders×lineitem) shuffle on the join key once and AQE handles
  * skew. Aggregates are partial/final hash aggregates.
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: scan-heavy grouped aggregate over the
    * fact table; the shipdate predicate pushes down to parquet.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsumProduct(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        Num.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style shipping priority: 3-way join, grouped revenue, top-10.
    * customer is broadcast; orders×lineitem shuffles on the order key.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(Num.dsumProduct(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style: revenue by nation through the supplier hierarchy —
    * chain of broadcast joins (region→nation→supplier are all tiny).
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(Num.dsumProduct(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("n_name")

  /** TPC-H Q4-style: order-priority counts gated on an EXISTS (left-semi
    * join with a non-equi condition on top of the equi key).
    */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Fact × broadcast part dimension, per-brand rollup. */
  def brandVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        Num.dsumProduct(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** Window-function top-N: first two shipments per supplier by ship date.
    * Single shuffle on the window partition key.
    */
  def supplierFirstShipments(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long")) // long: oracle schema parity
      .filter(col("rn") <= 2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "rn")
      .orderBy("l_suppkey", "rn")
  }
}
