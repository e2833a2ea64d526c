package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General relational workloads over the TPC-H-ish star schema — the
  * "would a reference user's ad-hoc SQL still run" surface beyond the
  * tick queries, and the heavy lifters for the scale bench.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1-flavored pricing summary: one scan, partial+final hash agg;
    * the shipdate filter pushes to the parquet scan. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 3).as("sum_qty"),
        round(sum("l_extendedprice"), 3).as("sum_base_price"),
        // off-grid accumulations go through exact decimals (order-proof)
        // product computed in exact decimal from the 2-dec grid inputs —
        // a double product cast to decimal is NOT cross-engine stable
        sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1.00 as decimal(3,2)) - cast(l_discount as decimal(18,2)))")).cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        (sum(col("l_discount").cast("decimal(20,6)")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-flavored shipping priority: broadcast the filtered customer
    * dim (1.5k rows at sf0.01 — broadcast, never shuffle), shuffle-join
    * orders><lineitem on the key, top-10 via TakeOrderedAndProject. */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("2000-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).cast("string").as("order_date"))
      .agg(sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1.00 as decimal(3,2)) - cast(l_discount as decimal(18,2)))")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Brand revenue: fact x part dim (broadcast — the part table is
    * fact/30 rows), revenue in exact decimal. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part").select("p_partkey", "p_brand")
    t(spark, dir, "lineitem")
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1.00 as decimal(3,2)) - cast(l_discount as decimal(18,2)))"))
          .cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  /** Supplier account summary — completes the star-schema coverage. */
  def supplierSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"), round(sum("s_acctbal"), 3).as("total_balance"))
      .orderBy("n_name")

  /** Multi-way dim join rollup: region -> nation -> customer -> orders,
    * all dims broadcast, one fact shuffle. */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").select("r_regionkey", "r_name")
    val nation = t(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    t(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 3).as("revenue"))
      .orderBy("r_name")
  }
}
