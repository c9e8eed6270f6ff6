package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Relational analytics surface over the TPC-H-ish fixture tables.
  *
  * The reference has no aggregation/join surface (SURVEY §2.4-2.5); this
  * module supplies the analytics a user runs over the persisted `documents`
  * store and the star schema. Everything is declarative DataFrame code so
  * Catalyst gets pushdown/pruning/join-selection for free.
  *
  * Scale posture (100 TB): joins between big fact tables shuffle on join
  * keys (sort-merge, AQE may promote to broadcast when a side is small);
  * `region`/`nation` are always broadcast (25 rows at any SF). Aggregations
  * are partial (map-side combine) by construction — `groupBy.agg` over
  * codegen'd exprs. No driver-side loops, no collects.
  *
  * Determinism note: double sums are order-dependent under parallel
  * aggregation, so every money aggregate converts its per-row term to exact
  * integer cents (`round(x*100)` — tie-free, because a 2-decimal value
  * stored as a double never lands exactly on .5 after *100), accumulates
  * exactly in a wide decimal, and casts the exact sum back to double only
  * at the end. This makes results bit-identical across partitionings AND
  * across engines (the DuckDB oracle mirrors the arithmetic) — a
  * correctness property, not a fixture hack. Discounted revenue
  * additionally keeps the product exact: cents * (100 - discount_cents)
  * is integer arithmetic, so there is no per-row decimal rounding of
  * `price*(1-discount)` for the two engines to disagree on.
  */
object Analytics {

  private val Wide = DecimalType(38, 0)
  /** Exact integer cents of a 2-decimal double. */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)
  /** Exact sum of a 2-decimal money column, returned as double. */
  private def dsum(c: Column): Column =
    (sum(cents(c).cast(Wide)).cast(DoubleType) / 100.0)
  /** Exact sum of price*(1-discount) over 2-decimal price/discount. */
  private def dsumDisc(price: Column, disc: Column): Column =
    (sum((cents(price) * (lit(100L) - cents(disc))).cast(Wide))
      .cast(DoubleType) / 10000.0)

  /** Q1-style pricing summary: scan-heavy groupBy with 8 aggregates.
    * Map-side partial agg collapses 600k rows to ~8 groups per partition
    * before the shuffle. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumDisc(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q3-style shipping priority: 3-way join + agg + top-10.
    * customer/orders join shuffles on custkey, then orders/lineitem on
    * orderkey; AQE broadcasts the filtered customer side when small. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast(TimestampType))
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style local-supplier revenue: 6-way join, broadcast dims.
    * nation/region are broadcast explicitly — they are constant-size (25/5
    * rows) at ANY scale factor, so this is always the right plan. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1994-01-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val l = Tables.load(spark, dir, "lineitem")
    val s = Tables.load(spark, dir, "supplier")
    val n = broadcast(Tables.load(spark, dir, "nation"))
    val r = broadcast(Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
               col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window top-k: 3 highest-value orders per order priority.
    * Shuffles once on the partition key; ties broken by o_orderkey so the
    * result is deterministic. */
  def topkOrdersPerPriority(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
              col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Rollup over documents: counts + char totals by (lang, source).
    * Exercises grouping sets; `lang` is deliberately skewed in the fixture
    * — partial agg + AQE absorb the skew (no hot reducer at scale). */
  def docRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  /** Cube over documents: all grouping-set combinations of
    * (lang, source) — the full §2.13 grouping-sets surface next to
    * docRollup's ROLLUP. */
  def docCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  /** Brand-level part stats — exercises the `part` table: exact-cents
    * retail price sums + size spread per brand. */
  def partsByBrand(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("sum_retail"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand"))
  }

  /** Set ops: nations that have customers but no suppliers (EXCEPT). */
  def nationsCustomersNotSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.except(s).orderBy(col("nationkey"))
  }

  /** Left-semi join: customers that placed at least one order.
    * Semi-join ships only the join key — no payload duplication. */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: customers with no orders. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Exact median + spread of order totals per priority. Exact percentile
    * is acceptable here because cardinality per group is modest after
    * partial agg; at 100 TB swap `percentile` for `percentile_approx`. */
  def orderPriceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }
}
