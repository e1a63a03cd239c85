package graft.queries

import graft.Tables
import graft.operators.Relational._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator surface (SURVEY.md §2) expressed on
  * the driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Conventions shared with the oracles (see Catalog):
  *   - double aggregates go through decimal(18,2) so partial-aggregation
  *     order can't perturb the result (order-independent exact sums), then
  *     cast back to double for a stable schema;
  *   - `events.ts` (nanos) is exposed as `ts_us = ts div 1000`, matching
  *     DuckDB's µs truncation of the same parquet;
  *   - every query ends in a deterministic ORDER BY with full tie-breaks.
  */
object RelationalQueries {

  private def revenue: Column =
    sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double")

  /** TPC-H Q1 shape (SURVEY §2.5 A3/A6/A7 — grouped running counts made
    * batch): scan-heavy aggregate; Catalyst pushes the shipdate filter and
    * prunes to 7 columns at the parquet scan. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        revenue.as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** KTable semantics (SURVEY §2.1 S2): latest event per user. */
  def s2LatestByKey(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("ts_us", expr("ts div 1000"))
    latestByKey(ev, Seq("user_id"), Seq(col("ts_us").desc, col("event_id").desc))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts_us"))
      .orderBy(col("user_id"))
  }

  /** Date-band filter (SURVEY §2.3 P4, reference TargetCustomerFilter's
    * decade band). Predicate reaches the parquet scan as a pushed filter. */
  def p4FilterDateband(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))

  /** Union-all merge (SURVEY §2.3 P5, reference `merge`). */
  def p5MergeUnion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click").select(col("event_type"), col("value"))
    val views = ev.filter(col("event_type") === "view").select(col("event_type"), col("value"))
    clicks.union(views)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Content-based routing (SURVEY §2.3 P6, reference 3-way branch in
    * PurchaseEventTicket). One routing column; N sinks share the scan. */
  def p6BranchRoute(s: SparkSession, d: String): DataFrame = {
    val routed = Tables.events(s, d).withColumn("route",
      route(col("value"), Seq(
        (col("value") >= 100, "HIGH"),
        (col("value") >= 20, "MID")), "LOW"))
    routed.groupBy(col("route"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("route"), col("event_type"))
  }

  /** Stringify + enrich (SURVEY §2.3 P7, reference AddressSortAndStringify
    * golden format). Nation joins broadcast (25 rows). */
  def p7Stringify(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"),
        concat(col("c_name"), lit(" ("), col("c_mktsegment"), lit(") ["),
          col("n_name"), lit("]")).as("line"))
      .orderBy(col("c_custkey"))
  }

  /** Composite-key build + parse (SURVEY §2.3 P2 and the split-at-last-hyphen
    * pitfall the reference tests encode) — kept to show the Kafka-ism and its
    * Spark-side disappearance: the parse is a single regexp, and grouping
    * would simply use both columns. */
  def p2RekeyRoundtrip(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"),
        concat(col("n_name"), lit("-"), col("c_custkey")).as("composite_key"))
      .withColumn("parsed_id", regexp_extract(col("composite_key"), "([0-9]+)$", 1).cast("long"))
      .orderBy(col("c_custkey"))
  }

  /** 4-way enrichment join pipeline (SURVEY §2.4 J5-J8): lineitem ⋈ orders ⋈
    * customer ⋈ nation ⋈ region rolled up by region/nation. Catalyst plans
    * broadcast joins for all dimension sides; the only shuffle is the final
    * aggregate exchange — exactly the plan you'd want at 100 TB. */
  def jMultiwayRevenue(s: SparkSession, d: String): DataFrame = {
    val li = fanout(Tables.lineitem(s, d))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Out-of-state sales analog (SURVEY §2.5 A4 + §2.4 quasi-theta note):
    * the inequality lives in a filter, not the join — customer nation ≠
    * supplier nation, counted per supplier. */
  def a4OutOfNation(s: SparkSession, d: String): DataFrame = {
    val li = fanout(Tables.lineitem(s, d))
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("out_cnt"), revenue.as("out_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Top-3 parts per customer (SURVEY §2.5 A1 + §2.6 T2, reference
    * TopCustomerArtists): count-per-(group, member), then windowed top-K with
    * deterministic tie-break (count desc, member asc — the stable-sort
    * equivalent of the reference's insertion-ordered counter map). */
  def a1Top3PartsPerCustomer(s: SparkSession, d: String): DataFrame = {
    val li = fanout(Tables.lineitem(s, d))
    val o = Tables.orders(s, d)
    val counted = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
    topKPerGroup(counted, Seq("o_custkey"), Seq(col("cnt").desc, col("l_partkey").asc), 3)
      .select(col("o_custkey"), col("l_partkey"), col("cnt"), col("rank"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** Top-3 part types per supplier nation (SURVEY §2.5 A5 + §2.4 J9/J10,
    * reference TopSellingGenreByVenue). */
  def a5Top3TypesPerNation(s: SparkSession, d: String): DataFrame = {
    val li = fanout(Tables.lineitem(s, d))
    val p = Tables.part(s, d)
    val sup = Tables.supplier(s, d)
    val counted = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_nationkey"), col("p_type"))
      .agg(count(lit(1)).as("cnt"))
    topKPerGroup(counted, Seq("s_nationkey"), Seq(col("cnt").desc, col("p_type").asc), 3)
      .select(col("s_nationkey"), col("p_type"), col("cnt"), col("rank"))
      .orderBy(col("s_nationkey"), col("rank"))
  }

  /** Capacity ledger (SURVEY §2.5 A2, reference PurchaseEventTicket):
    * first 5 events per user CONFIRMED, the rest REJECTED, remaining runs
    * negative — batch window form; streaming form in graft.streaming. */
  def a2CapacityLedger(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))
    capacityLedger(ev, "user_id", Seq(col("ts_us").asc, col("event_id").asc), 5)
      .select(col("user_id"), col("event_id"), col("seq"), col("status"), col("remaining"))
      .orderBy(col("user_id"), col("seq"))
  }

  /** Global top-K (SURVEY §2.6): top-10 customers by lifetime order value.
    * TakeOrderedAndProject — no global sort materializes. */
  def t2Top10Customers(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("rev").desc, col("o_custkey").asc)
      .limit(10)

  /** Distinct-cardinality aggregate (beyond the reference, which counts
    * only rows): exact distinct users per event type. At 100 TB switch to
    * approx_count_distinct (HLL) — exact distinct is a full shuffle of the
    * distinct pairs; both forms share this plan shape. */
  def a6DistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Hourly rollup (beyond the reference: event-time tumbling window, the
    * batch twin of the streaming windowed aggregate). Integer nano math on
    * both engines — no timestamp-precision hazard. */
  def w1HourlyRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
}
