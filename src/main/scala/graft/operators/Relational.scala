package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator library: the reference's stream-processing surface
  * (SURVEY.md §2) re-expressed as declarative Dataset transforms.
  *
  * Everything here is a pure `DataFrame => DataFrame` so Catalyst sees one
  * logical plan end-to-end (predicate pushdown / column pruning / join
  * reordering work across operator boundaries).
  */
object Relational {

  /** KTable semantics (SURVEY §2.1 S2, reference `builder.table(...)` at
    * samples/PurchaseEventTicket.java:44-51): latest value per key.
    *
    * Scale: one shuffle on the key columns; at 100 TB this is the standard
    * dedup-by-key pattern (window + rn=1) which AQE handles with skew-join
    * splitting. No state is held beyond the shuffle; for the streaming
    * variant see [[graft.streaming.StatefulOps.latestByKey]].
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-K rows per group with deterministic tie-breaks (SURVEY §2.6 T1/T2,
    * reference `SortedCounterMap.top(3)` at samples/TopCustomerArtists.java:125-129).
    *
    * The reference re-sorts its whole counter map on every record; here the
    * sort happens once, post-aggregation, inside a partitioned window — the
    * per-group data after aggregation is small (one row per distinct group
    * member), so this survives 100× scale as long as group cardinality does.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], rank: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(rank: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Capacity-countdown ledger (SURVEY §2.5 A2, reference
    * samples/PurchaseEventTicket.java:68-94): per key, requests are processed
    * in arrival order against a fixed capacity; the first `capacity` are
    * CONFIRMED, the rest REJECTED, and `remaining` runs down (and goes
    * negative, mirroring the reference's golden test
    * samples/PurchaseEventTicketTest.java:77-139).
    *
    * Batch form: a rank over (key, arrival order) — fully declarative, no
    * per-key sequential state, scales as a single shuffle. The streaming
    * form that needs true running state lives in
    * [[graft.streaming.StatefulOps.capacityLedger]].
    */
  def capacityLedger(df: DataFrame, key: String, order: Seq[Column], capacity: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("seq", row_number().over(w))
      .withColumn("status",
        when(col("seq") <= capacity, lit("CONFIRMED")).otherwise(lit("REJECTED")))
      .withColumn("remaining", lit(capacity) - col("seq"))
  }

  /** Content-based routing (SURVEY §2.3 P6, reference `split()/branch()` at
    * samples/PurchaseEventTicket.java:97-158): a routing column computed once;
    * downstream sinks filter on it. In Spark N filtered sinks off one plan
    * share the scan, so the Kafka-Streams branch operator reduces to
    * `when/otherwise`.
    */
  def route(c: Column, tiers: Seq[(Column, String)], default: String): Column =
    tiers.foldRight(lit(default): Column) { case ((cond, name), acc) =>
      when(cond, lit(name)).otherwise(acc)
    }

  /** Scan fan-out: redistribute a skinny scan across the cluster before
    * CPU-heavy per-row work (multi-join pipelines, wide partial aggregates).
    *
    * Parquet splits at row-group boundaries, so a file with few huge row
    * groups (or a small file under `files.maxPartitionBytes`) scans as a
    * handful of tasks no matter how many cores exist — and every downstream
    * narrow stage (broadcast joins, partial aggregation) inherits that
    * parallelism. One round-robin exchange right after the scan costs a
    * single pass over the rows and unlocks full-width execution. Use on the
    * fact side only when the downstream is compute-bound; well-laid-out
    * sources at scale (many row groups) don't need it.
    */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact money arithmetic for aggregation: cast a 2-dp double column to
    * decimal so sums are order-independent (a 100 TB shuffle sums partials in
    * nondeterministic order; double addition is not associative, decimal is).
    * Final results cast back to double for a stable output schema.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Display rounding to 4 dp via `floor(x·10⁴ + 0.5)/10⁴` — pure IEEE
    * multiply/add/floor/divide, so Spark and DuckDB agree bit-for-bit.
    * The engines' native `round(x, 4)` functions disagree at half-boundaries
    * (Spark: BigDecimal HALF_UP on the exact double; DuckDB: scaled
    * multiply) — observed as a 0.7263-vs-0.7262 oracle mismatch at sf0.1. */
  def round4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
}
