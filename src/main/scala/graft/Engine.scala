package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's standard tuning.
  *
  * Local testing runs `local[32]` in one JVM, but every knob here is chosen
  * for the 1000-executor / 100 TB deployment shape and merely scaled down:
  *   - AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
  *     partition counts at any scale.
  *   - shuffle.partitions=32 locally (= cores); on a real cluster this is
  *     overridden per-deploy (2-3x total cores) and AQE coalesces down.
  *   - autoBroadcastJoinThreshold left at default (10 MB): dimension tables
  *     (region/nation/customer/supplier/part at TPC-H-ish ratios) broadcast;
  *     fact-fact joins shuffle. We additionally hint `broadcast()` where the
  *     dimension side is known-small by construction.
  */
object Engine {
  /** Silence WindowExec's "No Partition Defined" warning — called ONLY by
    * the Bench/Verify mains, where the engine's one deliberately-global
    * window (`x3_moving_avg`, calendar-bounded input — see its scaladoc)
    * fires it as pure noise on every measured run. Interactive sessions
    * (this factory) deliberately KEEP the warning: for any future
    * accidentally-unpartitioned window it is exactly the signal that
    * matters, and a level-based suppression here would hide it JVM-wide. */
  def tuneLogging(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def session(appName: String = "graft", cores: String = "32"): SparkSession = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // dimension tables up to orders-size broadcast in local bench; on a
      // real cluster this is a per-deploy knob (default 10m is conservative)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // if events.parquet carries timestamp[ns], read it as LongType nanos
      // so no precision is silently dropped (Tables.tsToMicros then
      // normalizes either ns-as-long or µs-as-timestamp to int64 µs).
      // CONTRACT: this flag is the ONLY source of a LongType ts, so
      // tsToMicros may treat long == nanos unconditionally; a physical
      // int64-µs column would break that silently and is caught by
      // EventsTsDriftSpec's live-testdata range check each round.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Streaming state lives in RocksDB, matching the reference's
      // RocksDB-backed stores (samples/TopCustomerArtists.java:79,
      // phase3/OutOfStateSales.java:80): state size is bounded by local
      // disk, not executor heap — the difference between a demo and a
      // deployment once keyed state outgrows memory. All streaming specs
      // run under this provider (SparkSpec sets the same).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val withMaster =
      if (SparkSession.getActiveSession.isDefined) b
      else b.master(s"local[$cores]")
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Uniform batch access to the driver-generated parquet tables.
  *
  * At 100 TB these reads are the scan edge: keep them bare `spark.read.parquet`
  * so Catalyst's parquet source handles column pruning + predicate pushdown +
  * partition pruning; never materialize or cache a full table here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // If events.parquet stores timestamp[ns], read it as int64 nanos
    // (exact) regardless of which session built us — the driver's
    // Verify/Bench sessions don't go through Engine.session. (A µs file
    // is unaffected by this flag; tsToMicros below handles both.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` normalized to int64 epoch-MICROS, whatever the parquet
    * physically stores. The driver's generator has shipped both
    * timestamp[ns] (read as int64 nanos via nanosAsLong) and
    * timestamp[us] (read as TIMESTAMP_NTZ) across rounds; this is the
    * single compatibility point — every downstream query sees `ts` as
    * int64 µs, which is exactly DuckDB's `epoch_us(ts)` of the same
    * file. All engine sessions run with session.timeZone=UTC, so the
    * NTZ→LTZ cast below is the identity on the stored wall-clock value. */
  def tsToMicros(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val us = df.schema("ts").dataType match {
      // CONTRACT: a LongType ts can only be the nanosAsLong read of a
      // physical timestamp[ns] column (the only way this engine ever
      // produces a long ts — see the nanosAsLong config sites in
      // Engine.session and Tables.load). If a future generator shipped
      // events.ts as PHYSICAL int64 microseconds, this branch would
      // divide it to millis; no per-value magnitude guard can catch that
      // without breaking the pinned 1970..2200 round-trip property
      // (EventsTsDriftSpec), so the guard is the spec's live-testdata
      // range check instead: every round's test run asserts the
      // normalized range of the CURRENT generated data lands in
      // epoch-µs for 2020..2040, which a wrong divisor misses by 1000×.
      case LongType          => expr("ts div 1000")
      case TimestampNTZType  =>
        // the NTZ→LTZ cast goes through the session timezone; anything but
        // UTC would silently shift every timestamp by the zone offset
        require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP_NTZ: session timeZone must be UTC for an exact micros read")
        unix_micros(col("ts").cast(TimestampType))
      case TimestampType     => unix_micros(col("ts"))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
    df.withColumn("ts", us)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = tsToMicros(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
