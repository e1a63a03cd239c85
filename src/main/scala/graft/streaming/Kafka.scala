package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Kafka ingestion/egress wiring (SURVEY §2.1 S1/S4, §2.2 K1) — the Spark
  * equivalent of the reference's topic sources/sinks
  * (Streams.java:30-55, StreamTemplate.java:33,39).
  *
  * The reference's JsonSerde boundary maps to `from_json`/`to_json` with
  * explicit schemas (SURVEY §2.8) — typed schemas eliminate the reference's
  * Long-vs-Integer Jackson pitfall (samples/TopCustomerArtists.java:34-42).
  *
  * NOTE: this container ships no spark-sql-kafka connector jar, so these
  * builders are compile-checked and exercised in tests through their
  * format-agnostic parts (the JSON projections); the `format("kafka")`
  * wiring itself is standard Spark and activates wherever the connector is
  * on the classpath.
  */
object Kafka {

  /** Append-stream source: topic → typed columns (key, value struct). */
  def stream(spark: SparkSession, bootstrap: String, topic: String, schema: StructType): DataFrame =
    decode(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load(),
      schema)

  /** The serde boundary, separated so tests can drive it without a broker:
    * raw Kafka wire rows (key/value binary) → string key + parsed fields. */
  def decode(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), schema).as("v"),
      col("timestamp").as("ingestTime"))
      .select((col("key") +: col("ingestTime") +: schema.fieldNames.toSeq.map(f => col(s"v.$f"))): _*)

  /** Topic sink: selected columns → JSON value keyed by `keyCol`. */
  def sink(df: DataFrame, keyCol: String, bootstrap: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    encode(df, keyCol).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("10 seconds")) // reference commit cadence, Streams.java:86

  /** Egress serde: all non-key columns packed to a JSON value. */
  def encode(df: DataFrame, keyCol: String): DataFrame = {
    val payload = df.columns.filter(_ != keyCol).map(col).toSeq
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(payload: _*)).as("value"))
  }
}
