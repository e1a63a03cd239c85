package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** The Kafka serde boundary (SURVEY §2.1 S1 / §2.8 JSON), driven without a
  * broker: `decode` gets rows shaped exactly like Kafka wire records
  * (binary key/value + timestamp), `encode` packs back. The reference's
  * Long-vs-Integer Jackson pitfall (samples/TopCustomerArtists.java:34-42)
  * cannot occur here — the schema types every field explicitly. */
class KafkaSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val listenSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("customerid", StringType),
    StructField("artistid", StringType),
    StructField("streamtime", StringType)))

  test("decode: raw Kafka wire rows -> string key + typed fields") {
    val raw = Seq(
      ("c1", """{"id":"l1","customerid":"c1","artistid":"a1","streamtime":"t1"}"""),
      ("c2", """{"id":"l2","customerid":"c2","artistid":"a9","streamtime":"t2"}"""))
      .toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"),
        lit(new Timestamp(0L)).as("timestamp"))
    val out = Kafka.decode(raw, listenSchema)
      .select("key", "id", "customerid", "artistid")
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("c1", "l1", "c1", "a1"), ("c2", "l2", "c2", "a9")))
  }

  test("decode: malformed JSON yields null fields, not a crash (permissive mode)") {
    val raw = Seq(("k1", "{not json"))
      .toDF("k", "v")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"),
        lit(new Timestamp(0L)).as("timestamp"))
    val out = Kafka.decode(raw, listenSchema).select("key", "id").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "k1")
    assert(out.head.isNullAt(1))
  }

  test("encode -> decode roundtrip preserves typed numeric fields") {
    val schema = StructType(Seq(
      StructField("eventid", StringType),
      StructField("capacity", IntegerType),
      StructField("remaining", DoubleType),
      StructField("count", LongType)))
    val df = Seq(("e1", 5, -1.5, 3000000000L)).toDF("eventid", "capacity", "remaining", "count")
    val wire = Kafka.encode(df, "eventid")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"),
        lit(new Timestamp(0L)).as("timestamp"))
    val back = Kafka.decode(wire, schema)
      .select("key", "capacity", "remaining", "count")
      .as[(String, Int, Double, Long)].collect()
    // 3e9 survives as Long — the reference needed a custom Jackson
    // TypeReference to avoid Integer truncation here
    assert(back.toSeq == Seq(("e1", 5, -1.5, 3000000000L)))
  }
}
