package graft.streaming

import graft.SparkSpec
import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of a9's Count-Min sketch: each micro-batch builds its own
  * grid and merges it into the running grid by cell-wise addition — the
  * property [[SketchSpec]] pins statically is what makes the sketch
  * maintainable under ingest without ever re-reading history. Asserts the
  * incrementally merged grid equals the batch grid over the union of all
  * batches (exact equality — the sketch is deterministic integer math). */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("incrementally merged CMS grid equals the batch-built grid") {
    implicit val ctx = spark.sqlContext
    val width = 8
    val in = MemoryStream[String]
    var acc: DataFrame = null

    val q = in.toDF().toDF("k")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyed = batch.groupBy(col("k")).agg(count(lit(1)).as("n"))
        val g = Sketch.cmsGrid(keyed, "k", "n", width)
        acc = (if (acc == null) g
               else acc.unionAll(g).groupBy(col("j"), col("bucket"))
                 .agg(sum(col("cell")).as("cell")))
          .localCheckpoint(true)
        ()
      }
      .start()
    try {
      in.addData("u1", "u2", "u1")
      q.processAllAvailable()
      in.addData("u3", "u1", "u2", "u4")
      q.processAllAvailable()
    } finally q.stop()

    val all = Seq("u1", "u2", "u1", "u3", "u1", "u2", "u4").toDF("k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val whole = Sketch.cmsGrid(all, "k", "n", width)
    val diff = acc.unionAll(whole)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"), countDistinct(col("cell")).as("d"))
      .filter(col("c") =!= 2 || col("d") =!= 1)
    assert(diff.isEmpty, "streamed grid differs from batch grid")
  }
}
