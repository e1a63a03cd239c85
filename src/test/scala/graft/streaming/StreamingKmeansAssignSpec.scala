package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the k-means ASSIGNMENT pass (e9's serving half): the
  * trained centroids are a k-row artifact that packs into one broadcast
  * row, and scoring arriving vectors is stateless scan-stage work — the
  * same `vec_argmin_cell` fold the batch trainer uses, with no state
  * store at all. Asserts every streamed vector lands in the same cluster
  * at the same squared distance as the batch assignment — the model is a
  * value, so serving it incrementally cannot drift. */
class StreamingKmeansAssignSpec extends SparkSpec {
  import spark.implicits._

  test("streamed scan-stage assignment equals the batch assignment, batch by batch") {
    implicit val ctx = spark.sqlContext
    val planted =
      (0 to 9).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0f, 0f))) ++
        (10 to 19).map(i => (i.toLong, Array(0.01f * (i - 10), 1.0f, 0f, 0f)))
    val docs = planted.toDF("vec_id", "embedding")
    val (assigned, centroids) = Similarity.kmeans(docs, k = 2, rounds = 3, dims = 4)
    val batch = assigned.select($"vec_id", $"cluster", $"sq")
      .as[(Long, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // the broadcastable model: same packed shape the trainer folds over
    val packed = centroids
      .withColumn("dcc", graft.functions.VectorFunctions.vec_dot($"c", $"c"))
      .agg(array_sort(collect_list(struct($"cluster", $"c", $"dcc"))).as("cents"))
      .localCheckpoint(true)

    val in = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.Map[Long, (Int, Double)]()
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val scored = b
          .select($"vec_id", $"embedding".cast("array<double>").as("v"))
          .withColumn("dxx", graft.functions.VectorFunctions.vec_dot($"v", $"v"))
          .crossJoin(broadcast(packed))
          .withColumn("best", graft.functions.VectorFunctions.vec_argmin_cell(
            $"v", $"dxx", $"cents"))
          .select($"vec_id", $"best.cluster", $"best.sq")
          .as[(Long, Int, Double)].collect()
        scored.foreach(r => got(r._1) = (r._2, r._3))
        ()
      }
      .start()
    try {
      in.addData(planted.take(7): _*)
      q.processAllAvailable()
      in.addData(planted.drop(7): _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.size == planted.size)
    got.foreach { case (id, (cl, sq)) =>
      assert(batch(id) == ((cl, sq)),
        s"vec $id: streamed ($cl, $sq) vs batch ${batch(id)}")
    }
  }
}
