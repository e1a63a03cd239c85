package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * Vectors are `array<float>`; all math is done after a cast to
  * `array<double>` with strictly left-to-right summation (`aggregate`), so
  * results are deterministic and oracle-reproducible.
  */
object Similarity {

  /** Dot product via zip_with + ordered fold — stays inside codegen, no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force top-k cosine neighbors for a (small) query set.
    *
    * The query side is `broadcast()` — at 100 TB the corpus streams through
    * executors once while every executor holds the (tiny) query batch, i.e.
    * a broadcast nested-loop join with per-partition top-k via the window.
    * This is the exact baseline; [[knnIVF]] is the sub-linear scale path.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), asDouble(col("embedding")).as("n_emb"))
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"))
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** IVF-style ANN: the corpus carries a coarse partition assignment (here
    * the precomputed `label` column, standing in for a k-means cell id) and
    * each query probes only its own cell.
    *
    * Scale: turns the O(|corpus|·|queries|) scan into O(|cell|·|queries|)
    * — the IVF inverted-list structure expressed relationally as an
    * equi-join on the cell id, which Spark shuffles/broadcasts optimally.
    * Recall < 1.0 by construction (single-probe); add neighboring cells to
    * the probe list for higher recall.
    */
  def knnIVF(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"), asDouble(col("embedding")).as("n_emb"),
      col("label").as("n_cell"))
    val q = queries.select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_emb"),
      col("label").as("q_cell"))
    val scored = c
      .join(broadcast(q), col("q_cell") === col("n_cell") && col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Exact embedding dedup at a cosine threshold over LSH-style cells: pairs
    * within the same coarse cell with cosine ≥ threshold. Near-dup detection
    * for embedding-indexed corpora; the cell join bounds the pair blowup. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id1"), asDouble(col("embedding")).as("e1"),
      col("label").as("cell"))
    val b = corpus.select(col("vec_id").as("id2"), asDouble(col("embedding")).as("e2"),
      col("label").as("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", cosine(col("e1"), col("e2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
  }
}
