package graft.queries

import graft.Tables
import graft.operators.Similarity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search operators over the `embeddings` table. */
object SimilarityQueries {

  private def queriesSide(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 10)

  /** Exact top-5 cosine neighbors for a small query batch — the brute-force
    * baseline every ANN variant is measured against. */
  def e1KnnBrute(s: SparkSession, d: String): DataFrame =
    knnBruteForce(Tables.embeddings(s, d), queriesSide(s, d), 5)
      .orderBy(col("q_id"), col("rank"))

  /** IVF-style ANN: probe only the query's coarse cell (`label` stands in
    * for the k-means assignment). */
  def e2KnnIVF(s: SparkSession, d: String): DataFrame =
    knnIVF(Tables.embeddings(s, d), queriesSide(s, d), 5)
      .orderBy(col("q_id"), col("rank"))

  /** Embedding near-dup pairs within a coarse cell at cosine ≥ 0.35. */
  def e3CosNeardup(s: SparkSession, d: String): DataFrame =
    cosineNearDupPairs(Tables.embeddings(s, d), 0.35)
      .orderBy(col("id1"), col("id2"))
}
