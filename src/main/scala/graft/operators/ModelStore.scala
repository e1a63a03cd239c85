package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed store for trained ANN models — the deployment contract
  * behind every search operator here: TRAIN ONCE (on a hash-sample at
  * 100 TB), STORE the model as plain tables, and let every search session
  * read + broadcast it instead of retraining. The in-session twin of this
  * contract is [[graft.queries.Models]]'s checkpoint cache; this store is
  * what outlives the session.
  *
  * A model is just tables, so the store is just parquet — no registry,
  * no serialization format, engine-portable by construction:
  *   - `centroids` (cluster, c): the coarse quantizer — k rows.
  *   - `assigned`  (vec_id, v, dxx, cluster, sq): the corpus assignment;
  *     at scale this is "the index" — (cell, codes) stored once per
  *     vector — and dwarfs everything else.
  *   - `codes`     (vec_id, sub, code, sq): PQ codes (raw or residual).
  *   - `books`     (sub, cluster, c): PQ codebooks — m·k rows.
  *   - `meta`      one row of geometry (m, k, coarseK, dims), so a loader
  *     can validate compatibility before joining anything.
  *
  * Doubles round-trip parquet bit-exactly and every serving fold orders
  * by (cluster, sub) packs — never by storage order — so a loaded model
  * reproduces the training run's search results row-for-row
  * (`ModelStoreSpec` pins this end-to-end through [[Similarity
  * .ivfPqSearchFrom]]).
  */
object ModelStore {

  private val parts = Seq("assigned", "centroids", "codes", "books")

  /** Persist a trained coarse+PQ model (the [[Similarity.coarsePqModels]]
    * quadruple) under `dir`, one parquet table per part plus geometry
    * metadata. Overwrites any previous model at that path atomically per
    * table (parquet overwrite semantics). The five tables land on
    * independent paths, so their write JOBS run concurrently (one driver
    * thread each — Spark schedules concurrent jobs fine); serializing
    * them would stack five small-job latencies for no isolation gain. */
  def saveCoarsePq(
      dir: String, assigned: DataFrame, centroids: DataFrame,
      codes: DataFrame, books: DataFrame,
      m: Int, k: Int, coarseK: Int, dims: Int): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = assigned.sparkSession
    import spark.implicits._
    val meta = Seq((m, k, coarseK, dims)).toDF("m", "k", "coarse_k", "dims")
    val writes = (Seq(assigned, centroids, codes, books).zip(parts) :+
      (meta, "meta")).map { case (df, name) =>
      Future { df.write.mode("overwrite").parquet(s"$dir/$name") }
    }
    Await.result(Future.sequence(writes), Duration.Inf)
  }

  /** Load a stored model: (assigned, centroids, codes, books). Validates
    * the stored geometry against the caller's expectation — searching
    * with mismatched geometry would silently mis-rank, so it fails fast
    * instead. */
  def loadCoarsePq(
      spark: SparkSession, dir: String,
      m: Int, k: Int, coarseK: Int, dims: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val meta = spark.read.parquet(s"$dir/meta")
      .select(col("m"), col("k"), col("coarse_k"), col("dims"))
      .collect().head
    require(
      meta.getInt(0) == m && meta.getInt(1) == k &&
        meta.getInt(2) == coarseK && meta.getInt(3) == dims,
      s"stored model geometry (m=${meta.getInt(0)}, k=${meta.getInt(1)}, " +
        s"coarseK=${meta.getInt(2)}, dims=${meta.getInt(3)}) does not match " +
        s"requested (m=$m, k=$k, coarseK=$coarseK, dims=$dims)")
    val Seq(assigned, centroids, codes, books) =
      parts.map(name => spark.read.parquet(s"$dir/$name"))
    (assigned, centroids, codes, books)
  }
}
