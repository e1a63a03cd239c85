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
    * table (parquet overwrite semantics). The four data tables land on
    * independent paths, so their write JOBS run concurrently (one driver
    * thread each — Spark schedules concurrent jobs fine); serializing
    * them would stack four small-job latencies for no isolation gain.
    * `meta` is the COMMIT MARKER: it is written serially, only after
    * every data write has been joined and found successful — so a
    * failed or interrupted save can never leave a FRESH meta beside
    * stale/partial data tables. Scope of the guarantee: it protects
    * geometry-CHANGING saves (the case [[loadCoarsePq]]'s fail-fast can
    * detect). Overwriting a model with the SAME geometry is not
    * crash-atomic — a save that dies mid-overwrite leaves the old meta
    * validating partial data; a deployment retraining in place at the
    * same geometry needs write-to-new-dir-then-swap on top of this
    * (parquet overwrite is per-table, not per-model). All four outcomes are
    * collected before rethrowing (no fail-fast `Future.sequence`): by
    * the time the first failure surfaces, no sibling overwrite of the
    * same paths is still in flight, so a caller's retry cannot race it.
    * The Spark actions run under `blocking` so the default pool grows
    * past its cores-sized floor instead of serializing the writes. */
  def saveCoarsePq(
      dir: String, assigned: DataFrame, centroids: DataFrame,
      codes: DataFrame, books: DataFrame,
      m: Int, k: Int, coarseK: Int, dims: Int): Unit = {
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = assigned.sparkSession
    import spark.implicits._
    // the outcome is materialized with a catch-ALL, not scala.util.Try:
    // Try only catches NonFatal, so e.g. an InterruptedException would
    // fail its Future, make Future.sequence fail fast, and rethrow from
    // Await while sibling overwrites are still in flight — the exact
    // retry race the quiesce-before-rethrow contract rules out. Every
    // write future here always SUCCEEDS (with Option[Throwable]), so
    // the sequence can only return after all four writes have quiesced.
    val writes = Seq(assigned, centroids, codes, books).zip(parts)
      .map { case (df, name) =>
        Future(blocking {
          try { df.write.mode("overwrite").parquet(s"$dir/$name"); None }
          catch { case t: Throwable => Some(t) }
        })
      }
    val outcomes = Await.result(Future.sequence(writes), Duration.Inf)
    outcomes.flatten.foreach(t => throw t) // all writes quiesced; surface any failure
    Seq((m, k, coarseK, dims)).toDF("m", "k", "coarse_k", "dims")
      .write.mode("overwrite").parquet(s"$dir/meta")
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
