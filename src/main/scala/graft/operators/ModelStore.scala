package graft.operators

import org.apache.hadoop.fs.Path
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
  *   - `v<N>/centroids` (cluster, c): the coarse quantizer — k rows.
  *   - `v<N>/assigned`  (vec_id, v, dxx, cluster, sq): the corpus
  *     assignment; at scale this is "the index" — (cell, codes) stored
  *     once per vector — and dwarfs everything else.
  *   - `v<N>/codes`     (vec_id, sub, code, sq): PQ codes (raw or residual).
  *   - `v<N>/books`     (sub, cluster, c): PQ codebooks — m·k rows.
  *   - `meta`           one row of geometry (m, k, coarseK, dims) plus the
  *     VERSION POINTER — which v<N> directory is the committed model.
  *
  * Doubles round-trip parquet bit-exactly and every serving fold orders
  * by (cluster, sub) packs — never by storage order — so a loaded model
  * reproduces the training run's search results row-for-row
  * (`ModelStoreSpec` pins this end-to-end through [[Similarity
  * .ivfPqSearchFrom]]).
  *
  * Crash and concurrency contract (single writer, any readers):
  *   - Data tables are IMMUTABLE once committed: every save writes to a
  *     FRESH v<N> directory and never touches a committed one, so a
  *     reader — whether it resolved before the save started or reads
  *     mid-save — always serves a COMPLETE model, old or new, never a
  *     mix. This closes the window the round-9 commit-marker left open
  *     (same-geometry in-place overwrite could expose partial tables to
  *     a concurrent reader).
  *   - `meta` is the COMMIT MARKER and the pointer swap in one write: it
  *     lands serially, only after every data write has been joined and
  *     found successful. A save that dies mid-write leaves a garbage
  *     v<N> directory and the OLD meta still pointing at the old
  *     complete model; version numbers allocate PAST any existing v<N>
  *     directory (one FS listing, no Spark job), so a new save never
  *     overwrites the garbage — it supersedes it, and GC sweeps it.
  *   - After a successful swap, GC (best effort, FS-only) keeps the new
  *     version plus the LATEST COMPLETE predecessor — completeness
  *     checked by the four parts' _SUCCESS markers, so crash garbage
  *     never consumes the grace slot — and deletes the rest. The kept
  *     predecessor lets a reader that resolved just before the swap
  *     finish its scan. A reader must re-resolve (re-call
  *     [[loadCoarsePq]]) rather than hold table handles across two
  *     retrains; that one-version grace is the documented window.
  *   - Writers are NOT coordinated against each other: two concurrent
  *     saves to one dir can allocate the same version. Single-writer
  *     per model dir, as before — what this adds is reader/writer
  *     isolation, not writer/writer.
  */
object ModelStore {

  private val parts = Seq("assigned", "centroids", "codes", "books")

  /** The committed meta row (m, k, coarse_k, dims, version), if any.
    * `version = 0` marks a legacy (pre-versioning) store whose tables
    * live directly under `dir`. */
  private def readMeta(spark: SparkSession, dir: String): Option[(Int, Int, Int, Int, Long)] = {
    val metaPath = new Path(s"$dir/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) None
    else {
      val df = spark.read.parquet(metaPath.toString)
      val versioned = df.columns.contains("version")
      val row = df.select(col("m"), col("k"), col("coarse_k"), col("dims"),
        (if (versioned) col("version") else lit(0L)).as("version"))
        .collect().head
      Some((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getLong(4)))
    }
  }

  /** Persist a trained coarse+PQ model (the [[Similarity.coarsePqModels]]
    * quadruple) under `dir` as a fresh immutable version, then swap the
    * meta pointer. The four data tables land on independent paths inside
    * the new version directory, so their write JOBS run concurrently
    * (one driver thread each — Spark schedules concurrent jobs fine);
    * serializing them would stack four small-job latencies for no
    * isolation gain. All four outcomes are collected before rethrowing
    * (no fail-fast `Future.sequence`): by the time the first failure
    * surfaces, no sibling write of the same paths is still in flight, so
    * a caller's retry cannot race it. The Spark actions run under
    * `blocking` so the default pool grows past its cores-sized floor
    * instead of serializing the writes. Only after every data write has
    * succeeded is `meta` overwritten — commit marker and version-pointer
    * swap in one serial write; see the object doc for the full contract. */
  def saveCoarsePq(
      dir: String, assigned: DataFrame, centroids: DataFrame,
      codes: DataFrame, books: DataFrame,
      m: Int, k: Int, coarseK: Int, dims: Int): Unit = {
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val spark = assigned.sparkSession
    import spark.implicits._
    // version allocation by FS listing, not by reading meta: a parquet
    // read of meta is a Spark job per save, and allocating PAST any
    // existing v<N> directory (committed or crashed-save garbage) means a
    // new version NEVER overwrites an existing path — garbage from a
    // crashed save is simply superseded and swept by a later GC pass
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = (if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.matches("v\\d+"))
        .map(_.drop(1).toLong).foldLeft(0L)(math.max)
    else 0L) + 1L
    val base = s"$dir/v$next"
    // the outcome is materialized with a catch-ALL, not scala.util.Try:
    // Try only catches NonFatal, so e.g. an InterruptedException would
    // fail its Future, make Future.sequence fail fast, and rethrow from
    // Await while sibling writes are still in flight — the exact retry
    // race the quiesce-before-rethrow contract rules out. Every write
    // future here always SUCCEEDS (with Option[Throwable]), so the
    // sequence can only return after all four writes have quiesced.
    val writes = Seq(assigned, centroids, codes, books).zip(parts)
      .map { case (df, name) =>
        Future(blocking {
          try { df.write.mode("overwrite").parquet(s"$base/$name"); None }
          catch { case t: Throwable => Some(t) }
        })
      }
    val outcomes = Await.result(Future.sequence(writes), Duration.Inf)
    outcomes.flatten.foreach(t => throw t) // all writes quiesced; surface any failure
    Seq((m, k, coarseK, dims, next)).toDF("m", "k", "coarse_k", "dims", "version")
      .write.mode("overwrite").parquet(s"$dir/meta")
    // best-effort GC, FS-only: a version dir is COMPLETE iff all four
    // parts carry their _SUCCESS marker. Keep the just-committed version
    // and the LATEST COMPLETE predecessor (the one-version grace for
    // readers that resolved before the swap); sweep everything else —
    // older complete versions and any incomplete crash garbage, which
    // can never count as the grace predecessor
    try {
      def complete(v: Long): Boolean =
        parts.forall(p => fs.exists(new Path(s"$dir/v$v/$p/_SUCCESS")))
      val others = fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.matches("v\\d+"))
        .map(_.drop(1).toLong).filter(_ != next)
      val grace = others.filter(complete).sorted.lastOption
      others.filterNot(grace.contains)
        .foreach(v => fs.delete(new Path(s"$dir/v$v"), true))
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Load a stored model: (assigned, centroids, codes, books), resolved
    * through the meta pointer to the committed version directory (or the
    * legacy flat layout for a pre-versioning store). Validates the
    * stored geometry against the caller's expectation — searching with
    * mismatched geometry would silently mis-rank, so it fails fast
    * instead. */
  def loadCoarsePq(
      spark: SparkSession, dir: String,
      m: Int, k: Int, coarseK: Int, dims: Int): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (sm, sk, sck, sd, version) = readMeta(spark, dir)
      .getOrElse(throw new IllegalArgumentException(s"no committed model at $dir"))
    require(
      sm == m && sk == k && sck == coarseK && sd == dims,
      s"stored model geometry (m=$sm, k=$sk, coarseK=$sck, dims=$sd) does " +
        s"not match requested (m=$m, k=$k, coarseK=$coarseK, dims=$dims)")
    val base = if (version == 0L) dir else s"$dir/v$version"
    val Seq(assigned, centroids, codes, books) =
      parts.map(name => spark.read.parquet(s"$base/$name"))
    (assigned, centroids, codes, books)
  }
}
