package graft.queries

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Session-scoped memoized fixtures for the document-dedup chain — the
  * text-side twin of [[Models]] (same [[SessionMemo]] contract: train/build
  * ONCE per (SparkContext, dataset dir), hand every consumer the
  * localCheckpoint'd frame, nothing pinned in the CacheManager).
  *
  * The chain canonical docs → shingles → verified pairs → components is
  * fully deterministic (md5 fingerprints, min-id canonical choice, exact
  * Jaccard on integer shingle hashes, min-label components), and FIVE
  * catalog gates replay prefixes of it: d2 (candidates), d3 (verified
  * pairs), d6 (clusters), d10 (survivorship over d6's members), c1 (the
  * composed pipeline) — plus d11's geometry dial re-deriving the shingle
  * frame. Before this cache each gate recomputed the shared prefix
  * (tokenize→shingle→minhash is the corpus CPU cost; components is a
  * checkpoint-barrier chain); now the first toucher builds it and the rest
  * measure only their own work — the same accounting contract as the
  * e-family model fixtures, disclosed the same way in the bench summary.
  *
  * Correctness gates stay self-contained on the oracle side: DuckDB
  * replays the full chain from the parquet data per gate; only the Spark
  * side shares the one deterministic result.
  */
object Dedup {
  import SessionMemo.memo

  /** Exact-dup representatives ([[TextOps.canonicalDocs]]) of `documents`
    * — the frame every near-dup stage starts from (identical docs would
    * otherwise share all LSH bands and quadratically flood one bucket). */
  def canonDocs(s: SparkSession, d: String): DataFrame = memo(s, d, "dd:canon") {
    TextOps.canonicalDocs(Tables.documents(s, d), "doc_id", "text")
      .localCheckpoint(true)
  }

  /** One shingle pass over the canonical docs — feeds LSH banding (d2,
    * d11, the pair pipeline) and the exact-Jaccard verification joins. */
  def shingles(s: SparkSession, d: String): DataFrame = memo(s, d, "dd:shingles") {
    TextOps.shingleFrame(canonDocs(s, d), "doc_id", "text").localCheckpoint(true)
  }

  /** LSH-candidate pairs verified at exact shingle Jaccard ≥ 0.8 —
    * `(id1, id2, j)` unsorted, the production geometry (16 hashes,
    * 4 rows/band). d3 presents it; d6/d10/c1 collapse it. */
  def verifiedPairs(s: SparkSession, d: String): DataFrame = memo(s, d, "dd:pairs") {
    TextQueries.verifiedPairsFromShingles(shingles(s, d)).localCheckpoint(true)
  }

  /** Connected-component labels `(id, comp)` over the verified pairs —
    * the cluster collapse d6/d10/c1 share. */
  def components(s: SparkSession, d: String): DataFrame = memo(s, d, "dd:comps") {
    graft.operators.Graph
      .connectedComponents(verifiedPairs(s, d).select(col("id1"), col("id2")))
      .localCheckpoint(true)
  }

  /** The trained 3-round BPE merge table ([[TextOps.bpeTrainMerges]]) over
    * `documents` — t21 presents it, t22 encodes the corpus under it. The
    * training loop is deterministic (exact pair counts, (cnt DESC, pair)
    * argmax), and train-once/apply-many is the tokenizer deployment
    * contract the operators already document. 3 rows. */
  def bpeMerges(s: SparkSession, d: String): DataFrame = memo(s, d, "dd:bpe") {
    TextOps.bpeTrainMerges(Tables.documents(s, d), "text", 3)
      .localCheckpoint(true)
  }
}
