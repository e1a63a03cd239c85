package graft.queries

import graft.{SparkSpec, SparkEntry}
import java.nio.file.{Files, Paths}

/** Partition-count invariance of catalog results — the determinism claim
  * the rounding design (display-round4 before compare, decimal partial
  * sums, stable content hashes, register-max sketch merges) exists to
  * deliver, pinned end to end.
  *
  * The driver's oracle gate always runs one fixed layout (local[4],
  * shuffle.partitions=4), so a result that silently depended on shuffle
  * partition count — float sums folded in partition order, a sketch whose
  * merge is order-sensitive, a top-k tie broken by arrival — would pass
  * every gate and still be WRONG at 100 TB, where partitioning is never
  * the gate's. This spec re-runs the order-sensitive representatives of
  * each family under two partitionings a cluster would actually produce
  * differently (3 vs 13 — both coprime to the data and to local[4]) and
  * asserts byte-identical rows.
  *
  * The second run reads the SAME parquet bytes through a symlink-alias
  * dataset dir: [[SessionMemo]] keys fixtures by the dataset PATH STRING,
  * so the alias forces every session fixture (k-means models, PQ
  * codebooks, PCA axis, dedup chains, layout histograms) to RETRAIN under
  * the second partitioning — the invariance claim covers training, not
  * just serving.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sfReal = "/root/testdata/sf0.001"

  private lazy val sfAlias: String = {
    val dir = Files.createTempDirectory("graft_sf_alias")
    dir.toFile.deleteOnExit()
    Files.list(Paths.get(sfReal)).forEach { p =>
      Files.createSymbolicLink(dir.resolve(p.getFileName), p)
    }
    dir.toString
  }

  private def rows(name: String, sf: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).sorted.toIndexedSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.catalog.clearCache()
    }
  }

  // one representative per order-sensitivity class; comments name the
  // mechanism under test
  private val names = Seq(
    "q1_pricing_summary",          // float sum/avg folded per-partition
    "t3_quality_score",            // per-doc float ratios
    "t9_tfidf",                    // tf-idf: log over shuffled df counts
    "t15_unigram_lm",              // decimal partial sums
    "t19_bigram_lm",               // decimal partial sums, 2 joins deep
    "t25_source_kl",               // KL over two distributions
    "x3_moving_avg",               // window avg over float frame
    "x10_group_regression",        // per-group OLS float moments
    "e4_centroid",                 // dim-partitioned float averages
    "e9_kmeans_assign",            // k-means fixture retrains on alias
    "e15_ivf_pq_search",           // coarse+PQ fixture retrains on alias
    "e23_pca_project",             // 6-round power iteration retrains
    "c5_semantic_dedup",           // k-means cells + CC on alias
    "a8_approx_distinct",          // HLL sketch: register-max merge order
    "a9_cms_topk",                 // CMS counters under merge order
    "a12_approx_quantiles",        // quantile sketch merge order
    "a13_hll_merge",               // HLL union across groups
    "a14_theta_intersect",         // theta set-op merge order
    "a16_weighted_sample",         // stable-hash membership under weights
    "t6_hash_sample",              // stable content-hash membership
    "c6_stratified_split",         // stratified stable-hash split
    "x11_pagerank",                // fixed-point integer iteration
    "d6_dup_clusters",             // CC label propagation order
    "w2_sessionize",               // session windows over event order
    "d10_survivorship",            // dup-group window tie handling
    "a1_top3_parts_per_customer",  // top-k tie stability per key
    "a11_topk_agg",                // TopKByCount partial/final merges
    "t8_top_tokens",               // global top-k over token counts
  )

  for (n <- names)
    test(s"$n is invariant to shuffle partitioning (3-part vs 13-part retrain)") {
      val a = rows(n, sfReal, 3)
      val b = rows(n, sfAlias, 13)
      assert(a.size == b.size, s"$n row count ${a.size} vs ${b.size}")
      val diff = a.zip(b).zipWithIndex.collectFirst {
        case ((x, y), i) if x != y => s"row $i:\n  3-part: $x\n  13-part: $y"
      }
      assert(diff.isEmpty,
        s"$n differs across partitionings — ${diff.getOrElse("")}")
    }
}
