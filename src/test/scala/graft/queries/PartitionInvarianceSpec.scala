package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Path, Paths}

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
  * asserts schema-identical, value-identical rows.
  *
  * BOTH legs read the SAME parquet bytes through their own symlink-alias
  * dataset dir: [[SessionMemo]] keys fixtures by the dataset PATH STRING,
  * and the suite shares one JVM-wide session with every other suite — so
  * running a leg on the real path would silently reuse fixtures an
  * earlier suite trained under the default 4 shuffle partitions. A
  * fresh alias per leg guarantees each side's session fixtures (k-means
  * models, PQ codebooks, PCA axis, dedup chains, layout histograms)
  * RETRAIN under exactly that leg's partitioning — the invariance claim
  * covers training, not just serving.
  */
class PartitionInvarianceSpec extends SparkSpec with BeforeAndAfterAll {

  private val sfReal = "/root/testdata/sf0.001"

  private def mkAlias(): Path = {
    val dir = Files.createTempDirectory("graft_sf_alias")
    // Files.list returns a Stream that holds a directory fd — close it
    val listing = Files.list(Paths.get(sfReal))
    try listing.forEach { p =>
      Files.createSymbolicLink(dir.resolve(p.getFileName), p)
    } finally listing.close()
    dir
  }

  private lazy val aliasA: Path = mkAlias()
  private lazy val aliasB: Path = mkAlias()

  override def afterAll(): Unit = {
    // deleteOnExit is a no-op on a non-empty dir; remove contents here
    for (dir <- Seq(aliasA, aliasB)) {
      val listing = Files.list(dir)
      try listing.forEach(Files.deleteIfExists(_))
      finally listing.close()
      Files.deleteIfExists(dir)
    }
    super.afterAll()
  }

  /** (schema DDL, rows sorted by display form, value multiset). The
    * comparison is on typed Row values + schema — Row.toString alone
    * cannot distinguish SQL NULL from the string "null" and erases
    * nested typing; toString is kept only as a stable sort/report key. */
  private def rows(name: String, sf: String, parts: Int): (String, Seq[Row], Map[Row, Int]) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.sorted.toIndexedSeq
      val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      val collected = proj.collect().sortBy(_.toString).toIndexedSeq
      (proj.schema.toDDL, collected,
        collected.groupBy(identity).map { case (r, g) => r -> g.size })
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
      val (schemaA, rowsA, msA) = rows(n, aliasA.toString, 3)
      val (schemaB, rowsB, msB) = rows(n, aliasB.toString, 13)
      assert(schemaA == schemaB, s"$n schema drift: $schemaA vs $schemaB")
      assert(rowsA.size == rowsB.size, s"$n row count ${rowsA.size} vs ${rowsB.size}")
      if (msA != msB) {
        val diff = rowsA.zip(rowsB).zipWithIndex.collectFirst {
          case ((x, y), i) if x != y => s"row $i:\n  3-part: $x\n  13-part: $y"
        }
        fail(s"$n differs across partitionings — ${diff.getOrElse("(multiset diff beyond display form)")}")
      }
    }
}
