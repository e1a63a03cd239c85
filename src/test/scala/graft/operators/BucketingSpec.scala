package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Co-located joins via bucketed storage — the 100 TB shuffle killer: a
  * fact table written `bucketBy(join key)` is ALREADY hash-partitioned on
  * disk, so a join on that key needs no Exchange on either side. This is
  * the storage-layout analog of the explicit `repartition` reuse in a1,
  * and the plan property this spec pins is the whole point: the
  * SortMergeJoin's subtree must contain zero ShuffleExchange nodes.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Flatten an executed plan INCLUDING the subplans hidden inside AQE
    * query stages (QueryStageExec is a leaf to TreeNode traversal). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("bucketBy(join key) on both sides: SortMergeJoin with no Exchange beneath it") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: at this SF everything fits broadcast range,
    // which would hide the property under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      // a killed previous JVM can orphan the managed-table locations with
      // no catalog entry for DROP to clean — saveAsTable then refuses the
      // existing dir, so sweep them explicitly
      for (t <- Seq("b_orders", "b_lineitem")) {
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            // listFiles is null on a dir deleted mid-sweep by another JVM
            if (f.isDirectory)
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(loc)
        }
      }
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      joined.collect() // finalize any adaptive re-planning before inspecting

      val plan = joined.queryExecution.executedPlan
      val smjs = flatten(plan).collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a SortMergeJoin over bucketed tables:\n$plan")
      val shufflesUnderJoin = smjs.flatMap(flatten).collect { case e: ShuffleExchangeExec => e }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join must not shuffle its inputs:\n$plan")

      // same join over the raw (unbucketed) parquet DOES shuffle both sides
      val unbucketed = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val uplan = unbucketed.queryExecution.executedPlan
      val rawShuffles = flatten(uplan).collect { case e: ShuffleExchangeExec => e }
      assert(rawShuffles.size >= 2,
        s"control: unbucketed join should shuffle both inputs:\n$uplan")

      // and the answers agree
      val a = joined.as[(String, Long)].collect().toMap
      val b = unbucketed.as[(String, Long)].collect().toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
