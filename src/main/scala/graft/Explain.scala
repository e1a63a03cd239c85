package graft

/** Plan-audit main: print the formatted physical plan for the named catalog
  * queries (all queries if no names given). Usage:
  *   sbt "runMain graft.Explain <sfDir> [name ...]"
  * What to look for (the checklist SURVEY §4 commits us to):
  *   - PushedFilters / ReadSchema on every parquet scan (pushdown + pruning)
  *   - BroadcastHashJoin on dimension sides; SortMergeJoin only fact-fact
  *   - WholeStageCodegen spans covering the hot expressions
  *   - no unexpected Exchange (shuffle) nodes
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("graft-explain")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
