package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir] [mode]`
  * prints the formatted physical plan (and with mode=extended the full
  * logical→physical chain) for any catalog query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = Engine.session("graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain(mode)
    spark.stop()
  }
}
