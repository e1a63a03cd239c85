package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Sketch]] semantics: the CMS lower bound, exactness without
  * collisions, and cell-wise mergeability (the property that makes the
  * sketch distributable). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val keyed = Seq(("u1", 5L), ("u2", 3L), ("u3", 2L), ("u4", 7L))
    .toDF("k", "n")

  test("estimates are >= exact counts (CMS lower bound), exact when wide") {
    for (width <- Seq(2, 4096)) {
      val grid = Sketch.cmsGrid(keyed, "k", "n", width)
      val est = Sketch.cmsEstimate(keyed.select($"k"), "k", grid, width)
        .join(keyed, "k").select($"k", $"est", $"n")
        .as[(String, Long, Long)].collect()
      assert(est.length == 4)
      est.foreach { case (k, e, n) =>
        assert(e >= n, s"width=$width key=$k est=$e < exact=$n")
        if (width == 4096) assert(e == n, s"width=$width key=$k est=$e != $n")
      }
    }
  }

  test("grids merge by cell-wise addition") {
    val width = 8
    val left = Sketch.cmsGrid(keyed.filter($"k" <= "u2"), "k", "n", width)
    val right = Sketch.cmsGrid(keyed.filter($"k" > "u2"), "k", "n", width)
    val merged = left.unionAll(right)
      .groupBy($"j", $"bucket").agg(sum($"cell").as("cell"))
    val whole = Sketch.cmsGrid(keyed, "k", "n", width)
    val diff = merged.unionAll(whole)
      .groupBy($"j", $"bucket")
      .agg(count(lit(1)).as("c"), countDistinct($"cell").as("d"))
      .filter($"c" =!= 2 || $"d" =!= 1)
    assert(diff.isEmpty, "merged grid differs from whole-input grid")
  }
}
