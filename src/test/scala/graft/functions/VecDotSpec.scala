package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions.vec_dot
import org.apache.spark.sql.functions._
import scala.util.Random

/** VecDot contract in isolation — it is the hot kernel under the whole
  * ANN family (e1 brute force, k-means assignment via VecArgminCell's
  * sibling algebra, ADC/PCA projections), so its two execution paths and
  * edge semantics get the same dedicated pin MortonInterleave has:
  * interpreted eval ≡ whole-stage codegen ≡ a plain Scala reference on
  * random vectors, null top-level arrays propagate null, empty arrays dot
  * to 0.0, mismatched lengths fold over the common prefix (min length),
  * and non-double arrays are rejected at analysis, never read at wrong
  * offsets. Arrays are expected DENSE (no null elements) — every call
  * site feeds parquet/codegen'd numeric arrays.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def runBoth(df: org.apache.spark.sql.DataFrame): (Seq[java.lang.Double], Seq[java.lang.Double]) = {
    def run(): Seq[java.lang.Double] =
      df.select(vec_dot(col("a"), col("b")).as("d"))
        .collect().map(r => if (r.isNullAt(0)) null else Double.box(r.getDouble(0))).toSeq
    // codegen leg under defaults; interpreted leg via SparkSpec.interpreted
    // (factoryMode=NO_CODEGEN — the only setting that reaches nullSafeEval)
    (run(), interpreted(run()))
  }

  test("eval equals codegen equals the Scala fold on random vectors") {
    val rnd = new Random(7)
    val rows = Seq.fill(50) {
      val n = 1 + rnd.nextInt(8)
      (Seq.fill(n)(rnd.nextDouble() * 2 - 1), Seq.fill(n)(rnd.nextDouble() * 2 - 1))
    }
    val expect = rows.map { case (a, b) =>
      Double.box(a.zip(b).map { case (x, y) => x * y }.sum)
    }
    val (cg, ev) = runBoth(rows.toDF("a", "b"))
    assert(cg == expect, "codegen path diverges from the Scala fold")
    assert(ev == expect, "interpreted path diverges from the Scala fold")
  }

  test("null arrays propagate null; empty arrays dot to 0.0; mismatch folds min length") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (None: Option[Seq[Double]], Some(Seq(1.0, 2.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])),
      (Some(Seq(1.0, 2.0, 100.0)), Some(Seq(3.0, 4.0))), // prefix: 1*3+2*4
    ).toDF("a", "b")
    val expect = Seq[java.lang.Double](null, null, Double.box(0.0), Double.box(11.0))
    val (cg, ev) = runBoth(df)
    assert(cg == expect, s"codegen edge semantics: $cg")
    assert(ev == expect, s"interpreted edge semantics: $ev")
  }

  test("non-double arrays fail analysis instead of reading wrong offsets") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception](df.select(vec_dot(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("vec_dot") || e.getMessage.contains("array<double>"),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
