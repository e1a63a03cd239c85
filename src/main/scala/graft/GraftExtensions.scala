package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSig, Shingles, SimHash16, SimHashSig, TopKByCount, VecArgminCell, VecDot}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works next to the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.simhash16)
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.shingles)
    ext.injectFunction(GraftExtensions.simhashSig)
    ext.injectFunction(GraftExtensions.vecArgminCell)
    ext.injectFunction(GraftExtensions.topKByCount)
  }
}

object GraftExtensions {
  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"vec_dot requires exactly 2 arguments, got ${children.length}")
      VecDot(children(0), children(1))
    })

  val vecArgminCell: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_argmin_cell"),
    new ExpressionInfo(classOf[VecArgminCell].getName, "vec_argmin_cell"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new IllegalArgumentException(
          s"vec_argmin_cell requires (vec, self_dot, centroids), got ${children.length} args")
      VecArgminCell(children(0), children(1), children(2))
    })

  val topKByCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_by_count"),
    new ExpressionInfo(classOf[TopKByCount].getName, "top_k_by_count"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"top_k_by_count requires (struct<cnt, key>, k), got ${children.length} args")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"top_k_by_count k must be an integer literal, got $other")
      }
      TopKByCount(children.head, k).toAggregateExpression()
    })

  val simhash16: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash16"),
    new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
    (children: Seq[Expression]) => {
      if (children.length != 1)
        throw new IllegalArgumentException(
          s"simhash16 requires exactly 1 argument, got ${children.length}")
      SimHash16(children.head)
    })

  val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"minhash_sig requires (array<string>, numHashes), got ${children.length} args")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_sig numHashes must be an integer literal, got $other")
      }
      MinHashSig(children.head, k)
    })

  val simhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"simhash_sig requires (array<string>, nBits), got ${children.length} args")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"simhash_sig nBits must be an integer literal, got $other")
      }
      SimHashSig(children.head, n)
    })

  val shingles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingles"),
    new ExpressionInfo(classOf[Shingles].getName, "shingles"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new IllegalArgumentException(
          s"shingles requires (array<string>, n), got ${children.length} args")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"shingles n must be an integer literal, got $other")
      }
      Shingles(children.head, n)
    })
}
