package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The `functions.aggregate`/`zip_with` formulation is a higher-order
  * function — CodegenFallback, interpreted, with per-element lambda-closure
  * overhead; at ~1e6 pairs × 64 dims that interpretation dominates entire
  * query runtimes. This expression compiles to a tight Java loop inside
  * whole-stage codegen (~50× on the similarity benchmarks).
  *
  * Summation is strictly left-to-right (`acc += a[i]*b[i]`), the exact
  * operation order of both the previous fold AND DuckDB's
  * `list_dot_product`, so oracle hash-matches are preserved bit-for-bit.
  *
  * Null ELEMENTS inside the arrays are not supported (embedding vectors are
  * dense); null arrays propagate null via BinaryExpression's default
  * null-intolerant eval.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is private[sql] in Spark 4, so enforce the contract
  // via checkInputDataTypes: without it, an int array would be read with
  // getDouble at wrong offsets — silent garbage, not an error
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot = copy(newLeft, newRight)
}

/** Codegen'd 16-bit SimHash over an `array<int>` of per-token hashes.
  *
  * Semantics (bit j set iff Σ over tokens of ±1 votes ≥ 0) are pure integer
  * math — identical to the 16-pass higher-order-function formulation and to
  * the DuckDB oracle, but computed in one tight loop instead of 16
  * interpreted `transform`+`aggregate` passes per row.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<int>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val sums = new Array[Int](16)
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      val v = xs.getInt(i)
      var j = 0
      while (j < 16) {
        sums(j) += (if (((v >> j) & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0
    var j = 0
    while (j < 16) {
      if (sums(j) >= 0) out |= (1 << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sums = ctx.freshName("sums")
      val out = ctx.freshName("out")
      s"""
         |int[] $sums = new int[16];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int $v = $a.getInt($i);
         |  for (int $j = 0; $j < 16; $j++) {
         |    $sums[$j] += ((($v >> $j) & 1) == 1) ? 1 : -1;
         |  }
         |}
         |int $out = 0;
         |for (int $j = 0; $j < 16; $j++) {
         |  if ($sums[$j] >= 0) $out |= (1 << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(newChild)
}

object VectorFunctions {
  /** Dot product of two array<double> columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** 16-bit SimHash of an array<int> token-hash column (codegen'd). */
  def simhash16(hashes: Column): Column =
    GraftColumnBridge.column(SimHash16(GraftColumnBridge.expression(hashes)))
}
