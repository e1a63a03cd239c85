package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
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

/** Codegen'd MinHash signature over an `array<string>` of shingles: one
  * md5 per element, then `numHashes` universal-hash derivations
  * `(a_i·h + b_i) mod P` folded into running minimums — all in ONE pass.
  *
  * Replaces a 17-pass higher-order-function pipeline (one `transform` for
  * the base hashes + numHashes × `array_min(transform(...))`), every pass
  * interpreted (HOFs are CodegenFallback) with the md5 cost paid through
  * the interpreted expression path. Semantics are bit-identical: the base
  * hash is the first 4 digest bytes read big-endian-unsigned, exactly
  * `conv(substring(md5(s), 1, 8), 16, 10)`, and (a_i, b_i, P) come from
  * [[graft.operators.TextOps]] so Scala, SQL and the DuckDB oracle stay in
  * lockstep.
  *
  * Returns null for an empty array (no shingles → no signature), matching
  * `array_min(transform(empty))` = null: downstream band keys
  * null-propagate and never join. Null ELEMENTS are skipped — the exact
  * semantics of the reference HOF path, where `conv(md5(null))` is null
  * and `array_min` ignores nulls — so an all-null array is also null.
  * (Internal callers feed non-null shingle arrays; the skip matters for
  * the registered SQL surface, where containsNull inputs are legal.)
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  private lazy val aCoef: Array[Long] =
    Array.tabulate(numHashes)(graft.operators.TextOps.minhashA)
  private lazy val bCoef: Array[Long] =
    Array.tabulate(numHashes)(graft.operators.TextOps.minhashB)

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val p = graft.operators.TextOps.MinhashP
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        contributed = true
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          xs.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < numHashes) {
          val v = (h * aCoef(j) + bCoef(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!contributed) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aCoef, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bCoef, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $any = true;
         |  byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5(
         |    $a.getUTF8String($i).getBytes());
         |  long $h = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |    (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${graft.operators.TextOps.MinhashP}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd wide SimHash signature over an `array<string>` of shingles:
  * one md5 per element (the same first-4-digest-bytes base hash as
  * [[MinHashSig]], `('0x' || substr(md5(x), 1, 8))::BIGINT` on the oracle
  * side), each element voting ±1 on the low `nBits` bits of its base hash,
  * positive sums setting the output bit — ONE pass over the array.
  *
  * This is the discriminative simhash the dedup pipeline bands on:
  * [[SimHash16]] over per-token hashes is the compact per-doc fingerprint
  * (d4), but 16 bits saturate at corpus scale — a pair-search needs the
  * wider signature over shingles (d5). `nBits` ≤ 32 because the base hash
  * has 32 bits of entropy.
  *
  * Null handling mirrors [[MinHashSig]]: null elements are skipped, an
  * empty or all-null array yields a NULL signature — downstream band bits
  * null-propagate and never equi-join, so shingle-less docs drop out of
  * pair search on both engines.
  */
case class SimHashSig(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 32, s"simhash width must be in [1,32], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sums = new Array[Int](nBits)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        contributed = true
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          xs.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < nBits) {
          sums(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!contributed) null
    else {
      var out = 0L
      var j = 0
      while (j < nBits) {
        if (sums(j) >= 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val sums = ctx.freshName("sums")
      val any = ctx.freshName("any")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $sums = new int[$nBits];
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $any = true;
         |  byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5(
         |    $a.getUTF8String($i).getBytes());
         |  long $h = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |    (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    $sums[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    if ($sums[$j] >= 0) $out |= (1L << $j);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Codegen'd distinct n-token shingles over an `array<string>` token
  * column: one pass building each window with `UTF8String.concatWs` and
  * deduplicating through an insertion-ordered set.
  *
  * Replaces `array_distinct(transform(sequence(1, size-n+1), i ->
  * concat_ws(" ", element_at(toks, i), ...)))` — interpreted (HOF), with a
  * sequence-array allocation plus n boxed element_at calls per window, and
  * a second full dedup pass. Semantics: identical string multiset →
  * first-occurrence-distinct; empty array (not null) when the text is
  * shorter than n tokens, matching the `when(size >= n, ...)` guard and
  * DuckDB's CASE guard. Downstream (MinHash minimums, intersection
  * cardinalities) is order-insensitive, but insertion order is preserved
  * anyway to mirror array_distinct exactly. Token elements must be
  * non-null (they come from `split`).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val total = xs.numElements()
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i <= total - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = xs.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("shingleSep",
      org.apache.spark.unsafe.types.UTF8String.fromString(" "),
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val total = ctx.freshName("total")
      val parts = ctx.freshName("parts")
      val seen = ctx.freshName("seen")
      s"""
         |int $total = $a.numElements();
         |java.util.LinkedHashSet $seen = new java.util.LinkedHashSet();
         |for (int $i = 0; $i <= $total - $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs($sepRef, $parts));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $seen.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Codegen'd nearest-centroid argmin — the k-means assignment kernel.
  *
  * Input: the vector `v` (array<double>), its precomputed self-dot `dxx`,
  * and the packed centroid table `cents` (array<struct<cluster:int,
  * c:array<double>, dcc:double>>, sorted by cluster id). Output:
  * struct<sq:double, cluster:int> — the minimum squared Euclidean distance
  * ‖v‖² − 2·v·c + ‖c‖² and its cluster, strict `<` so the LOWEST cluster id
  * wins ties; an empty centroid table yields (Double.MaxValue, −1).
  *
  * Null handling (the function is registered as public SQL, so arbitrary
  * input can reach it): a null STRUCT element in the centroid table, a
  * null field inside it, or a null double inside a centroid's `c` array
  * marks that centroid invalid and it is SKIPPED — identical in
  * interpreted and codegen paths; a table of only invalid entries
  * degenerates to the empty-table result (Double.MaxValue, −1).
  *
  * Bit-for-bit the same float ops in the same order as the
  * `functions.aggregate` fold it replaces (left-to-right dot, then
  * dxx − 2·dot + dcc), so the unrolled-CTE DuckDB oracles keep hashing
  * identically — but in ONE codegen'd loop instead of an interpreted
  * higher-order fold whose per-centroid lambda dominates every Lloyd
  * round's assignment pass.
  */
case class VecArgminCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val centsOk = third.dataType match {
      case ArrayType(org.apache.spark.sql.types.StructType(fields), _)
        if fields.length == 3 && fields(0).dataType == IntegerType &&
          fields(1).dataType == ArrayType(DoubleType, false) &&
          fields(2).dataType == DoubleType => true
      case ArrayType(org.apache.spark.sql.types.StructType(fields), _)
        if fields.length == 3 && fields(0).dataType == IntegerType &&
          fields(1).dataType == ArrayType(DoubleType, true) &&
          fields(2).dataType == DoubleType => true
      case _ => false
    }
    if (first.dataType == ArrayType(DoubleType, false) ||
      first.dataType == ArrayType(DoubleType, true)) {
      if (second.dataType == DoubleType) {
        if (centsOk) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"vec_argmin_cell needs array<struct<int, array<double>, double>> " +
            s"centroids, got ${third.dataType.simpleString}")
      } else TypeCheckResult.TypeCheckFailure(
        s"vec_argmin_cell needs a double self-dot, got ${second.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"vec_argmin_cell needs an array<double> vector, got ${first.dataType.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sq", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("cluster", IntegerType, nullable = false)))
  override def prettyName: String = "vec_argmin_cell"

  override def nullSafeEval(v: Any, dxx: Any, cents: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val dx = dxx.asInstanceOf[Double]
    val cs = cents.asInstanceOf[ArrayData]
    var bestSq = Double.MaxValue
    var bestCluster = -1
    var j = 0
    while (j < cs.numElements()) {
      if (!cs.isNullAt(j)) {
        val ct = cs.getStruct(j, 3)
        if (!ct.isNullAt(0) && !ct.isNullAt(1) && !ct.isNullAt(2)) {
          val c = ct.getArray(1)
          val n = math.min(xs.numElements(), c.numElements())
          var dot = 0.0
          var ok = true
          var i = 0
          while (ok && i < n) {
            if (c.isNullAt(i)) ok = false
            else { dot += xs.getDouble(i) * c.getDouble(i); i += 1 }
          }
          if (ok) {
            val sq = dx - 2.0 * dot + ct.getDouble(2)
            if (sq < bestSq) { bestSq = sq; bestCluster = ct.getInt(0) }
          }
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSq, bestCluster))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, dxx, cents) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sq = ctx.freshName("sq")
      val ct = ctx.freshName("ct")
      val c = ctx.freshName("c")
      val bestSq = ctx.freshName("bestSq")
      val bestCluster = ctx.freshName("bestCluster")
      val ok = ctx.freshName("ok")
      s"""
         |double $bestSq = Double.MAX_VALUE;
         |int $bestCluster = -1;
         |for (int $j = 0; $j < $cents.numElements(); $j++) {
         |  if ($cents.isNullAt($j)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $ct = $cents.getStruct($j, 3);
         |  if ($ct.isNullAt(0) || $ct.isNullAt(1) || $ct.isNullAt(2)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $ct.getArray(1);
         |  int $n = java.lang.Math.min($v.numElements(), $c.numElements());
         |  double $dot = 0.0;
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $n; $i++) {
         |    if ($c.isNullAt($i)) { $ok = false; }
         |    else { $dot += $v.getDouble($i) * $c.getDouble($i); }
         |  }
         |  if (!$ok) continue;
         |  double $sq = $dxx - 2.0 * $dot + $ct.getDouble(2);
         |  if ($sq < $bestSq) { $bestSq = $sq; $bestCluster = $ct.getInt(0); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Double.valueOf($bestSq),
         |                 java.lang.Integer.valueOf($bestCluster) });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VecArgminCell =
    copy(newFirst, newSecond, newThird)
}

object VectorFunctions {
  /** Dot product of two array<double> columns (codegen'd). */
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Nearest-centroid (sq, cluster) over a packed centroid-struct array
    * (codegen'd; the k-means assignment kernel). */
  def vec_argmin_cell(v: Column, dxx: Column, cents: Column): Column =
    GraftColumnBridge.column(VecArgminCell(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(dxx),
      GraftColumnBridge.expression(cents)))

  /** 16-bit SimHash of an array<int> token-hash column (codegen'd). */
  def simhash16(hashes: Column): Column =
    GraftColumnBridge.column(SimHash16(GraftColumnBridge.expression(hashes)))

  /** MinHash signature (array<long> of k mins) of an array<string> shingle
    * column (codegen'd, one pass). */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(shingles), numHashes))

  /** Distinct n-token shingles of an array<string> token column
    * (codegen'd, one pass, insertion-ordered dedup). */
  def shingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(Shingles(GraftColumnBridge.expression(tokens), n))

  /** Wide (≤32-bit) SimHash signature of an array<string> shingle column
    * (codegen'd, one pass — md5 base hash + bit votes). */
  def simhash_sig(shingles: Column, nBits: Int): Column =
    GraftColumnBridge.column(
      SimHashSig(GraftColumnBridge.expression(shingles), nBits))
}
