package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float vectors, summed
  * left-to-right in ascending index order.
  *
  * This is the engine's one custom `Expression` — the ANN candidate scan
  * computes one dot per (query, candidate) pair, and the built-in route
  * (`aggregate(zip_with(...))`) is an interpreted higher-order chain that
  * allocates a zipped array per row. `doGenCode` emits a tight primitive loop
  * that stays inside whole-stage codegen. The ascending-index IEEE summation
  * order is part of the CONTRACT: it makes the value bit-identical to the
  * DuckDB oracle's sequential `list_reduce` fold (and to the HOF form it
  * replaces), so the hash-compare correctness gate still applies.
  *
  * Elements must be non-null (embedding vectors are dense); mismatched lengths
  * dot the common prefix.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot needs two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column form (direct Catalyst construction — no session registration or
    * UDF indirection needed). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatVecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Native Catalyst expression: the hyperplane-LSH bucket of one float vector
  * against a FIXED plane-coefficient table (`coefs(p*d + i)` = integer
  * coefficient of dimension i in plane p; see `SimOps.planeCoef`).
  *
  * For each plane p it computes the exact integer dot
  * Σ_i floor(1000·x_i)·c_{p,i} over the vector's first min(len, d) elements
  * (null elements contribute 0) and sets bit p of the result iff the dot is
  * positive — bit-for-bit the value of the relational
  * explode → coef-join → sum → sign pipeline it replaces (FunctionsSpec
  * asserts equality), and of the DuckDB oracle's mirror of that pipeline.
  *
  * Round-6 optimization (guide §1.2 step 2 "per-task work", §2.4 "remove
  * shuffles outright"): as a PROJECTION the signature costs zero exchanges
  * and fuses into the scan, where the relational form paid an explode
  * shuffle + aggregate + join-back per call; an unrolled built-in-expression
  * encoding of the same dot (d×planes Add/Multiply nodes) compiles to a
  * pathological whole-stage method (measured ~0.3 ms/row at d=64, p=8),
  * while this loop runs at memory speed and keeps codegen output small.
  * Second custom Expression after [[FloatVecDot]], same justification
  * pattern: a hot-path arithmetic kernel the built-in surface cannot express
  * efficiently. */
case class HyperplaneBucket(child: Expression, planes: Int, d: Int,
                            coefs: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(coefs.length == planes * d,
    s"coefs must be planes*d = ${planes * d} longs, got ${coefs.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs an array<float> input, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), d)
    val dots = new Array[Long](planes)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val xi = math.floor(x.getFloat(i).toDouble * 1000.0).toLong
        var p = 0
        while (p < planes) { dots(p) += xi * coefs(p * d + i); p += 1 }
      }
      i += 1
    }
    var b = 0L
    var p = 0
    while (p < planes) { if (dots(p) > 0) b |= (1L << p); p += 1 }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cf = ctx.addReferenceObj("hpCoefs", coefs, "long[]")
      val n = ctx.freshName("n")
      val dots = ctx.freshName("dots")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val xi = ctx.freshName("xi")
      val b = ctx.freshName("b")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $d);
         |long[] $dots = new long[$planes];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $xi = (long) java.lang.Math.floor(((double) $x.getFloat($i)) * 1000.0);
         |    for (int $p = 0; $p < $planes; $p++) {
         |      $dots[$p] += $xi * $cf[$p * $d + $i];
         |    }
         |  }
         |}
         |long $b = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  if ($dots[$p] > 0) $b |= (1L << $p);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  def bucket(vec: Column, planes: Int, d: Int, coefs: Array[Long]): Column =
    GraftColumnBridge.column(HyperplaneBucket(
      GraftColumnBridge.expression(vec), planes, d, coefs))
}
