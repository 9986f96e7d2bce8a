package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared-L2 distance between a vector column and a centroid
  * array, accumulating in double left-to-right — bit-identical to the
  * `aggregate(zip_with((x, y) => (x-y)*(x-y)))` fold in Similarity.l2sq
  * but a primitive loop inside whole-stage codegen. This is the IVF
  * assignment hot path: centroidRanks evaluates it rows x cells times
  * (every Lloyd iteration and every probe), and the interpreted HOF form
  * paid ArrayData/lambda churn per element there (measured: sim2 3.3x
  * the oracle and a 12.9 s sim3 index build at sf1 — both dominated by
  * this inner loop, same disease the x17 HDR fold had).
  *
  * Accepts array<float> or array<double> on either side (vectors are
  * float32; centroid means are rounded doubles); each element is
  * widened to double exactly as `cast(x as double)` does, so decisions
  * match the HOF twin bit for bit — for EQUAL-LENGTH arrays with
  * NON-NULL elements (the only shape embeddings/centroids take). A
  * length mismatch throws rather than silently summing a prefix; null
  * elements are read as 0.0 (the HOF twin would return NULL) — callers
  * with nullable elements must pre-filter.
  */
case class L2SqF32(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_f32 expects array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"l2sq_f32: length mismatch ($n vs ${y.numElements()})")
    val xf = isFloat(left); val yf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, idx: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      code"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException(
            "l2sq_f32: length mismatch (" + $n + " vs " + $b.numElements() + ")");
        }
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = ${get(a, i, isFloat(left))} - ${get(b, i, isFloat(right))};
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """.toString
    })

  override def prettyName: String = "l2sq_f32"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqF32 =
    copy(left = newLeft, right = newRight)
}
