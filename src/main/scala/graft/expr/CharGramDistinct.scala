package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct-n-gram counter: `chargram_distinct(text, n)` ==
  * `size(array_distinct(charGrams(text, n)))` (the HOF twin,
  * TextOps.charGrams), but one compiled pass that packs each n-gram's
  * code points into a single long (21 bits each, exact for n <= 3 — no
  * hash collisions, so the count is EXACT, not approximate) and counts
  * them in a hash set. No per-gram string allocation, no array sort —
  * the chargram-stats hot path's per-row constant at 100 TB.
  */
case class CharGramDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("chargram_distinct: n must be a literal")
        else {
          val n = right.eval()
          if (n == null || n.asInstanceOf[Int] < 1 || n.asInstanceOf[Int] > 3)
            TypeCheckResult.TypeCheckFailure(
              s"chargram_distinct: n must be in [1, 3] (exact long packing), got $n")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"chargram_distinct expects (string, int), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(t: Any, n: Any): Any =
    CharGramDistinct.compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      s"${ev.value} = graft.expr.CharGramDistinct.compute($t, $n);"
    })

  override def prettyName: String = "chargram_distinct"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramDistinct =
    copy(left = newLeft, right = newRight)
}

object CharGramDistinct {
  /** Exact distinct count of n-grams over code points (n <= 3: each
    * gram packs losslessly into one long, 21 bits per code point).
    */
  def compute(text: UTF8String, n: Int): Int = {
    val cp = text.toString.codePoints().toArray
    val len = cp.length
    if (len < n) return 0
    val seen = new java.util.HashSet[java.lang.Long](len * 2)
    var i = 0
    while (i <= len - n) {
      var key = 0L
      var j = 0
      while (j < n) { key = (key << 21) | cp(i + j); j += 1 }
      seen.add(key)
      i += 1
    }
    seen.size
  }
}
