package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's winnowing,
  * the standard rolling-hash fingerprint for near-dup detection):
  * `winnow_fp(text, k, w)` → sorted distinct array<bigint> of the
  * sliding-window minima over the k-gram polynomial hashes
  * h_i = sum code(text[i+j]) * 31^(k-1-j).
  *
  * This is a TRUE rolling hash — one compiled O(n) pass per row with the
  * Rabin-Karp update h' = (h - c_out*31^(k-1))*31 + c_in and a monotonic
  * deque for the window minima — versus the value-identical HOF twin
  * (`TextOps.winnowFingerprintsHof`, O(n*k*w) interpreted) kept as the
  * oracle-parity form. k is capped at 8 so the hash stays exact in 63
  * bits for any Unicode code point (max 0x10FFFF * (31^8-1)/30 < 2^55,
  * rolling intermediate < 2^60), which keeps Spark longs, the HOF twin,
  * and DuckDB BIGINT arithmetic bit-identical with no modular reduction.
  */
case class WinnowFp(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "winnow_fp: k and w must be literals")
        else {
          val k = second.eval(); val w = third.eval()
          if (k == null || w == null ||
              k.asInstanceOf[Int] < 1 || k.asInstanceOf[Int] > 8 ||
              w.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(
              s"winnow_fp: need 1 <= k <= 8 and w >= 1, got k=$k w=$w")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"winnow_fp expects (string, int, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowFp.compute(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) => {
      s"${ev.value} = graft.expr.WinnowFp.compute($t, $k, $w);"
    })

  override def prettyName: String = "winnow_fp"

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFp =
    copy(first = f, second = s, third = t)
}

object WinnowFp {
  /** One rolling pass: k-gram hashes + deque sliding minima + distinct
    * sort. Characters are Unicode CODE POINTS (like Spark's `ascii()`,
    * DuckDB's `unicode()`, and both engines' `substr`/`length`), so the
    * twin equality holds beyond the BMP too.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cp = text.toString.codePoints().toArray
    val n = cp.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nh)
    var pow = 1L
    var h = 0L
    var j = 0
    while (j < k) {
      h = h * 31 + cp(j)
      if (j < k - 1) pow *= 31
      j += 1
    }
    hs(0) = h
    var i = 1
    while (i < nh) {
      h = (h - cp(i - 1) * pow) * 31 + cp(i + k - 1)
      hs(i) = h
      i += 1
    }
    // sliding minima via monotonic deque (indices, increasing values)
    val fps = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0
    var t = 0
    while (t < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(t)) tail -= 1
      dq(tail) = t
      tail += 1
      if (dq(head) <= t - w) head += 1
      if (t >= w - 1) fps.add(hs(dq(head)))
      t += 1
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}
