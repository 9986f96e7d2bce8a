package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rank-1 IVF cell assignment: the nearest centroid of a
  * vector, decided by (round(l2sq, 6) ASC, cell label ASC) — exactly the
  * first element of `centroidRankCells`'s
  * `array_sort(transform(centsLit, c => struct(round(l2sq_f32(v, c._2), 6),
  * c._1)))`, without materializing and sorting `cells` structs per row.
  *
  * This is the per-row hot path of IVF assignment (sim2, every Lloyd
  * iteration of the index build, ivfTopK's candidate side): the HOF form
  * runs the transform lambda INTERPRETED — cells struct allocations +
  * boxed round per row — and drops the whole projection out of
  * whole-stage codegen. Measured at the sf0.1 gate: each Lloyd pass over
  * the cached vectors cost ~0.35 s warm of which ~all was this
  * expression; the codegen'd argmin loop reads the centroid matrix from
  * a reference object with zero per-row allocation (guide rule:
  * eliminate non-codegen expressions in the hot path).
  *
  * Decision parity with the HOF form (pinned in SimilaritySpec):
  *  - same left-to-right double accumulation as l2sq_f32;
  *  - same rounding (Spark Round's double path: scala BigDecimal
  *    HALF_UP at scale 6 — NaN/Inf pass through);
  *  - same tie order (label ascending within equal d2; NaN d2 sorts
  *    last, as Spark's double ordering does).
  *
  * The centroid table child must be FOLDABLE (it is always the one typed
  * Literal `centroidRankCells` builds): it is decoded once per
  * task/operator, never per row.
  */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  private def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def labelType: DataType = right.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 => fs(0).dataType
    case _ => NullType
  }

  private def centsOk: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      (fs(0).dataType match {
        case LongType | IntegerType | StringType => true
        case _ => false
      }) && (fs(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects array<float|double> vector, got " +
          left.dataType.sql)
    else if (!centsOk || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "nearest_cell expects a FOLDABLE array<struct<label int|bigint|" +
          s"string, array<double>>> centroid table, got ${right.dataType.sql}")
    else if (emptyTable)
      TypeCheckResult.TypeCheckFailure(
        "nearest_cell requires a non-empty centroid table")
    else TypeCheckResult.TypeCheckSuccess

  // an EMPTY (or null) centroid table has no argmin; rejecting it at
  // analysis matches centsLiteral's None-on-empty contract — without
  // this the codegen path treated argmin's Java null as a non-null
  // InternalRow and NPE'd downstream (r21 ADVICE). Emptiness is decided
  // STRUCTURALLY: checkInputDataTypes runs on every analyzer/optimizer
  // validation of every fresh copy of the expression, so the original
  // `right.eval(null)` here — an interpreted evaluation of the whole
  // k x dim centroid tree — cost em3 ~1.7 s of per-construction driver
  // time at sf1 (plan-identical; pure analysis overhead). CreateArray /
  // Literal cover every table centroidRankCells builds; anything else
  // (e.g. a foldable Cast from SQL) falls back to one memoized eval.
  @transient private lazy val emptyTable: Boolean = right match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(cs, _) =>
      cs.isEmpty
    case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => true
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.asInstanceOf[ArrayData].numElements() == 0
    case _ =>
      val t = right.eval(null)
      t == null || t.asInstanceOf[ArrayData].numElements() == 0
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = true),
    StructField("c_label", labelType, nullable = true)))

  private def isFloatVec: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (labels, centroid matrix), decoded once from the foldable child. */
  @transient private lazy val table: (Array[Any], Array[Array[Double]]) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    val labels = new Array[Any](k)
    val cents = new Array[Array[Double]](k)
    val lt = labelType
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      labels(i) = lt match {
        case LongType => row.getLong(0)
        case IntegerType => row.getInt(0)
        case StringType => row.getUTF8String(0)
      }
      cents(i) = row.getArray(1).toDoubleArray()
      i += 1
    }
    (labels, cents)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (labels, cents) = table
    val v = a.asInstanceOf[ArrayData]
    val best = NearestCell.argmin(v, isFloatVec, cents, labels, labelType)
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", table._2, "double[][]")
    val labelsRef = ctx.addReferenceObj("labels", table._1,
      "java.lang.Object[]")
    val ltRef = ctx.addReferenceObj("lt", labelType,
      classOf[DataType].getName)
    val nc = NearestCell.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (v, _) =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $nc.argmin(" +
        s"$v, $isFloatVec, $centsRef, $labelsRef, $ltRef)")
  }

  override def prettyName: String = "nearest_cell"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

object NearestCell {

  /** Spark Round's DoubleType eval path, verbatim semantics. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def labelLt(a: Any, b: Any, lt: DataType): Boolean = lt match {
    case LongType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case IntegerType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
  }

  /** The argmin loop shared by interpreted eval and the generated code
    * (one virtual call per row; the inner distance loop is primitive).
    * Kept allocation-free until the single result row.
    */
  def argmin(v: ArrayData, floatVec: Boolean, cents: Array[Array[Double]],
      labels: Array[Any], lt: DataType): InternalRow = {
    val k = cents.length
    var bi = -1
    var bd = 0.0
    var ci = 0
    while (ci < k) {
      val c = cents(ci)
      val n = c.length
      if (n != v.numElements()) throw new IllegalArgumentException(
        s"nearest_cell: length mismatch (${v.numElements()} vs $n)")
      var s = 0.0
      var i = 0
      while (i < n) {
        val xi = if (floatVec) v.getFloat(i).toDouble else v.getDouble(i)
        val d = xi - c(i)
        s += d * d
        i += 1
      }
      val d2 = round6(s)
      // nan-safe (NaN sorts last) + label-ascending tiebreak — the
      // (d2, c_label) struct order array_sort used
      val cmp = if (bi < 0) -1 else java.lang.Double.compare(d2, bd)
      if (cmp < 0 || (cmp == 0 && labelLt(labels(ci), labels(bi), lt))) {
        bi = ci; bd = d2
      }
      ci += 1
    }
    if (bi < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bd, labels(bi)))
  }
}
