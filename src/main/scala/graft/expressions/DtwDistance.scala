package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dynamic-time-warping distance between two integer sequences as a
  * codegen'd native expression — the classic elastic sequence-
  * similarity measure (Sakoe & Chiba 1978) that aligns two series of
  * possibly different lengths/phases before summing pointwise costs.
  * The behavioral-analytics workhorse for "do these two users have the
  * same daily activity SHAPE even if shifted a few hours?" — exactly
  * the question Euclidean distance over hour-of-day profiles gets
  * wrong. Spark ships no sequence-alignment primitive; a Scala UDF
  * here would break whole-stage codegen in the pair-join stage where
  * the distance runs.
  *
  * Semantics (full DP, no band — inputs in this engine are small
  * fixed-dimension profiles, e.g. 24 hourly bins, where a band saves
  * nothing):
  *  - cost(i, j) = |a(i) − b(j)| in exact Long arithmetic;
  *  - D(i, j)   = cost(i, j) + min(D(i−1, j), D(i, j−1), D(i−1, j−1));
  *  - result    = D(n−1, m−1); Long, order-independent (no floats),
  *    so the DuckDB oracle (a recursive-CTE row-major replay of the
  *    same DP) is hash-exact at any scale.
  *  - Degenerate inputs: both empty → 0; exactly one empty → −1
  *    (alignment undefined; sentinel, pinned by spec).
  *
  * O(n·m) time, O(min-side) space via a rolling DP row — constant
  * per-row work for fixed-dimension profiles, so the expression stays
  * a map-side scalar: at 100 TB the cost is the pair-generation join
  * above it, never the distance itself.
  */
object DtwDistanceImpl {

  private def rejectNulls(arr: ArrayData, n: Int): Unit = {
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"dtw_distance: null element at index $i — ArrayData.getLong " +
          "on a null slot is undefined (would read garbage bits); " +
          "clean the array (filter/array_compact) before aligning")
      i += 1
    }
  }

  def distance(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    // one O(n+m) pre-scan, kept out of the O(n·m) DP loops — the type
    // system can't prove containsNull=false (aggregate-built arrays
    // are nullable-typed even when no element ever is), so a loud
    // error here replaces silent garbage (ADVICE r7)
    rejectNulls(a, n)
    rejectNulls(b, m)
    if (n == 0 && m == 0) return 0L
    if (n == 0 || m == 0) return -1L
    // roll over the shorter side to bound the scratch row
    val (x, xn, y, ym) =
      if (m <= n) (a, n, b, m) else (b, m, a, n)
    val prev = new Array[Long](ym)
    val cur = new Array[Long](ym)
    var j = 0
    var acc = 0L
    while (j < ym) { // first DP row: only the left neighbor exists
      acc = math.abs(x.getLong(0) - y.getLong(j)) +
        (if (j == 0) 0L else acc)
      prev(j) = acc
      j += 1
    }
    var i = 1
    while (i < xn) {
      val xi = x.getLong(i)
      cur(0) = math.abs(xi - y.getLong(0)) + prev(0)
      j = 1
      while (j < ym) {
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = math.abs(xi - y.getLong(j)) + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, ym)
      i += 1
    }
    prev(ym - 1)
  }
}

case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"dtw_distance expects (array<bigint>, array<bigint>), got ($a, $b)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DtwDistanceImpl.distance(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.DtwDistanceImpl.distance($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DtwDistance = copy(left = l, right = r)
}

object DtwDistanceCol {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `dtw_distance(a, b)` → total DTW alignment cost as a long column. */
  def dtw_distance(a: Column, b: Column): Column =
    column(DtwDistance(expression(a), expression(b)))
}
