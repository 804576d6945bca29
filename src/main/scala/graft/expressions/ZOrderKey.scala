package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Morton (Z-order) key: bit-interleaving of `n` non-negative columns,
  * `bitsPerCol` bits each, into one long — the space-filling-curve
  * clustering key behind multi-dimensional data layout.
  *
  * Why it matters at 100 TB: parquet prunes on per-file/row-group
  * min-max stats, but a table sorted by ONE column has useless stats on
  * every other column. Sorting by the z-key keeps every interleaved
  * dimension locally compact, so predicates on ANY of them skip most
  * files ([[graft.ops.Scale.writeZOrdered]] is the write path). Same
  * technique as the OPTIMIZE ZORDER layout in open lakehouse formats.
  *
  * Values are taken modulo `2^bitsPerCol` (documented caller contract:
  * pre-scale/rank values into range — out-of-range values wrap and
  * degrade clustering, never correctness). Exact integer arithmetic,
  * emulated bit-for-bit by the generated SQL oracle.
  */
object ZOrderImpl {
  /** Interleave bit b of value c at output position `b * n + c`. */
  def interleave(values: ArrayData, bitsPerCol: Int): Long = {
    val n = values.numElements()
    val mask = (1L << bitsPerCol) - 1
    var out = 0L
    var c = 0
    while (c < n) {
      val v = values.getLong(c) & mask
      var b = 0
      while (b < bitsPerCol) {
        out |= ((v >>> b) & 1L) << (b * n + c)
        b += 1
      }
      c += 1
    }
    out
  }
}

case class ZOrderKey(child: Expression, bitsPerCol: Int)
    extends UnaryExpression {
  require(bitsPerCol >= 1 && bitsPerCol <= 63,
    s"zorder_key bitsPerCol must be in [1, 63], got $bitsPerCol")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      val n = child match {
        case CreateArray(elems, _) => elems.length
        case _ => 1
      }
      if (n * bitsPerCol > 63)
        TypeCheckResult.TypeCheckFailure(
          s"zorder_key: $n cols x $bitsPerCol bits exceeds 63 output bits")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects array<bigint>, got $other")
  }

  override protected def nullSafeEval(vs: Any): Any =
    ZOrderImpl.interleave(vs.asInstanceOf[ArrayData], bitsPerCol)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, vs =>
      s"graft.expressions.ZOrderImpl.interleave($vs, $bitsPerCol)")

  override protected def withNewChildInternal(c: Expression): ZOrderKey =
    copy(child = c)
}

object ZOrder {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `zorder_key(bitsPerCol, col1, col2, ...)` → BIGINT Morton key.
    * Columns are cast to long; `cols.length * bitsPerCol` must fit in
    * 63 bits.
    */
  def zorder_key(bitsPerCol: Int, cols: Column*): Column =
    column(ZOrderKey(
      CreateArray(cols.map(c => expression(c.cast("long")))), bitsPerCol))
}
