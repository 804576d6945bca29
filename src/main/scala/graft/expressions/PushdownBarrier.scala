package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that stops the optimizer from duplicating its child.
  *
  * Catalyst's `PushPredicateThroughNonJoin` substitutes a projected alias
  * into any predicate that references it and pushes the predicate below
  * the Project — correct, but it makes an expensive derived column (a
  * language-ID over the full text, a quality score) evaluate once in the
  * pushed filter and again in the surviving projection. Declaring this
  * wrapper non-deterministic makes that substitution illegal (pushdown
  * requires every replaced alias to be deterministic), so the predicate
  * stays ABOVE the projection that computes the column and the child
  * evaluates exactly once per row.
  *
  * The child's VALUE is still perfectly deterministic — the flag is used
  * only as the (sole public) optimizer fence; eval and codegen are a
  * straight passthrough, so there is no runtime cost.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {

  // the optimizer fence: see class doc. Value semantics stay pure.
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override def prettyName: String = "pushdown_barrier"

  override protected def withNewChildInternal(
      newChild: Expression): PushdownBarrier = copy(child = newChild)
}
