package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a key-LESS windowed interval join into the
  * bucketed equi-join + exact refine that
  * `graft.ops.TemporalJoins.rangeJoin` builds by hand — so a user
  * writing plain SQL
  *
  * {{{
  * SELECT ... FROM l JOIN r ON r.t BETWEEN l.t - 10 AND l.t
  * }}}
  *
  * gets a bounded-fan-out hash join instead of the O(n·m)
  * BroadcastNestedLoop/Cartesian Spark plans for a pure inequality
  * condition. (With an equi key present Spark already hash-joins on
  * the key and evaluates the range as a residual — fine at sane key
  * cardinality — so this rule deliberately targets only the key-less
  * form, where the blow-up is unconditional.) This is the one place
  * the engine drops to a Catalyst `Rule[LogicalPlan]`: the SEMANTICS
  * are expressible by composition (TemporalJoins does it), but the
  * PLAN a SQL user gets is not — only an optimizer rewrite can fix
  * the shape behind the declarative surface.
  *
  * Matched shape (deliberately strict so the rule can never fire on a
  * join it doesn't understand): INNER join whose condition conjuncts
  * are exactly
  *   - `rt <= lt` (right time at-or-before left time),
  *   - `rt >= lt - w` with `w` a positive numeric literal,
  * with `lt`/`rt` NUMERIC time columns (epoch seconds/millis — the
  * TIMESTAMP/INTERVAL form is future work). Rewrite: left explodes to
  * its own and previous `w`-wide bucket, right projects its bucket,
  * the join becomes a bucket equi-join, and the ORIGINAL condition is
  * re-applied as an exact refine filter — so the rewrite can only
  * ever REMOVE the pairing blow-up, never change results.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      matchRange(cond, left, right) match {
        case Some((lt, rt, w)) =>
          rewrite(j, left, right, cond, hint, lt, rt, w)
        case None => j
      }
  }

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** (leftTime, rightTime, windowSeconds). */
  private def matchRange(cond: Expression, left: LogicalPlan,
                         right: LogicalPlan)
      : Option[(Attribute, Attribute, Double)] = {
    val conjuncts = splitConjuncts(cond)
    if (conjuncts.length != 2) return None

    var upper: Option[(Attribute, Attribute)] = None        // rt <= lt
    var lower: Option[(Attribute, Attribute, Double)] = None // rt >= lt - w

    def asTimeAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.dataType.isInstanceOf[NumericType] => Some(a)
      case _ => None
    }
    def litSeconds(e: Expression): Option[Double] = e match {
      case Literal(v: Number, _) if v.doubleValue() > 0 =>
        Some(v.doubleValue())
      case _ => None
    }

    conjuncts.foreach {
      // rt <= lt   (either comparison direction)
      case LessThanOrEqual(r, l)
          if fromOnly(r, right) && fromOnly(l, left) =>
        upper = upper.orElse(for {
          ra <- asTimeAttr(r); la <- asTimeAttr(l)
        } yield (ra, la))
      case GreaterThanOrEqual(l, r)
          if fromOnly(l, left) && fromOnly(r, right) =>
        upper = upper.orElse(for {
          la <- asTimeAttr(l); ra <- asTimeAttr(r)
        } yield (ra, la))
      // rt >= lt - w   (either direction)
      case GreaterThanOrEqual(r, Subtract(l, w, _))
          if fromOnly(r, right) && fromOnly(l, left) =>
        lower = lower.orElse(for {
          ra <- asTimeAttr(r); la <- asTimeAttr(l); ws <- litSeconds(w)
        } yield (ra, la, ws))
      case LessThanOrEqual(Subtract(l, w, _), r)
          if fromOnly(r, right) && fromOnly(l, left) =>
        lower = lower.orElse(for {
          la <- asTimeAttr(l); ra <- asTimeAttr(r); ws <- litSeconds(w)
        } yield (ra, la, ws))
      case _ => ()
    }

    for {
      (rtU, ltU) <- upper
      (rtL, ltL, w) <- lower
      if rtU.semanticEquals(rtL) && ltU.semanticEquals(ltL)
    } yield (ltU, rtU, w)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def bucket(t: Expression, w: Double): Expression =
    Floor(Divide(Cast(t, DoubleType), Literal(w, DoubleType)))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      lt: Attribute, rt: Attribute, w: Double)
      : LogicalPlan = {
    // left probes its own and the previous bucket
    val bAttr = AttributeReference("__rj_bucket", LongType)()
    val gen = Generate(
      Explode(CreateArray(Seq(
        bucket(lt, w), Subtract(bucket(lt, w), Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bAttr), child = left)
    // right carries its bucket
    val rb = Alias(bucket(rt, w), "__rj_bucket_r")()
    val proj = Project(right.output :+ rb, right)
    val newCond = EqualTo(bAttr, rb.toAttribute)
    val bucketJoin = Join(gen, proj, Inner, Some(newCond), hint)
    // exact refine with the ORIGINAL condition, then restore the
    // original output (drop the bucket columns)
    Project(j.output, Filter(cond, bucketJoin))
  }
}
