package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.plans.AsOfJoinPlans.AsOfJoin

/** Push key-referencing predicates through [[AsOfJoin]]. Catalyst's
  * PushPredicateThroughJoin doesn't know custom nodes, so without this
  * rule a `filter(key = x)` above an as-of join scans both full inputs.
  * A predicate over the left join keys holds symmetrically for the
  * matched right row (equal keys), so it is pushed to BOTH sides —
  * partition pruning then applies before the shuffle, which is the
  * difference between scanning one key's data and 100 TB.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def rewriteToRight(pred: Expression, join: AsOfJoin): Option[Expression] = {
    val l2r = join.leftKeys.map(_.exprId).zip(join.rightKeys).toMap
    var ok = true
    val rewritten = pred.transformUp {
      case a: Attribute => l2r.get(a.exprId) match {
        case Some(r) => r
        case None => ok = false; a
      }
    }
    if (ok) Some(rewritten) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, join: AsOfJoin) =>
      val leftKeySet = AttributeSet(join.leftKeys)
      val conjuncts = splitConjuncts(cond)
      val (keyPreds, rest) = conjuncts.partition(c =>
        c.references.nonEmpty && c.references.subsetOf(leftKeySet) && c.deterministic)
      if (keyPreds.isEmpty) f
      else {
        val rightPreds = keyPreds.flatMap(p => rewriteToRight(p, join))
        if (rightPreds.length != keyPreds.length) f // a key not mappable; leave as-is
        else {
          val newLeft = Filter(keyPreds.reduce(And), join.left)
          val newRight = Filter(rightPreds.reduce(And), join.right)
          val pushed = join.copy(left = newLeft, right = newRight)
          // keep the original filter on top for any remaining conjuncts;
          // the pushed key predicates are implied, so dropping them from
          // the top is safe but keeping `rest` preserves exact semantics.
          rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Packaged registration: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.plans.
  * GraftExtensions`) wires the as-of strategy, the pushdown rule, and
  * graft's SQL functions into any session — the library-distribution
  * form of what `GraftSession`/`asofJoin` also do imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinPlans.AsOfStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    // same builder list registerAll uses imperatively — a session created
    // with spark.sql.extensions=graft.plans.GraftExtensions gets the full
    // SQL function surface without any graft API call
    graft.functions.GraftFunctions.sqlFunctionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))
    }
  }
}
