package graft.plans

import graft.catalyst.JaccardSim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule (SURVEY guide category `Rule[LogicalPlan]`): rewrites
  * the composed Jaccard idiom
  *
  * {{{ size(array_intersect(a, b)) / size(array_union(a, b)) }}}
  *
  * over long arrays into the native single-pass [[JaccardSim]] expression.
  * The composed form materializes two intermediate arrays per row pair and
  * walks each input twice; the native kernel builds one hash set and
  * streams the other side — on a candidate-verification join (millions of
  * pairs at 100 TB) that is the hot loop.
  *
  * Registered through GraftExtensions.injectOptimizerRule, so user code
  * keeps writing the idiomatic built-in form and still gets the kernel.
  *
  * The kernel implements the exact set semantics of the composed form
  * (duplicates deduped, null elements compare equal like
  * array_intersect/array_union, 0/0 → NULL like non-ANSI Divide). Sole
  * remaining deviation: under ANSI mode two empty arrays yield NULL where
  * the composed Divide would raise DIVIDE_BY_ZERO. The rule does not fire
  * when spark.sql.legacy.sizeOfNull is set (size(NULL) = -1 changes the
  * composed form's NULL-array behavior in ways the kernel does not model).
  */
object JaccardRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** The analyzer wraps either size() in an implicit Cast to double. */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => c.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(l, r, _) =>
        (stripCast(l), stripCast(r)) match {
          // legacySizeOfNull = false only: under the legacy flag
          // size(NULL) = -1 gives the composed form semantics the kernel
          // does not model, so such plans are left untouched.
          case (Size(ArrayIntersect(a1, b1), false), Size(ArrayUnion(a2, b2), false))
              if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                isLongArray(a1) && isLongArray(b1) =>
            JaccardSim(a1, b1)
          case _ => d
        }
    }
}
