package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** `size(array_intersect(a, b))` without materializing the
  * intermediate array: one hash-set membership pass that COUNTS the
  * distinct common elements instead of building, copying and then
  * measuring a `GenericArrayData`.
  *
  * Semantics replicate the composed form exactly for the supported
  * element types (string / int / long — float types are deliberately
  * excluded so NaN/−0.0 set-normalization subtleties can never
  * diverge): result = number of DISTINCT elements of `a` also present
  * in `b`, a null element counted once when present in both, null if
  * either input array is null (i.e. `size(..., legacySizeOfNull =
  * false)` behavior — the rewrite rule only fires in that mode).
  */
case class ArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_intersect_size"

  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val inB = new java.util.HashSet[Any]()
    var bHasNull = false
    var i = 0
    val ny = y.numElements()
    while (i < ny) {
      if (y.isNullAt(i)) bHasNull = true
      else inB.add(y.get(i, elemType))
      i += 1
    }
    val seen = new java.util.HashSet[Any]()
    var nullCounted = false
    var cnt = 0
    i = 0
    val nx = x.numElements()
    while (i < nx) {
      if (x.isNullAt(i)) {
        if (bHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = x.get(i, elemType)
        if (inB.contains(v) && seen.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: `Size(ArrayIntersect(a, b))` →
  * [[ArrayIntersectSize]] for supported element types. Registered
  * cluster-wide through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via [[IntersectSizeRewrite
  * .install]].
  */
case class IntersectSizeRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def supported(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacySizeOfNull)
          if !legacySizeOfNull && !SQLConf.get.legacySizeOfNull &&
            supported(ai.left) && supported(ai.right) =>
        ArrayIntersectSize(ai.left, ai.right)
    }
}

object IntersectSizeRewrite {
  /** Idempotently add the rule to a live session's experimental
    * optimizations (for sessions not built with GraftExtensions). */
  def install(s: SparkSession): Unit = {
    val cur = s.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[IntersectSizeRewrite]))
      s.experimental.extraOptimizations = cur :+ IntersectSizeRewrite(s)
  }
}
