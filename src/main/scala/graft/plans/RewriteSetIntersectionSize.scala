package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.expressions.IntersectionSize

/** Optimizer rule: `size(array_intersect(a, b))` over non-null long
  * arrays never needs the intersection materialized — rewrite it to the
  * merge-counting [[IntersectionSize]] (~30× cheaper per row on
  * ~250-element arrays; see that expression's scaladoc).
  *
  * This is the `Rule[LogicalPlan]`-via-extensions surface of the
  * engine: users writing plain Spark (`size(array_intersect(...))` in a
  * set-similarity verify) get the fast path without knowing the custom
  * expression exists. Injected by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations`.
  *
  * Conditions: both inputs are `array<bigint>` with non-nullable
  * elements (IntersectionSize's analysis contract — ensures getLong
  * never reads a null) and `size` is in non-legacy mode (legacy
  * `sizeOfNull = -1` semantics are not replicated). Result type (int)
  * and nullability (either input null ⇒ null) match the original.
  */
object RewriteSetIntersectionSize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if !legacySizeOfNull &&
            a.dataType == ArrayType(LongType, containsNull = false) &&
            b.dataType == ArrayType(LongType, containsNull = false) =>
        IntersectionSize(a, b)
    }
}
