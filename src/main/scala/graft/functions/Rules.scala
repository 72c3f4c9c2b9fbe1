package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rules for graft expressions.
  *
  * [[FuseSosfilt]]: `sosfilt(A, sosfilt(B, x))` → `sosfilt(B ++ A, x)`
  * when both coefficient sets are literals. Exact rewrite — the kernel
  * processes the cascade section-by-section over the array
  * (Filt.sosfilt), so one call on the concatenated cascade performs
  * the identical arithmetic to two chained calls — and it saves one
  * full output-array materialization per row. Installed by
  * [[Functions.install]] via `spark.experimental.extraOptimizations`
  * and by [[GraftExtensions]] as an injected optimizer rule.
  */
object FuseSosfilt extends Rule[LogicalPlan] {

  private def lit(a: ArrayData): Literal =
    Literal.create(new GenericArrayData(a.toDoubleArray()),
      ArrayType(DoubleType, containsNull = false))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case DspExpr("sosfilt",
          Seq(Literal(outer: ArrayData, ArrayType(DoubleType, _)),
              DspExpr("sosfilt",
                Seq(Literal(inner: ArrayData, ArrayType(DoubleType, _)), x)))) =>
      // inner filter runs first → its sections come first in the cascade
      DspExpr("sosfilt", Seq(
        lit(new GenericArrayData(inner.toDoubleArray() ++ outer.toDoubleArray())), x))
  }
}
