package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Runtime scale guardrail: an optimizer rule that watches for the plan
  * shapes that melt down at 100 TB — joins with no equality condition
  * (planned as cartesian products or broadcast-nested-loop joins).
  * PlanAuditSpec pins our OWN operators' plans in CI; this extends the
  * same guarantee to USER queries built on the library, at runtime.
  *
  * Off by default. `spark.graft.planGuard=warn` logs one line per
  * offending join; `=fail` raises with the offending plan fragment —
  * the right setting for a production 100 TB job where an accidental
  * cross join is an outage, not a perf bug. Joins where either side is
  * provably tiny (`maxRows` <= 1000 — e.g. the 1-row bounds frames the
  * retail queries cross-join on purpose) are exempt: a broadcast
  * nested loop over a bounded side is a legitimate plan. The rule only
  * inspects (never rewrites), so it cannot change results; deliberate
  * unbounded crosses (e.g. an exact all-pairs verifier) run under
  * `=off`/`=warn`.
  *
  * Installed by [[PlanGuard.install]] on a live session (or add the
  * rule through spark.sql.extensions at builder time).
  */
case class PlanGuard(spark: SparkSession) extends Rule[LogicalPlan] {
  private def mode: String =
    spark.conf.get("spark.graft.planGuard", "off").toLowerCase

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == "warn" || m == "fail") {
      plan.foreach {
        case j: Join if !j.condition.exists(hasEquality) &&
            !boundedSide(j) =>
          val msg = "graft plan guard: join with no equality condition " +
            s"(${j.joinType}) — cartesian/nested-loop at scale:\n" +
            j.simpleString(3)
          if (m == "fail") throw new IllegalStateException(msg)
          else logWarning(msg)
        case _ => ()
      }
    }
    plan
  }

  private def boundedSide(j: Join): Boolean =
    j.left.maxRows.exists(_ <= 1000L) || j.right.maxRows.exists(_ <= 1000L)

  /** A condition counts as keyed if ANY conjunct is an equality —
    * what the planner needs for a hash or sort-merge join. */
  private def hasEquality(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
    cond.exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _ => false
    }
  }
}

object PlanGuard {
  /** Install on a live session; idempotent. */
  def install(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[PlanGuard]) :+ PlanGuard(spark)
}
