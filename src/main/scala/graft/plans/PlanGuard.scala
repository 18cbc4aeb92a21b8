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

  private def windowMode: String =
    spark.conf.get("spark.graft.planGuard.windows", "off").toLowerCase

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == "warn" || m == "fail") {
      plan.foreach {
        case j: Join if !j.condition.exists(hasEquality) &&
            !boundedSide(j) && !broadcastHinted(j) =>
          val msg = "graft plan guard: join with no equality condition " +
            s"(${j.joinType}) — cartesian/nested-loop at scale:\n" +
            j.simpleString(3)
          if (m == "fail") throw new IllegalStateException(msg)
          else {
            logWarning(msg)
            PlanGuard.record(s"join with no equality condition (${j.joinType})")
          }
        case _ => ()
      }
    }
    // Separate dial (default off): a window with no PARTITION BY runs
    // the whole input through ONE task — the q79-class scale bug. Off
    // by default because the guard cannot see that a frame was already
    // reduced to a bounded grain (day-level rollups, a capped pack
    // queue): maxRows is unknown past any aggregate, and warning on
    // every documented-bounded window would bury real findings. Turn
    // it on when auditing NEW query code; the library's own global
    // windows are each justified at the use site.
    val wm = windowMode
    if (wm == "warn" || wm == "fail") {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      plan.foreach {
        case w: LWindow if w.partitionSpec.isEmpty &&
            !w.child.maxRows.exists(_ <= 1000L) =>
          val msg = "graft plan guard: window with no PARTITION BY — " +
            "single-partition execution at scale (use " +
            "graft.functions.Ranking for global ranks):\n" + w.simpleString(3)
          if (wm == "fail") throw new IllegalStateException(msg)
          else {
            logWarning(msg)
            PlanGuard.record("window with no PARTITION BY (single partition)")
          }
        case _ => ()
      }
    }
    plan
  }

  private def boundedSide(j: Join): Boolean =
    j.left.maxRows.exists(_ <= 1000L) || j.right.maxRows.exists(_ <= 1000L)

  /** An explicit broadcast() hint is an engineer's signed statement
    * that the side is dim-sized — the library's own bounded
    * cross-attachments (query batches, centroids, super-cells) all
    * carry it, and it survives into Join.hint by the time user-provided
    * optimizer rules run. */
  private def broadcastHinted(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.HintInfo
    def hinted(h: Option[HintInfo]): Boolean =
      h.exists(_.strategy.exists(
        _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
    hinted(j.hint.leftHint) || hinted(j.hint.rightHint)
  }

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

  /** Install AND arm in warn mode — what Verify/Bench run under, so a
    * plan regression becomes a recorded artifact (the bench JSON's
    * `plan_warnings`), not a per-round manual plan read. */
  def installWarn(spark: SparkSession): Unit = {
    spark.conf.set("spark.graft.planGuard", "warn")
    install(spark)
  }

  // Warn-mode findings, bounded; drained by Bench into its JSON line.
  private val warnings = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[graft] def record(msg: String): Unit =
    if (warnings.size < 100) warnings.add(msg)
  def drainWarnings(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var m = warnings.poll()
    while (m != null) { b += m; m = warnings.poll() }
    b.result().distinct
  }
}
