package graft

/** Pure decision rules for the bench harness — extracted so the
  * budget/shedding/remediation policies are unit-testable without a
  * Spark session or a real loud host (round-15 verdict #1/#4/#5: the
  * r15 driver bench timed out, rc=124, because the work program was
  * fixed-size with no wall-clock budget, remediation ADDED reps
  * exactly when the host was loud, and the spread-trend guard
  * classified host weather as systematic degradation).
  *
  * The bench's work program is priority-ordered — headline → ingest →
  * x1 → x10 → x20 — and every unit after the first full headline
  * round checks [[shed]] before running; what doesn't fit the budget
  * is recorded under `skipped_deadline`, never silently absent.
  */
object BenchPolicy {

  /** Default wall-clock budget (seconds), env-overridable via
    * SPARK_GRAFT_BENCH_BUDGET_S. Sized comfortably under the driver's
    * observed kill window (the r15 SIGTERM landed past ~3600 s; a
    * quiet-host full program measured 3050 s wall in round 16, with
    * the last ~80 s the x20 io passes): the budget sheds the
    * expendable tail instead of letting the driver's timeout lose the
    * whole artifact. Worst-case overrun past the budget is one lane
    * rep + the retry pass + shutdown (~250 s), still ~200 s under the
    * kill window. */
  val DefaultBudgetS: Double = 3150.0

  /** Seconds held back from the work budget for end-of-run accounting:
    * the fallback retry pass, the untimed io passes' cleanup, JSON
    * assembly and the shutdown quiesce must always fit. */
  val RetryReserveS: Double = 90.0

  /** A unit of work past the deadline is shed (skip-and-record). */
  def shed(remainingS: Double): Boolean = remainingS <= 0

  /** Consecutive-gated-rep counter fold: ext_cores above the threshold
    * extends the streak, a quiet rep resets it, and a rep with NO
    * /proc evidence (ext < 0) leaves it unchanged — absence of
    * evidence is never evidence of quiet. */
  def nextConsecutiveGated(prev: Int, extCores: Double,
                           threshold: Double): Int =
    if (extCores < 0) prev
    else if (extCores > threshold) prev + 1
    else 0

  /** Remediation admission (round-15 verdict #4): gated-extra and
    * steady reps exist to catch a QUIET window — once the host has
    * been loud for `loudCap` consecutive reps, more reps buy nothing
    * and burn the budget, so remediation stops (the lane falls back,
    * recorded, exactly as if the extra reps had run and gated). */
  def remediationAllowed(consecutiveGated: Int, loudCap: Int): Boolean =
    consecutiveGated < loudCap

  /** Total remediation reps admitted under a rep-by-rep ext_cores
    * trace — the bounded-rep-count law the simulated-loud spec
    * asserts: on a host loud from the start, admissions stop after
    * `loudCap` reps regardless of how many are offered. */
  def simulateRemediation(extTrace: Seq[Double], threshold: Double,
                          loudCap: Int): Int = {
    var streak = 0
    var admitted = 0
    extTrace.foreach { ext =>
      if (remediationAllowed(streak, loudCap)) admitted += 1
      streak = nextConsecutiveGated(streak, ext, threshold)
    }
    admitted
  }

  /** Spread-trend severity (round-15 verdict #5): growth in raw >5x
    * rep spreads is an ERROR (exit 3) only on a quiet host — on a
    * loud one (any load-gate fallback, or remediation capped) the
    * growth is host weather, downgraded to a warning. Quiet-host
    * growth keeps the r13 guard's teeth. */
  def spreadTrendSeverity(violated: Boolean, hostLoud: Boolean): String =
    if (!violated) "ok" else if (hostLoud) "warning" else "error"
}
