package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's budget/remediation/trend decision rules, tested
  * as pure functions (round-15 verdict #4/#5: a loud host must bound
  * the remediation rep count and downgrade spread-trend growth to a
  * warning — simulated here rep-by-rep, no real interference needed). */
class BenchPolicySpec extends AnyFunSuite {

  test("shed: past-deadline units are shed, in-budget units run") {
    assert(!BenchPolicy.shed(remainingS = 1.0))
    assert(BenchPolicy.shed(remainingS = 0.0))
    assert(BenchPolicy.shed(remainingS = -5.0))
  }

  test("consecutive-gated streak: loud extends, quiet resets, no-evidence holds") {
    val thr = 1.0
    assert(BenchPolicy.nextConsecutiveGated(0, 2.5, thr) === 1)
    assert(BenchPolicy.nextConsecutiveGated(3, 1.7, thr) === 4)
    assert(BenchPolicy.nextConsecutiveGated(5, 0.2, thr) === 0)
    // -1 = /proc unavailable: absence of evidence never resets OR
    // extends the streak
    assert(BenchPolicy.nextConsecutiveGated(4, -1.0, thr) === 4)
    // exactly at the threshold is NOT gated (the gate is strict >)
    assert(BenchPolicy.nextConsecutiveGated(2, 1.0, thr) === 0)
  }

  test("remediation on an always-loud host is bounded by the loud cap") {
    // r15's failure shape: gated_reps 32, every one of them a
    // remediation rep that never landed clean. Under the cap, an
    // arbitrarily long loud trace admits exactly loudCap reps.
    val loudTrace = Vector.fill(100)(3.0) // 3 external cores, forever
    assert(BenchPolicy.simulateRemediation(loudTrace, 1.0, loudCap = 6) === 6)
    assert(BenchPolicy.simulateRemediation(loudTrace, 1.0, loudCap = 3) === 3)
  }

  test("remediation resumes after a quiet window resets the streak") {
    // loud for 4, quiet for 1, loud for 10: the quiet rep resets the
    // streak, so admissions = 4 (streak 0..3) + 1 (quiet) + 6 (streak
    // 0..5 of the second loud run under cap 6) = 11
    val trace = Vector.fill(4)(3.0) ++ Vector(0.1) ++ Vector.fill(10)(3.0)
    assert(BenchPolicy.simulateRemediation(trace, 1.0, loudCap = 6) === 11)
  }

  test("quiet host admits every offered remediation rep") {
    val quiet = Vector.fill(20)(0.0)
    assert(BenchPolicy.simulateRemediation(quiet, 1.0, loudCap = 6) === 20)
  }

  test("spread-trend severity: loud-host growth is a warning, quiet-host an error") {
    assert(BenchPolicy.spreadTrendSeverity(violated = false,
      hostLoud = false) === "ok")
    assert(BenchPolicy.spreadTrendSeverity(violated = false,
      hostLoud = true) === "ok")
    // the r15 case: growth on a host with load1 2.7-4.0 → warning
    assert(BenchPolicy.spreadTrendSeverity(violated = true,
      hostLoud = true) === "warning")
    // the r13 guard keeps its teeth on a quiet host
    assert(BenchPolicy.spreadTrendSeverity(violated = true,
      hostLoud = false) === "error")
  }
}
