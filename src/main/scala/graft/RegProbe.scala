package graft

/** Round-12 bench-creep A/B: the driver's headline bench regressed
  * monotonically r9→r11 (5.28 → 5.58 → 6.69 s) while the same code on a
  * quiet host measured 5.64 s; the round-11 verdict's first suspect was
  * `GraftFunctions.register` churn (every Column helper re-ran the full
  * 10-function registration — the "function replaced" WARN spam in the
  * bench tail). This probe interleaves A/B reps of the headline suite
  * IN ONE JVM — arm A = guarded once-per-session registration (the
  * round-12 fix), arm B = per-call re-registration (the r9–r11 code
  * path) — so JIT state, page cache and host weather are shared and the
  * per-rep delta isolates the registration cost alone.
  *
  * Usage: runMain graft.RegProbe [sfDir] [repsPerArm]
  * Prints one line per rep plus a final per-arm min/median table.
  */
object RegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = Session.get("graft-reg-probe")
    spark.sparkContext.setLogLevel("ERROR") // WARN spam is arm B's cost;
    // keep the log channel itself identical across arms by silencing it
    // for BOTH — the probe measures registry churn, not console I/O.
    // (A second run with WARN left on measures the spam's own cost.)
    if (args.length > 2 && args(2) == "warn")
      spark.sparkContext.setLogLevel("WARN")
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    // same warmup as Bench
    try { force("q6_timeframe"); force("q1_total_margin_2m"); force("q19_fingerprint") }
    catch { case t: Throwable => t.printStackTrace(System.err) }
    val suite = Bench.headline
    def runSuite(): Double = {
      val t0 = System.nanoTime()
      suite.foreach(force)
      (System.nanoTime() - t0) / 1e9
    }
    val a = scala.collection.mutable.ArrayBuffer[Double]()
    val b = scala.collection.mutable.ArrayBuffer[Double]()
    // interleaved A,B,A,B… — a host-interference window hits both arms
    (1 to reps).foreach { r =>
      graft.plans.GraftFunctions.perCallRegistration = false
      val ta = runSuite(); a += ta
      graft.plans.GraftFunctions.perCallRegistration = true
      val tb = runSuite(); b += tb
      println(f"REGPROBE rep$r guarded=$ta%.3f s  per-call=$tb%.3f s")
    }
    graft.plans.GraftFunctions.perCallRegistration = false
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      // true median: mean of the middle pair when the count is even
      // (s(n/2) alone would bias the even-rep default upward)
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      f"min=${s.head}%.3f med=$med%.3f"
    }
    println(s"REGPROBE guarded : ${stats(a.toSeq)}")
    println(s"REGPROBE per-call: ${stats(b.toSeq)}")
    spark.stop()
  }
}
