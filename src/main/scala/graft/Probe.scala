package graft

/** Micro-profiling main: times N repetitions of one named query in a
  * single warmed JVM (usage: runMain graft.Probe <sfDir> <name> [reps]).
  * Separates fixed per-call cost (planning/codegen/checkpoint jobs)
  * from data cost: if rep2+ stay near rep1 the cost is structural, if
  * they collapse it was compilation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q24_embedding_neardup"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Session.get("graft-probe")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"PROBE $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
