package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-time attribution for one named query (optimization
  * guide §1: measure first — a multi-job operator like q22 runs its
  * index builds as separate eager jobs, so per-rep wall time alone
  * cannot say whether the shingle build, the signature build, or the
  * final pair plan is the cost). Prints every Spark job's duration
  * during N warmed reps; job order within a rep is deterministic
  * (eager localCheckpoints run in call order, the AQE final plan
  * last). Usage: runMain graft.JobProbe [sfDir] [name] [reps]. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q22_minhash_lsh"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Session.get("graft-job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime()): Unit
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != 0L)
          println(f"JOBPROBE job ${j.jobId}%3d  ${(System.nanoTime() - s) / 1e9}%7.3f s")
      }
    })
    def run(): Unit = SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    run() // warm-up: codegen/JIT off the clock, like Bench's warm pass
    Thread.sleep(500)
    (1 to reps).foreach { i =>
      println(s"JOBPROBE === $name rep $i ===")
      val t0 = System.nanoTime(); run()
      println(f"JOBPROBE total rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(500) // drain the async listener bus between reps
    }
    spark.stop()
  }
}
