package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * - A warm-up pass (flagship join + a scan) runs first so JIT/codegen
  *   compilation isn't billed to the first timed query.
  * - Results are forced through the noop datasource: count() would let
  *   Catalyst prune aggregate value columns, undertiming the real work;
  *   noop materializes every output column without disk I/O.
  */
object Bench {
  // Headline set: one per operator family (join+window agg, per-key agg,
  // top-k, count-distinct, regex scan, hash dedup, MinHash+LSH, ANN).
  val headline: Seq[String] = Seq(
    "q1_total_margin_2m", "q3_revenue_per_day", "q4_top10_products",
    "q5_tx_per_store", "q17_lang_id", "q20_exact_dedup",
    "q22_minhash_lsh", "q25_cosine_topk", "q29_sessionization")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    Session.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // Warm-up: compile/JIT the scan + join + agg machinery AND the text
    // path (tokenizer/md5/shingle codegen) off the clock — measured
    // run-to-run variance on the dedup queries traces to JIT state, not
    // plan differences.
    try { force("q6_timeframe"); force("q1_total_margin_2m"); force("q19_fingerprint") }
    catch { case _: Throwable => () }

    // Three timed repetitions per query, report the minimum: single-shot
    // local[N] timings swing 2-3x with JIT/GC/host noise (measured), and
    // the minimum is the standard steady-state estimator — it reflects
    // the plan, not the weather. Tiered JIT keeps improving through the
    // second re-run on the heavy dedup queries (Probe: q22 reps
    // 12.0/3.0/1.9/1.6s), so two reps still under-sampled the steady
    // state. Every repetition runs the FULL query (no cross-run
    // caching: each call builds its own plan and the minhash index
    // checkpoint is per-call).
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try force(name) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Scale-up evidence: the expensive bucketed designs on a replicated
    // corpus (default 10x — ~50k docs / 20k vectors / 1M events at
    // sf0.1), single rep per point (the 1x/10x RATIO is the figure of
    // merit; both points share a warmed JVM so the comparison is fair).
    // Near-linear ratios mean no hidden quadratic survives the 10x.
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val scaleJson =
      if (factor <= 1) ""
      else {
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime()
          try f catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        def block(times: Int): String = {
          val docs = ScaleBench.documents(spark, sfDir, times)
          val emb = ScaleBench.embeddings(spark, sfDir, times)
          val ev = ScaleBench.events(spark, sfDir, times)
          def noop(df: org.apache.spark.sql.DataFrame): Unit =
            df.write.mode("overwrite").format("noop").save()
          // Untimed warm pass on a tiny slice of the SAME frames first:
          // first execution of each operator shape pays ~8s of one-time
          // codegen/JIT compile (measured: q24 rep1 10.2s, steady 1.5s),
          // and srpPairs' generated code differs per scale point
          // (autoSrpBits changes the signature width). Without this the
          // x1 point absorbs the compile and the x1/xN ratio understates
          // true data scaling.
          val srpBits = graft.operators.Similarity.autoSrpBits(emb.count())
          try {
            noop(ScaleBench.minhashPairs(docs.limit(64)))
            noop(ScaleBench.srpPairsWithBits(emb.limit(64), srpBits))
            noop(ScaleBench.sessionStats(ev.limit(64)))
            noop(ScaleBench.clusters(docs.limit(64)))
            noop(ScaleBench.ivfTopK(emb.limit(64)))
          } catch { case _: Throwable => () }
          Seq(
            "q22_minhash_xx" -> time(noop(ScaleBench.minhashPairs(docs))),
            "q24_srp_neardup" -> time(noop(ScaleBench.srpPairsWithBits(emb, srpBits))),
            "q29_sessionization" -> time(noop(ScaleBench.sessionStats(ev))),
            "q40_dedup_clusters" -> time(noop(ScaleBench.clusters(docs))),
            "q34_ivf_topk" -> time(noop(ScaleBench.ivfTopK(emb))))
            .map { case (k, v) => "\"" + k + "\":" + v }
            .mkString("{", ",", "}")
        }
        val x1 = block(1)
        val xN = block(factor)
        s""","scale":{"factor":$factor,"x1":$x1,"x$factor":$xN}"""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$scaleJson}""")
    spark.stop()
  }
}
