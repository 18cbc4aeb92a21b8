package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** The q61 oracle proves stream == batch over a single-file replay, but
  * a single microbatch delivers every bucket's members in ONE group
  * call — the `seen` state path never runs. This spec throttles a
  * multi-file copy of the corpus to one file per trigger, so pairs
  * whose members arrive in DIFFERENT microbatches can only come from
  * state, and the result must still equal the single-batch replay. */
class StreamNearDupSpec extends SparkSpec {

  test("candidates spanning microbatch boundaries equal the one-batch replay") {
    val dir = "/tmp/graft_stream_neardup"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(4) // four part files => four microbatches when throttled
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema

    def run(throttle: Boolean, name: String) = {
      val rd = spark.readStream.schema(schema)
      val src = (if (throttle) rd.option("maxFilesPerTrigger", "1") else rd)
        .parquet(s"$dir/docs")
      StreamOps.nearDupCandidatesFrom(src, name)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val multiBatch = run(throttle = true, "nd_multi")
    val oneBatch = run(throttle = false, "nd_single")
    assert(multiBatch === oneBatch,
      s"state path diverged: multi=${multiBatch.size}, single=${oneBatch.size}")
    assert(oneBatch.nonEmpty, "corpus must produce candidate pairs")
  }

  test("auto state-store sizing: same pairs as the session default, " +
      "heuristic pins the sweep's knee and clamps both ends") {
    // the heuristic itself (round-13 verdict #4): one store per ~50k
    // state rows, floor 4, ceiling = session shuffle partitions
    assert(StreamOps.autoStatePartitions(spark, 381928L) === 4,
      "test session runs 4 shuffle partitions — the ceiling must bind")
    StreamOps.withShufflePartitions(spark, 32) { s32 =>
      assert(StreamOps.autoStatePartitions(s32, 381928L) === 8,
        "the x20 sweep's measured state (382k rows) must land on its knee")
      assert(StreamOps.autoStatePartitions(s32, 2000L) === 4, "floor")
      assert(StreamOps.autoStatePartitions(s32, 10000000L) === 32, "ceiling")
    }
    // output-invariance: the store count moves WHERE state lives, never
    // what the pipeline emits — the auto-sized registry path (q61) must
    // equal an explicit clone at any store count
    val dir = "/tmp/graft_stream_neardup_auto"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema
    def run(s: org.apache.spark.sql.SparkSession, name: String) = {
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/docs")
      StreamOps.nearDupCandidatesFrom(src, name)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val sessionSized = run(spark, "nd_session_sized")
    val autoSized = StreamOps.withShufflePartitions(spark,
      StreamOps.autoStatePartitions(spark, 500L * 4))(run(_, "nd_auto_sized"))
    assert(autoSized === sessionSized,
      "state-store count changed the emitted pair set")
    assert(autoSized.nonEmpty)
  }

  test("estimateRows: file-stats estimate tracks the exact count without " +
      "a corpus scan (round-14 verdict #7)") {
    val dir = "/tmp/graft_estimate_rows"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val exact = spark.read.parquet(s"$dir/docs").count()
    val est = StreamOps.estimateRows(spark, s"$dir/docs")
    // uniform files ⇒ the one-footer anchor scales near-exactly; the
    // store sizing downstream only needs the order of magnitude
    assert(est > exact / 2 && est < exact * 2,
      s"estimate $est vs exact $exact")
    // single-file source ⇒ the anchor IS the corpus: estimate exact
    Tables.documents(spark, sf).select("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/one")
    assert(StreamOps.estimateRows(spark, s"$dir/one") === exact)
    // the registry default's store count from the estimate matches the
    // exact-count sizing at this corpus (both inside the same clamp)
    assert(StreamOps.autoStatePartitions(spark, est * 4) ===
      StreamOps.autoStatePartitions(spark, exact * 4))
    // round-15 advice: an empty (footer-only) file must never anchor —
    // it would inflate the byte-scaled estimate by orders of magnitude.
    // Plant one that sorts lexicographically FIRST (the old anchor
    // rule's pick): the largest-file anchor skips it and the estimate
    // stays in band instead of scaling rows=1 over a few hundred bytes.
    Tables.documents(spark, sf).select("doc_id", "text").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/empty")
    val emptyFile = new java.io.File(s"$dir/empty").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(emptyFile.toPath,
      new java.io.File(s"$dir/docs/aaa_empty.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val estWithEmpty = StreamOps.estimateRows(spark, s"$dir/docs")
    assert(estWithEmpty > exact / 2 && estWithEmpty < exact * 2,
      s"empty-file anchor skipped: estimate $estWithEmpty vs exact $exact")
    // the anchor path worked: no fallback recorded
    assert(StreamOps.lastEstimateFallback.isEmpty,
      "successful anchor estimate must not record a fallback")
    // round-16 verdict #6: the full-count degradation must be
    // OBSERVABLE — an all-empty corpus (no non-empty anchor) and an
    // unlistable path both record their reason beside the WARN line
    Tables.documents(spark, sf).select("doc_id", "text").limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/allempty")
    assert(StreamOps.estimateRows(spark, s"$dir/allempty") === 0L)
    assert(StreamOps.lastEstimateFallback.exists(_.contains("anchor")),
      s"all-empty corpus must record the anchor-exhausted fallback, " +
        s"got ${StreamOps.lastEstimateFallback}")
  }

  test("progress-based store sizing: the continuous-deployment estimator " +
      "derives from the last batch's reported state rows") {
    val dir = "/tmp/graft_stream_progress_sizing"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/docs")
    StreamOps.nearDupCandidatesFrom(src, "nd_progress_sizing")
      .select("doc_a", "doc_b").collect() // drain -> progress published
    assert(StreamOps.lastStateProgress.nonEmpty,
      "a drained stateful query must publish state progress")
    val n = StreamOps.autoStatePartitionsFromProgress(spark)
    val ceiling = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(n.exists(v => v >= 4 && v <= ceiling),
      s"sized $n outside [4, $ceiling]")
    // a larger growth margin never shrinks the count
    assert(StreamOps.autoStatePartitionsFromProgress(spark,
      growthMargin = 10.0).get >= n.get)
  }

  test("maxBucketHistory bounds state: capped output is a strict subset") {
    val dir = "/tmp/graft_stream_neardup_cap"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema
    def run(cap: Int, name: String) = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"/tmp/graft_stream_neardup_cap/docs")
      StreamOps.nearDupCandidatesFrom(src, name, maxBucketHistory = cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val unbounded = run(Int.MaxValue, "nd_nocap")
    val capped = run(1, "nd_cap1")
    // a K=1 history still pairs each arrival with its predecessor, but
    // loses pairs against older evicted members of >=3-doc buckets
    assert(capped.subsetOf(unbounded))
    assert(capped.nonEmpty, "adjacent-arrival pairs must survive the cap")
    assert(capped.size < unbounded.size,
      "fixture must contain a bucket with >= 3 docs for eviction to bite")
  }
}
