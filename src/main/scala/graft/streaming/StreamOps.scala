package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructType}

/** Structured Streaming surface. The reference is batch-only (SURVEY
  * §2.9), but the engine exposes the events table as a stream:
  * readStream -> event-time window aggregation with a watermark ->
  * sink. Batch/stream parity is the correctness contract: the windowed
  * aggregation over a bounded replay must equal the equivalent batch
  * GROUP BY (that is exactly what the oracle checks in q27).
  *
  * Scale notes: state is keyed by (window, event_type) — bounded by
  * watermark eviction; at 100 TB/day the same plan runs against Kafka
  * with shuffle partitions sized to key cardinality, not input volume.
  */
object StreamOps {

  /** Hourly tumbling-window counts + exact value sums over the events
    * stream, executed with the AvailableNow-style drain (memory sink)
    * so a bounded parquet replay terminates. */
  def hourlyEventRollup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Static schema probe (cheap; metadata only) so readStream needs no
    // inference. ts arrives as LongType nanos (TIMESTAMP(NANOS) parquet).
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = "graft_stream_" + math.abs(dir.hashCode).toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString

    val tsCol =
      if (fileSchema("ts").dataType == LongType)
        timestamp_micros((col("ts") / 1000L).cast(LongType))
      else col("ts")

    // The file-stream source wants a directory; select just the events
    // file out of the testdata dir via the glob filter.
    val stream = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_utc", tsCol)
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(
        unix_millis(col("window.start")).as("hour_start_ms"),
        col("event_type"), col("n"), col("total_value"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(queryName).orderBy("hour_start_ms", "event_type")
  }

  /** Streaming deduplication with bounded state:
    * `dropDuplicatesWithinWatermark` keyed on event_id, over a stream
    * that deliberately delivers EVERY event twice (self-union — the
    * at-least-once delivery a real ingest pipeline must survive). The
    * dedup state is evicted by the event-time watermark, so it holds
    * ~one key per event inside the watermark horizon instead of growing
    * forever — the property that separates streaming dedup from a
    * groupBy at 100 TB/day. Downstream, a per-type count must equal the
    * batch count over the original (un-doubled) events — the q42
    * oracle. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = "graft_dedup_" + math.abs(dir.hashCode).toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dedup_ckpt").toString

    def src: DataFrame = {
      val s = spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      val tsCol =
        if (fileSchema("ts").dataType == LongType)
          timestamp_micros((col("ts") / 1000L).cast(LongType))
        else col("ts")
      s.withColumn("ts_utc", tsCol)
    }

    val deduped = src.union(src)
      .withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))

    val q = deduped.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(queryName).orderBy("event_type")
  }

  /** Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState:
    * a per-user running (event count, value in exact integer cents)
    * accumulator. Cents (not doubles) keep the state order-independent,
    * so a bounded replay equals the batch GROUP BY exactly — asserted in
    * AdvancedSpec.
    *
    * Scale: state is one small tuple per user, partitioned by the
    * grouping key; eviction policy would hang off GroupStateTimeout in a
    * production job (unbounded key spaces need TTLs or it's a leak).
    */
  def statefulUserTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = "graft_state_" + math.abs(dir.hashCode).toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_ckpt").toString

    val updates = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var c = c0
          rows.foreach { r => n += 1; c += r._2 }
          state.update((n, c))
          (uid, n, c)
      }
      .toDF("user_id", "n_events", "total_cents")

    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // keep the latest state per user (update mode appends one row per
    // batch; the event count is monotone, so max(struct) picks the
    // final state atomically)
    spark.table(queryName)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_cents"))
      .orderBy("user_id")
  }

  /** STREAMING gap-based sessionization over an in-order event stream:
    * per-user state is just (last event time, event count, session
    * count) — O(1) per user, evicted never (a production job adds a
    * state TTL; the bounded replay doesn't need one). Each microbatch
    * merges its (sorted) new events into the running state: an event
    * more than `gapUs` after the previous one opens a new session —
    * exactly the batch `lag`-window rule, computed incrementally. Emits
    * the updated totals every batch; the caller keeps the latest per
    * user (both counters are monotone).
    *
    * Contract: batch parity (q29's oracle) requires per-user event-time
    * order ACROSS microbatches (in-order ingest — the file/Kafka
    * ordering a sessionization pipeline assumes); order WITHIN a batch
    * is restored by the sort. StreamSessionSpec proves multi-batch ==
    * single-batch == the batch operator. */
  def sessionStatsFrom(src: DataFrame, queryName: String,
                       gapUs: Long): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_sess_ckpt").toString
    val updates = src
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          var (last, ne, ns) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          rows.map(_._2).toArray.sorted.foreach { t =>
            if (last == Long.MinValue || t - last > gapUs) ns += 1
            ne += 1
            if (t > last) last = t
          }
          state.update((last, ne, ns))
          (uid, ne, ns)
      }
      .toDF("user_id", "n_events", "n_sessions")
    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // update mode appends one row per user per batch; counters are
    // monotone, so max(struct) selects the final state atomically
    spark.table(queryName)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"),
        col("s.n_events").as("n_events"), col("s.n_sessions").as("n_sessions"))
  }

  /** [[sessionStatsFrom]] over the testdata events file — the q101
    * oracle entry (same oracle as the batch q29). */
  def streamingSessionStats(spark: SparkSession, dir: String,
                            gapUs: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = "graft_sess_" + math.abs(dir.hashCode).toString
    val raw = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val tsUs =
      if (fileSchema("ts").dataType == LongType) expr("ts div 1000")
      else unix_micros(col("ts"))
    val src = raw.filter(col("user_id") < 100).withColumn("ts_us", tsUs)
    sessionStatsFrom(src, queryName, gapUs).orderBy("user_id")
  }

  /** STREAMING near-dup candidate detection: MinHash+LSH banding as an
    * incremental stream, emitting each candidate pair the moment its
    * second member arrives.
    *
    * The batch pipeline's only shuffle-bound step is the per-doc
    * signature aggregation (min over exploded shingles); here the
    * signature is computed PER ROW — array_min over the shingle array,
    * the identical md5/hex-window lane — so the stream needs no
    * aggregation at all before the stateful step. State lives per LSH
    * bucket (band, band-key) via flatMapGroupsWithState: the doc-id
    * list of that bucket, so state size tracks bucket occupancy (the
    * same quantity autoSrpBits pins), and every new arrival emits
    * exactly its pairs against the bucket's history. At 100 TB/day
    * this runs against Kafka with the bucket key as the shuffle key;
    * a production job adds a TTL timeout to bound bucket history by
    * time (noted, not needed for the bounded replay).
    *
    * Correctness contract (q61): the emitted pair set over a bounded
    * replay equals the BATCH pipeline's candidate set — the oracle is
    * the candidate CTE of q22's SQL. */
  def streamingNearDupCandidates(spark: SparkSession, dir: String,
                                 n: Int = 3, numHashes: Int = 12,
                                 bands: Int = 4): DataFrame = {
    val fileSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val src = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    nearDupCandidatesFrom(src,
      "graft_neardup_" + math.abs(dir.hashCode).toString,
      n, numHashes, bands)
  }

  /** The near-dup candidate pipeline over ANY streaming docs frame
    * (doc_id, text, ...) — lets a test drive a throttled multi-file
    * source (maxFilesPerTrigger=1) to prove the per-bucket STATE path:
    * pairs spanning microbatch boundaries must come out identical to a
    * single-batch replay. */
  /** `maxBucketHistory` bounds per-bucket state DETERMINISTICALLY: each
    * bucket keeps only its most recent K doc ids, so a pathologically
    * hot bucket (boilerplate shingles — the streaming analog of the
    * jaccardPairs maxPostings guard) cannot grow state without bound;
    * pairs against evicted history are the documented recall trade. A
    * count cap, unlike a wall-clock TTL, makes the bounded-replay
    * output a pure function of arrival order — spec-able exactly. The
    * default keeps full history (q61's oracle-checked behavior). */
  def nearDupCandidatesFrom(src: DataFrame, queryName: String,
                            n: Int = 3, numHashes: Int = 12,
                            bands: Int = 4,
                            maxBucketHistory: Int = Int.MaxValue): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    graft.plans.GraftFunctions.register(spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_neardup_ckpt").toString
    val rows = numHashes / bands

    val toks = graft.plans.GraftFunctions.graft_tokens(lower(col("text")))
    val bucketed = src
      .select(col("doc_id"),
        graft.plans.GraftFunctions.word_shingles(toks, n).as("sh"))
      .filter(size(col("sh")) >= 1)
      // md5 materialized once (no CSE within a projection), then one
      // array_min per hash over the rotated 15-hex windows — exactly
      // minhashSignatures' Md5Minhash lane, row-local
      .withColumn("hh", transform(col("sh"), s => md5(s.cast("binary"))))
      .select(col("doc_id"), array((0 until numHashes).map(i =>
        array_min(transform(col("hh"),
          h => graft.plans.GraftFunctions.hex_window(h, i * 2, 15)))): _*)
        .as("m"))
      .select(col("doc_id"), explode(array((0 until bands).map { b =>
        concat_ws("|", (lit(b) +: (0 until rows).map(r =>
          col("m")(b * rows + r))).map(_.cast("string")): _*)
      }: _*)).as("bucket"))
      .as[(Long, String)]

    val paired = bucketed
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(Long, String)], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val incoming = it.map(_._1).toSeq.distinct.sorted
          val pairs = for {
            (d, idx) <- incoming.zipWithIndex
            prev <- seen.iterator ++ incoming.iterator.take(idx)
            if prev != d
          } yield (math.min(prev, d), math.max(prev, d))
          state.update((seen ++ incoming).takeRight(maxBucketHistory))
          pairs.iterator
      }
      .toDF("doc_a", "doc_b")

    val q = paired.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // a pair can surface from several bands (at-least-once by design);
    // the sink-side distinct is batch work over the emitted pairs
    spark.table(queryName).distinct().orderBy("doc_a", "doc_b")
  }

  /** Persist the existing-corpus near-dup index — the batch half of
    * incremental-ingest dedup, built ONCE and reused by every streaming
    * batch (the Warehouse story applied to the dedup index). Two
    * tables: `bands` (band keys, candidate generation) and `docs`
    * (per-doc shingle-hash set + size, the in-stream exact-Jaccard
    * verify). Same md5 minhash lane as q22/q61/q73 so the DuckDB
    * oracle can reproduce the pipeline. */
  def writeNearDupIndex(existing: DataFrame, idCol: String, textCol: String,
                        path: String, n: Int = 3, numHashes: Int = 12,
                        bands: Int = 4): Unit = {
    import graft.operators.Dedup
    val sh = Dedup.shingleTable(existing, idCol, textCol, n)
      .withColumn("__h", md5(col("s").cast("binary")))
      .select("doc_id", "h64", "__h")
      .localCheckpoint(true) // feeds signatures AND the per-doc sets
    Dedup.lshBands(Dedup.minhashSignatures(sh, numHashes), numHashes, bands)
      .write.mode("overwrite").parquet(s"$path/bands")
    sh.groupBy("doc_id")
      .agg(collect_set(col("h64")).as("h64s"), count(lit(1)).as("szn"))
      .write.mode("overwrite").parquet(s"$path/docs")
  }

  /** STREAMING incremental-ingest near-dup: new documents stream
    * against the PERSISTED existing-corpus index ([[writeNearDupIndex]])
    * — the production shape of continuous corpus ingest, composing
    * q61's in-stream signatures with q73's new-vs-old band join.
    *
    * Every step is row-local or a stream-STATIC join: the per-row
    * minhash signature (array_min over the shingle array — q61's
    * trick), a stream-static equality join on (band, band-key) for
    * candidates, and an in-stream exact-Jaccard verify that intersects
    * the row's shingle-hash set with the matched old doc's persisted
    * set (array_intersect — row-local, no aggregation). ZERO streaming
    * state: nothing to evict, no watermark, and a bounded replay
    * equals batch [[graft.operators.Dedup.minhashLshPairsAgainst]]
    * exactly — asserted across microbatch boundaries in
    * StreamCrossCorpusSpec; the q75 oracle is the batch SQL.
    *
    * At 100 TB/day: Kafka source, the index lives as a bucketed table
    * keyed by (band, bkey), and each microbatch pays
    * |batch| x bucket-occupancy — the same cost law as the batch
    * incremental form (q73), paid incrementally. */
  def streamNearDupAgainst(src: DataFrame, queryName: String,
                           indexPath: String, n: Int = 3,
                           numHashes: Int = 12, bands: Int = 4,
                           threshold: Double = 0.5): DataFrame = {
    val spark = src.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_xcorpus_ckpt").toString
    val bandIdx = spark.read.parquet(s"$indexPath/bands")
      .select(col("doc_id").as("old_id"), col("band"), col("bkey"))
    val docIdx = spark.read.parquet(s"$indexPath/docs")
      .select(col("doc_id").as("old_id"), col("h64s").as("old_h64s"),
        col("szn"))
    val rows = numHashes / bands

    val toks = graft.plans.GraftFunctions.graft_tokens(lower(col("text")))
    val withBands = src
      .select(col("doc_id"),
        graft.plans.GraftFunctions.word_shingles(toks, n).as("sh"))
      .filter(size(col("sh")) >= 1)
      .withColumn("hh", transform(col("sh"), s => md5(s.cast("binary"))))
      .withColumn("m", array((0 until numHashes).map(i =>
        array_min(transform(col("hh"),
          h => graft.plans.GraftFunctions.hex_window(h, i * 2, 15)))): _*))
      .select(col("doc_id").as("new_id"),
        transform(col("sh"), s => xxhash64(s)).as("h64s"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            array((0 until rows).map(r => col("m")(b * rows + r)): _*)
              .as("bkey"))
        }: _*)).as("bk"))
      .select(col("new_id"), col("h64s"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    val verified = withBands
      .join(bandIdx, Seq("band", "bkey"))
      .select("new_id", "h64s", "old_id")
      .join(docIdx, Seq("old_id"))
      .withColumn("c",
        size(array_intersect(col("h64s"), col("old_h64s"))).cast("long"))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("h64s")).cast("long") + col("szn") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as("doc_a"), col("old_id").as("doc_b"),
        col("jaccard"))

    val q = verified.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // a pair can candidate in several bands (at-least-once by design);
    // the verified jaccard is identical on every emission, so the
    // sink-side distinct collapses them exactly
    spark.table(queryName).distinct().orderBy("doc_a", "doc_b")
  }
}
