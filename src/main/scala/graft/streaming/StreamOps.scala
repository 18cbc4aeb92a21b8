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

  // -------- shared harness plumbing ---------------------------------

  private val queryCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Spark's built-in RocksDB state store (spark-sql ships rocksdbjni)
    * — the provider every 100 TB streaming deployment runs, because
    * HDFSBackedStateStoreProvider keeps the whole store on the
    * executor HEAP (state is bounded by executor memory) while RocksDB
    * spills to local SSD with incremental changelog checkpoints. The
    * q245 gate + RocksDbStateSpec prove output parity with the default
    * store; the q61_stream_rocksdb bench lane measures it at scale. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `f` against a CLONED session (shared SparkContext, private
    * SQLConf) whose streaming state store is `provider`. A clone —
    * not set/restore on the caller's conf — because the provider is
    * read at query START: a restore racing another session thread's
    * query start (Verify's concurrent query pool) would flip that
    * query's store mid-flight. The parent's runtime SQL conf is copied
    * first so the clone plans identically (shuffle partitions,
    * nanosAsLong, ...); static/non-settable keys are skipped. */
  def withStateStore[T](spark: SparkSession, provider: String)(
      f: SparkSession => T): T = {
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    f(s2)
  }

  /** State-store count from estimated STATE SIZE, not session
    * parallelism (round-13 verdict #4). Every microbatch commits one
    * state store per shuffle partition, so the per-batch fixed cost
    * scales with the store count while the state itself needs far
    * fewer: the committed LaneProbe sweep over the x20 q61 replay
    * (381,928 state rows) measured 0.95 s/batch at the session's 32
    * stores, 0.68 at 8, 0.65 at 4 (diminishing — Spark's microbatch
    * machinery is the ~0.65 residual). One store per ~50k state rows
    * reproduces the sweep's knee (382k → 8); the floor of 4 keeps
    * stateful-stage parallelism where the curve went flat, and the
    * session's shuffle-partition count caps it (auto never ADDS
    * stores). Callers estimate rows with the operator's own state law
    * — for the LSH candidate pipeline, ≤ docs × bands bucket entries. */
  def autoStatePartitions(spark: SparkSession, estimatedStateRows: Long,
                          rowsPerStore: Long = 50000L): Int = {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    math.min(session, math.max(4,
      math.ceil(estimatedStateRows.toDouble / math.max(1L, rowsPerStore)).toInt))
  }

  /** Source-size estimate WITHOUT counting the input (round-14 verdict
    * #7): a driver-side LIST of the source's parquet files gives total
    * bytes, ONE file's footer-backed count anchors bytes-per-row, and
    * the estimate scales the anchor by total bytes — O(listing + one
    * file) instead of O(corpus), and the only shape available before
    * the corpus is bounded. A true unbounded deployment replaces the
    * anchor with the previous batch's state-store progress
    * ([[lastStateProgress]]'s numRowsTotal — already exposed by this
    * module); the bounded replay lanes here anchor on the LARGEST file
    * (deterministic, and the anchor least distorted by footer overhead
    * — a tiny/footer-only file as anchor inflates the scaled estimate
    * by orders of magnitude, round-15 advice); an anchor that turns
    * out EMPTY is skipped for the next-largest before scaling. Falls
    * back to a full count when nothing listable exists — including
    * non-local URIs, which the java.io walk cannot list (never on the
    * registry/bench paths, whose sources are local parquet dirs). */
  /** Why the last [[estimateRows]] call degraded to a FULL count (None
    * = the anchor path worked). The degradation is correct fallback
    * behavior, but silent it looks identical to the O(1) estimate
    * (round-16 verdict #6: a permanently unreadable corpus — a
    * non-local URI the java.io walk can't list — paid an O(corpus)
    * count every call with nothing in any log); the WARN line plus
    * this recorded reason make it observable and spec-assertable. */
  @volatile var lastEstimateFallback: Option[String] = None

  def estimateRows(spark: SparkSession, path: String): Long = {
    def walk(d: java.io.File): Seq[java.io.File] =
      if (d.isFile) {
        if (d.getName.endsWith(".parquet")) Seq(d) else Seq.empty
      } else Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .filterNot(_.getName.startsWith("_")).flatMap(walk)
    def fullCount(reason: String): Long = {
      lastEstimateFallback = Some(reason)
      System.err.println(s"[graft] estimateRows($path): falling back " +
        s"to a FULL count — $reason; a corpus this walk can never list " +
        "pays O(corpus) on every call (use a listable store or the " +
        "state-progress anchor for continuous deployments)")
      spark.read.parquet(path).count()
    }
    lastEstimateFallback = None
    val files = walk(new java.io.File(path))
    if (files.isEmpty)
      fullCount("no listable .parquet files (empty dir or non-local URI)")
    else {
      // largest first (ties broken by path for determinism); try up to
      // 3 candidates so an empty row-group anchor never scales
      val candidates = files.sortBy(f => (-f.length(), f.getPath)).take(3)
      val anchorOpt = candidates.iterator.map { f =>
        val rows = try spark.read.parquet(f.getPath).count()
          catch { case _: Throwable => 0L }
        (f, rows)
      }.find(_._2 > 0L)
      anchorOpt match {
        case Some((anchor, anchorRows)) =>
          val anchorBytes = math.max(1L, anchor.length())
          val totalBytes = files.map(_.length()).sum
          math.max(1L,
            math.round(anchorRows.toDouble * totalBytes / anchorBytes))
        case None =>
          fullCount(s"every sampled anchor empty or unreadable " +
            s"(${candidates.size} tried)")
      }
    }
  }

  /** Store sizing for a CONTINUOUS deployment, where the input can
    * never be listed or counted: estimate the next batch's state from
    * the PREVIOUS batch's reported state-store rows (every drained
    * query publishes them into [[lastStateProgress]]) with a growth
    * margin, and feed the same [[autoStatePartitions]] law. None until
    * a first batch has reported — callers start from the session
    * default (or a file-stats estimate when the source IS listable)
    * and re-size between restarts, the standard continuous-pipeline
    * cadence (store count is fixed for a run; it moves at the next
    * checkpoint-compatible restart). */
  def autoStatePartitionsFromProgress(spark: SparkSession,
                                      growthMargin: Double = 1.5,
                                      rowsPerStore: Long = 50000L): Option[Int] =
    lastStateProgress.maxByOption(_.batchId).map(p =>
      autoStatePartitions(spark,
        math.ceil(p.numRowsTotal * growthMargin).toLong, rowsPerStore))

  /** Run `f` against a CLONED session whose shuffle-partition count is
    * `n` — the scoped form of the state-store dial. A clone, not
    * set/restore on the caller's conf, for the same reason as
    * [[withStateStore]]: a restore racing another session thread's
    * query start (Verify's concurrent pool) would flip that query's
    * plan mid-flight. Everything downstream of the drained stream that
    * the caller builds on the returned frame also plans at `n`
    * partitions — fine for sink-side reductions, which are bounded by
    * the stream's OUTPUT, not its input. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(
      f: SparkSession => T): T = {
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s2.conf.set("spark.sql.shuffle.partitions", n.toString)
    f(s2)
  }

  /** One stateful operator's progress in one microbatch — the
    * state-size evidence row behind the RocksDB parity lanes. */
  final case class StateBatchProgress(batchId: Long, operator: String,
      numRowsTotal: Long, numRowsUpdated: Long, memoryUsedBytes: Long,
      custom: Map[String, Long])

  /** Per-microbatch state-operator progress of the most recently
    * [[drain]]ed query in this JVM (from `recentProgress`, capped at
    * spark.sql.streaming.numRecentProgressUpdates = 100 batches).
    * Evidence capture only — specs and the StateProbe main read it to
    * assert bounded state and RocksDB-specific custom metrics; no
    * operator consumes it. */
  @volatile var lastStateProgress: Seq[StateBatchProgress] = Seq.empty

  /** Collision-free memory-sink query name: `abs(dir.hashCode)` alone
    * can collide across distinct dirs (and repeats across runs), so a
    * process-wide monotonic counter disambiguates. */
  private def freshName(prefix: String, dir: String): String =
    prefix + math.abs(dir.hashCode).toString + "_" +
      queryCounter.incrementAndGet().toString

  /** Ensure `spark.sql.legacy.parquet.nanosAsLong=true` for `f` — the
    * testdata events file carries TIMESTAMP(NANOS). Deliberately NO
    * restore: the flag is a session-wide invariant (Session.tune sets
    * it too), and a set/try/restore here would race across Verify's
    * concurrent query pool — one query's restore can unset the flag
    * while another query's microbatch is mid-plan. */
  private def withNanosAsLong[T](spark: SparkSession)(f: => T): T = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    f
  }

  /** Drain a bounded stream through a memory sink and return the sink
    * table; the per-run checkpoint temp dir is deleted afterwards (a
    * leaked dir per call adds up over a long-lived driver). */
  private def drain(df: DataFrame, queryName: String,
                    mode: String): DataFrame = {
    val spark = df.sparkSession
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable()
    finally {
      try {
        import scala.jdk.CollectionConverters._
        lastStateProgress = q.recentProgress.toSeq.flatMap { p =>
          p.stateOperators.toSeq.map { so =>
            StateBatchProgress(p.batchId, so.operatorName, so.numRowsTotal,
              so.numRowsUpdated, so.memoryUsedBytes,
              so.customMetrics.asScala.map { case (k, v) =>
                k -> v.longValue }.toMap)
          }
        }
      } catch { case _: Throwable => () }
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    spark.table(queryName)
  }

  /** Hourly tumbling-window counts + exact value sums over the events
    * stream, executed with the AvailableNow-style drain (memory sink)
    * so a bounded parquet replay terminates. */
  def hourlyEventRollup(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
    // Static schema probe (cheap; metadata only) so readStream needs no
    // inference. ts arrives as LongType nanos (TIMESTAMP(NANOS) parquet).
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_stream_", dir)

    val tsCol =
      graft.Tables.tsTimestamp(fileSchema("ts").dataType)

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

    drain(stream, queryName, "complete").orderBy("hour_start_ms", "event_type")
  }

  /** Streaming OHLC bar downsampling: q183's one-aggregate shape run
    * as a watermarked tumbling-window stream — open/close via
    * min_by/max_by over the (ts, event_id) struct INSIDE the streaming
    * aggregate, so the bar is maintained incrementally per window with
    * no per-event state beyond the running aggregate buffer (the
    * watermark bounds how many open windows exist). The same
    * exactness discipline as the batch lane: untouched input doubles
    * for O/H/L/C, DECIMAL(18,4) for volume. Oracle = the batch SQL —
    * a drained bounded replay must equal the batch bar table exactly. */
  def streamOhlcBars(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_ohlc_", dir)
    val tsCol = graft.Tables.tsTimestamp(fileSchema("ts").dataType)
    val stream = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_utc", tsCol)
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts_utc"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts_utc"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("volume"))
      .select(
        unix_millis(col("window.start")).as("hour_start_ms"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n_events"), col("volume"))
    drain(stream, queryName, "complete").orderBy("hour_start_ms", "event_type")
  }

  /** Streaming Count-Min sketch maintenance (q194): the q189 sketch's
    * 4 x 512 cell table folded INCREMENTALLY over a token stream — a
    * bounded-state streaming aggregate (the state is the sketch, 2048
    * cells, regardless of stream volume) where exact per-token counts
    * would grow with the vocabulary. That inversion — O(sketch) state
    * for O(vocab) answers — is why a 100 TB/day ingest keeps CM cells
    * online and defers exact counting to batch. The drained sketch is
    * probed by the SAME batch probe as q189, so the gate row proves
    * the incremental fold lands cell-identical to the batch build
    * (DuckDB recomputes the whole frame from scratch).
    *
    * Shape: token explode -> 4 seeded bucket projections unioned
    * BEFORE the aggregate -> one groupBy((row_i, bucket)) count. The
    * union multiplies the stream by d=4, but each projection is a
    * codegen'd md5+mod — no state until the single bounded aggregate. */
  def streamCmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/documents.parquet").schema
    val queryName = freshName("graft_cms_", dir)
    val toks = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
    val cells = graft.operators.Quality.CmsSeeds.zipWithIndex.map {
      case (seed, i) =>
        toks.select(lit(i).as("row_i"),
          graft.operators.Quality.cmsBucket(seed, col("w")).as("bucket"))
    }.reduce(_.unionByName(_))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("cell"))
    val sketch = drain(cells, queryName, "complete").localCheckpoint(true)
    val counts = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    graft.operators.Quality.cmsProbe(counts, sketch)
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
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_dedup_", dir)

    def src: DataFrame = {
      val s = spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      val tsCol =
        graft.Tables.tsTimestamp(fileSchema("ts").dataType)
      s.withColumn("ts_utc", tsCol)
    }

    val deduped = src.union(src)
      .withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))

    drain(deduped, queryName, "complete").orderBy("event_type")
  }

  /** Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState:
    * a per-user running (event count, value in exact integer cents)
    * accumulator. Cents (not doubles) keep the state order-independent,
    * so a bounded replay equals the batch GROUP BY exactly — asserted in
    * AdvancedSpec.
    *
    * Scale: state is one small tuple per user, partitioned by the
    * grouping key, and EVICTED by an event-time TTL
    * (GroupStateTimeout.EventTimeTimeout): a user idle past `ttlUs`
    * emits its final segment and is removed — the property that keeps
    * state bounded by ACTIVE users, not ever-seen users, on an
    * unbounded key space. A re-appearing user opens a fresh segment;
    * because counts and cents are additive, summing a user's segments
    * equals the batch GROUP BY for ANY ttl — eviction never trades
    * correctness, only state size. */
  def statefulUserTotals(spark: SparkSession, dir: String,
                         ttlUs: Long = 3600L * 1000000L): DataFrame =
    withNanosAsLong(spark) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_state_", dir)
    val tsUs =
      graft.Tables.tsMicros(fileSchema("ts").dataType)

    val updates = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        tsUs.cast("long").as("ts_us"))
      // the watermark column must flow INTO the stateful operator (the
      // streaming checker rejects an event-time timeout whose watermark
      // attribute was projected away), so ts_event rides along unused
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "0 seconds")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      // state = (segment start ts, last ts, n, cents); segment start
      // identifies the segment in the output so the sink-side rollup
      // can take max-per-segment then sum across segments
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s0, _, n, c) = state.get
            state.remove() // evict: final segment row already emitted
            (uid, s0, n, c)
          } else {
            var (s0, last, n, c) =
              state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0L, 0L))
            rows.foreach { r =>
              if (s0 == Long.MinValue) s0 = r._3
              n += 1; c += r._2
              if (r._3 > last) last = r._3
            }
            state.update((s0, last, n, c))
            // event-time TTL anchored at the segment's last event; the
            // max() guard keeps Spark's timestamp>watermark invariant
            // if an out-of-contract late row ever slips through
            state.setTimeoutTimestamp(
              math.max((last + ttlUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            (uid, s0, n, c)
          }
      }
      .toDF("user_id", "seg_start", "n_events", "total_cents")

    // update mode appends one row per user-segment per batch; counters
    // are monotone WITHIN a segment, so max(struct) picks each
    // segment's final state, and segments sum exactly (additive)
    drain(updates, queryName, "update")
      .groupBy("user_id", "seg_start")
      .agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
      .groupBy("user_id")
      .agg(sum(col("s.n_events")).as("n_events"),
        sum(col("s.total_cents")).as("total_cents"))
      .orderBy("user_id")
  }

  /** STREAMING gap-based sessionization over an in-order event stream:
    * per-user state is just (segment start, last event time, event
    * count, session count) — O(1) per user — and EVICTED by an
    * event-time TTL: a user idle past `ttlUs` (watermark-driven,
    * GroupStateTimeout.EventTimeTimeout) emits its final segment and
    * is removed; a re-appearing user opens a fresh segment. Each
    * microbatch merges its (sorted) new events into the running state:
    * an event more than `gapUs` after the previous one opens a new
    * session — exactly the batch `lag`-window rule, computed
    * incrementally.
    *
    * TTL correctness: with `ttlUs >= gapUs` (enforced), an eviction
    * boundary implies idle > gap, i.e. exactly where the batch rule
    * starts a new session anyway — so summing a user's segments equals
    * the batch result, which is why the TTL path IS the q101 oracle
    * path, not a side lane. State size is bounded by users active
    * within the TTL horizon, not users ever seen.
    *
    * Contract: batch parity (q29's oracle) requires per-user event-time
    * order ACROSS microbatches (in-order ingest — the file/Kafka
    * ordering a sessionization pipeline assumes); order WITHIN a batch
    * is restored by the sort. StreamSessionSpec proves multi-batch ==
    * single-batch == the batch operator, and that an idle user is
    * really evicted (two segments) with totals unchanged. */
  def sessionStatsFrom(src: DataFrame, queryName: String, gapUs: Long,
                       ttlUs: Long = -1L): DataFrame =
    sessionSegmentsFrom(src, queryName, gapUs,
        if (ttlUs >= 0) ttlUs else 2L * gapUs)
      .groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_sessions")).as("n_sessions"))

  /** The per-segment form of [[sessionStatsFrom]]: one row per
    * (user, TTL-delimited state segment). Exposed so tests can observe
    * eviction directly — an evicted-then-returning user shows two
    * segments whose stats sum to the batch answer. */
  def sessionSegmentsFrom(src: DataFrame, queryName: String, gapUs: Long,
                          ttlUs: Long): DataFrame = {
    require(ttlUs >= gapUs,
      s"state TTL ($ttlUs us) must be >= session gap ($gapUs us): " +
        "eviction below the gap would split sessions batch would merge")
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val updates = src
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
      // the watermark column must flow INTO the stateful operator (the
      // streaming checker rejects an event-time timeout whose watermark
      // attribute was projected away), so ts_event rides along unused
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "0 seconds")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s0, _, ne, ns) = state.get
            state.remove() // evict: final segment row already emitted
            (uid, s0, ne, ns)
          } else {
            var (s0, last, ne, ns) =
              state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0L, 0L))
            rows.map(_._2).toArray.sorted.foreach { t =>
              if (s0 == Long.MinValue) s0 = t
              if (last == Long.MinValue || t - last > gapUs) ns += 1
              ne += 1
              if (t > last) last = t
            }
            state.update((s0, last, ne, ns))
            // TTL anchored at the segment's last event; the max() guard
            // keeps Spark's timestamp>watermark invariant if an
            // out-of-contract late row ever slips through
            state.setTimeoutTimestamp(
              math.max((last + ttlUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            (uid, s0, ne, ns)
          }
      }
      .toDF("user_id", "seg_start", "n_events", "n_sessions")
    // update mode appends one row per user-segment per batch; counters
    // are monotone WITHIN a segment, so max(struct) selects each
    // segment's final state atomically
    drain(updates, queryName, "update")
      .groupBy("user_id", "seg_start")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("s"))
      .select(col("user_id"), col("seg_start"),
        col("s.n_events").as("n_events"), col("s.n_sessions").as("n_sessions"))
  }

  /** [[sessionStatsFrom]] over the testdata events file — the q101
    * oracle entry (same oracle as the batch q29). */
  def streamingSessionStats(spark: SparkSession, dir: String,
                            gapUs: Long): DataFrame =
    withNanosAsLong(spark) {
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_sess_", dir)
    val raw = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val tsUs =
      graft.Tables.tsMicros(fileSchema("ts").dataType)
    val src = raw.filter(col("user_id") < 100).withColumn("ts_us", tsUs)
    sessionStatsFrom(src, queryName, gapUs).orderBy("user_id")
  }

  /** STREAM-STREAM inner join with an event-time bound (q119): every
    * (view, purchase) pair of the same user where the purchase lands
    * within one hour after the view — streaming attribution, the one
    * join shape that needs state on BOTH sides. Watermarks on both
    * inputs plus the time-bound condition let Spark derive how long
    * each side's rows can still match (a view older than
    * watermark - 1h can never join a future purchase), so state is
    * bounded by the join window, not the stream length. A bounded
    * replay must equal the equivalent batch join — the q119 oracle.
    *
    * At 100 TB/day both sides come from Kafka partitioned by user_id;
    * state per side is the in-window rows of its stream — the exact
    * quantity the watermark evicts. */
  def streamStreamAttribution(spark: SparkSession, dir: String,
                              windowUs: Long = 3600L * 1000000L): DataFrame =
    withNanosAsLong(spark) {
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val queryName = freshName("graft_ss_join_", dir)
    val tsUs =
      graft.Tables.tsMicros(fileSchema("ts").dataType)

    def side(eventType: String): DataFrame =
      spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .filter(col("user_id") < 100 && col("event_type") === eventType)
        .select(col("user_id"), tsUs.cast("long").as("ts_us"))

    streamStreamAttributionFrom(side("view"), side("purchase"),
      queryName, windowUs)
  }

  /** The join core over ANY two streaming (user_id, ts_us) frames —
    * lets a test drive throttled multi-file sources to prove matches
    * spanning microbatch boundaries come out identical to a
    * single-batch replay.
    *
    * `joinType = "left_outer"` additionally emits (view, null) for
    * views that never matched — but ONLY once the watermark passes
    * view_ts + window (before that a match could still arrive), which
    * means a bounded replay needs watermark-advancing later data after
    * the last real view or trailing unmatched views stay in state
    * forever. StreamJoinSpec demonstrates exactly that contract with
    * sentinel rows; the oracle lane (q119) stays inner. */
  def streamStreamAttributionFrom(views: DataFrame, purchases: DataFrame,
                                  queryName: String, windowUs: Long,
                                  joinType: String = "inner"): DataFrame = {
    def side(src: DataFrame, prefix: String): DataFrame = src
      .select(col("user_id").cast("long").as(s"${prefix}_user"),
        col("ts_us").cast("long").as(s"${prefix}_us"))
      .withColumn(s"${prefix}_ts", timestamp_micros(col(s"${prefix}_us")))
      .withWatermark(s"${prefix}_ts", "0 seconds")

    val joined = side(views, "v").join(side(purchases, "p"),
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowUs MICROSECOND"),
        joinType)
      .select(col("v_user").as("user_id"), col("v_us").as("view_us"),
        col("p_us").as("purchase_us"))

    drain(joined, queryName, "append")
      .orderBy("user_id", "view_us", "purchase_us")
  }

  /** Exactly-once parquet sink via foreachBatch + epoch-partitioned
    * idempotent writes: each microbatch lands under
    * `epoch_id=<batchId>` with DYNAMIC partition overwrite, so a
    * REPLAYED batch (the at-least-once redelivery every
    * failure/restart produces) overwrites its own partition instead of
    * appending duplicates — exactly-once achieved as idempotence, the
    * standard production recipe when the sink itself has no
    * transactions. The per-batch writer is exposed standalone so
    * StreamJoinSpec can re-invoke a batch and prove the replay is a
    * no-op. */
  def epochUpsert(path: String)(batch: DataFrame, batchId: Long): Unit = {
    // dynamic overwrite is a session-wide invariant (Session.tune); set
    // idempotently, never restored — a restore would race with other
    // concurrently-executing partitioned writes on the shared session
    batch.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch.withColumn("epoch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("epoch_id").parquet(path)
  }

  /** Drain `src` through the exactly-once epoch sink into `path`. */
  def runEpochSink(src: DataFrame, path: String): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_epoch_ckpt")
    val q = src.writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) => epochUpsert(path)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fileSchema = docs.schema
    // state-store count sized to the pipeline's state law (≤ docs ×
    // bands live bucket entries), not session parallelism — the
    // round-13 verdict-#4 default. The row term is ESTIMATED from file
    // stats (one footer + a listing — round-14 verdict #7), never a
    // corpus count: an unbounded source cannot count its input, and
    // the store count only needs the right order of magnitude
    // (StreamNearDupSpec pins output-invariance across store counts)
    val stores = autoStatePartitions(spark,
      estimateRows(spark, s"$dir/documents.parquet") * bands)
    withShufflePartitions(spark, stores) { s2 =>
      val src = s2.readStream.schema(fileSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
      nearDupCandidatesFrom(src, freshName("graft_neardup_", dir),
        n, numHashes, bands)
    }
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

    // a pair can surface from several bands (at-least-once by design);
    // the sink-side distinct is batch work over the emitted pairs
    drain(paired, queryName, "append").distinct().orderBy("doc_a", "doc_b")
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

    // a pair can candidate in several bands (at-least-once by design);
    // the verified jaccard is identical on every emission, so the
    // sink-side distinct collapses them exactly
    drain(verified, queryName, "append").distinct().orderBy("doc_a", "doc_b")
  }

  /** STREAMING incremental clustering — the full continuous-dedup
    * state machine: each microbatch (a) discovers its near-dup pairs
    * against the GROWING persisted band index (cross) and within
    * itself (intra), (b) folds them into the standing labels with
    * [[graft.operators.Dedup.incrementalComponents]] (state sized by
    * the batch's pairs and the components they touch, never the
    * corpus), and (c) appends its own bands/doc-sets to the index so
    * LATER batches can pair against it. Because a pair's band keys
    * depend only on its two documents, the union of base + cross +
    * intra pairs over any batch partitioning equals the whole-corpus
    * LSH pair set — so the final labels equal the from-scratch batch
    * clustering EXACTLY (q141's oracle is q40's closure; the spec
    * drives a 3-microbatch replay through the same code).
    *
    * At 100 TB/day: the index is a bucketed table keyed by
    * (band, bkey), labels live in the lakehouse and fold per
    * micro-batch — each batch pays |batch| x bucket-occupancy for
    * discovery plus new-pairs-sized CC work, never a corpus pass. */
  def streamIncrementalClusters(existing: DataFrame, src: DataFrame,
      idxPath: String, n: Int = 3, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val spark = existing.sparkSession
    writeNearDupIndex(existing, "doc_id", "text", idxPath, n, numHashes,
      bands)
    var labels = Dedup.starContractComponents(
        Dedup.minhashLshPairs(existing, "doc_id", "text", n, numHashes,
          bands, threshold))
      .labels.localCheckpoint(true)

    def indexFrames(batch: DataFrame): (DataFrame, DataFrame) = {
      val sh = Dedup.shingleTable(batch, "doc_id", "text", n)
        .withColumn("__h", md5(col("s").cast("binary")))
        .select("doc_id", "h64", "__h").localCheckpoint(true)
      (Dedup.lshBands(Dedup.minhashSignatures(sh, numHashes), numHashes,
          bands).localCheckpoint(true),
        sh.groupBy("doc_id")
          .agg(collect_set(col("h64")).as("h64s"), count(lit(1)).as("szn"))
          .localCheckpoint(true))
    }
    def verified(cand: DataFrame, aDocs: DataFrame,
                 bDocs: DataFrame): DataFrame =
      cand.join(aDocs.select(col("doc_id").as("doc_a"),
          col("h64s").as("ha"), col("szn").as("sa")), Seq("doc_a"))
        .join(bDocs.select(col("doc_id").as("doc_b"),
          col("h64s").as("hb"), col("szn").as("sb")), Seq("doc_b"))
        .withColumn("c",
          size(array_intersect(col("ha"), col("hb"))).cast("long"))
        .filter(col("c").cast("double") /
          (col("sa") + col("sb") - col("c")).cast("double") >= threshold)
        .select("doc_a", "doc_b")

    val ckpt = java.nio.file.Files.createTempDirectory("graft_incc_ckpt")
    val q = src.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     _: Long) => {
        val b = batch.toDF().select("doc_id", "text").localCheckpoint(true)
        if (b.head(1).nonEmpty) {
          val (bBands, bDocs) = indexFrames(b)
          val idxBands = spark.read.parquet(s"$idxPath/bands")
          val idxDocs = spark.read.parquet(s"$idxPath/docs")
          val cross = verified(
            bBands.join(idxBands.select(col("doc_id").as("doc_b"),
                col("band"), col("bkey")), Seq("band", "bkey"))
              .select(col("doc_id").as("doc_a"), col("doc_b")).distinct(),
            bDocs, idxDocs)
          val intra = verified(
            bBands.as("x").join(bBands.as("y"),
                col("x.band") === col("y.band") &&
                  col("x.bkey") === col("y.bkey") &&
                  col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"),
                col("y.doc_id").as("doc_b")).distinct(),
            bDocs, bDocs)
          labels = Dedup
            .incrementalComponents(labels, cross.unionAll(intra))
            .localCheckpoint(true)
          // publish AFTER pairing: a batch must not pair against itself
          bBands.write.mode("append").parquet(s"$idxPath/bands")
          bDocs.write.mode("append").parquet(s"$idxPath/docs")
        }
        ()
      })
      .option("checkpointLocation", ckpt.toString)
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    Dedup.clustersFromLabels(labels)
  }

  /** q225: WATERMARK LATE-DATA ACCOUNTING — the streaming-semantics
    * proof none of the other streaming rows exercises: rows that
    * arrive after the watermark has passed their window are DROPPED
    * from the aggregate, and this query measures exactly how many.
    *
    * Deterministic replay: the events table is split into 3 fixture
    * files by `event_id % 3` (each spans the full time range, so later
    * batches genuinely carry late rows), written under a pid-scoped
    * scratch dir with HAND-PINNED spaced mtimes — FileStreamSource
    * orders files by modification time, so `maxFilesPerTrigger=1`
    * replays exactly batch 0, 1, 2. The watermark before batch k is
    * (max event-time over batches < k, truncated to ms) − 1 h; a batch-k
    * row whose 1-hour window END is ≤ that watermark can no longer
    * change any live window and is discarded pre-aggregate. Append
    * mode emits a window only once the watermark passes its end, so
    * the emitted set is the windows closed by the FINAL watermark —
    * the trailing open windows are by-design absent (the
    * at-most-once/completeness trade Append encodes).
    *
    * The result joins the streamed per-window counts against the batch
    * totals: n_late_dropped = n_total − n_on_time, nonzero by
    * construction. The DuckDB oracle replays the same 3-batch
    * simulation arithmetically (cumulative per-batch max, ms
    * truncation, integer µs window math) — the gate hash-pins Spark's
    * exact watermark drop rule cross-engine, including the measured
    * ONE-EXTRA-BATCH propagation lag: batch k's filter runs with the
    * watermark derived from data through batch k−2, not k−1 (batch
    * k's offsets are planned before batch k−1's event-time stats are
    * folded into the tracker — verified row-exactly against three
    * candidate models at sf0.001: the k−1 model mispredicts 318 of
    * 451 emitted windows, the k−2 model matches all 451). VERSION
    * PIN: the k−2 model was measured against Spark 4.1.2's
    * micro-batch planner; it encodes that planner's watermark
    * propagation timing, not a semantic contract. If this gate goes
    * red after a Spark upgrade or a watermark-propagation config
    * change while every OTHER streaming row stays green, diagnose as
    * oracle-model drift (re-measure the lag, likely k−1 under
    * eager-propagation planners) before suspecting the operator. The
    * final
    * flush, by contrast, sees every batch: processAllAvailable keeps
    * running zero-data batches while the watermark still advances, so
    * emission cuts at max(all batches) − delay. Boundary note: every
    * predicate compares an epoch-hour window end against a watermark
    * derived from an arbitrary event µs, so < vs ≤ cannot flip unless
    * the corpus max lands EXACTLY on an hour boundary (it doesn't, and
    * the gate would catch the regeneration that made it so).
    *
    * At 100 TB: the fixture is the test harness, not the operator —
    * the aggregate itself is the standard watermarked tumbling window
    * whose state is bounded by (open windows × groups), and the
    * dropped-row accounting is the join every ingest SLO dashboard
    * runs between the stream's output and the nightly batch recount. */
  /** q231: CHECKPOINTED-STATE RECOVERY ACROSS A QUERY RESTART — the
    * operational proof the other streaming rows assume but never
    * exercise: a stateful query stopped and RESTARTED from its
    * checkpoint must behave as one continuous query.
    *
    * Construction: the documents corpus is split into two generations
    * under a pid-scoped input dir. Generation 1 (doc_id % 2 = 0) is
    * processed by query INCARNATION A — `dropDuplicates("doc_id")`
    * builds per-key state, the parquet file sink commits via its
    * _spark_metadata log — then A STOPS. Generation 2 lands: the odd
    * half PLUS an exact re-send of the even half (the at-least-once
    * upstream retry every ingest pipeline eventually sees). Query
    * incarnation B starts with the SAME checkpoint + sink: the source
    * log tells it generation 1 is already consumed, and the restored
    * dedup state is the ONLY thing that can drop the re-sent rows —
    * a fresh-state restart would emit them and the totals below would
    * double-count the even half. The final frame reads the sink
    * through its commit log (exactly-once files only) and reduces to
    * engine-comparable totals; the DuckDB oracle is the batch
    * distinct over the same union. At 100 TB this is the upgrade/
    * crash-recovery contract: state store + source offsets + sink log
    * all resume from the same WAL, so a restart is invisible in the
    * output. */
  def streamRestartDedup(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
    val root = graft.Scratch.dir("restart_" + math.abs(dir.hashCode))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val in = s"$root/in"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    even.coalesce(1).write.mode("overwrite").parquet(s"$in/g1")
    val schema = spark.read.parquet(s"$in/g1").schema
    def runIncarnation(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(in)
        .dropDuplicates("doc_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runIncarnation() // incarnation A: generation 1, state built
    // generation 2: the odd half + an exact RE-SEND of the even half
    odd.coalesce(1).write.mode("overwrite").parquet(s"$in/g2")
    even.coalesce(1).write.mode("overwrite").parquet(s"$in/g2_resend")
    runIncarnation() // incarnation B: SAME checkpoint — state restored
    spark.read.parquet(sink) // reads via _spark_metadata: committed only
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_doc_id"),
        sum("n_chars").as("sum_chars"))
  }

  val streamRestartDedupSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents""".stripMargin

  def streamLateData(spark: SparkSession, dir: String): DataFrame =
    withNanosAsLong(spark) {
    import org.apache.spark.sql.types.{StructType, StructField, LongType, TimestampType}
    val path = graft.Scratch.dir("late_fixture_" + math.abs(dir.hashCode))
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val tsCol = graft.Tables.tsTimestamp(fileSchema("ts").dataType)
    val base = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), tsCol.as("ts_utc"))
      .withColumn("b", pmod(col("event_id"), lit(3L)))
    for (k <- 0L to 2L) {
      val sub = s"$path/b$k"
      base.filter(col("b") === k).select("event_id", "ts_utc")
        .coalesce(1).write.mode("overwrite").parquet(sub)
      // pin replay order: spaced, deterministic mtimes per batch
      val dirF = new java.io.File(sub)
      dirF.listFiles().foreach(_.setLastModified(1700000000000L + k * 60000L))
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_utc", TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(path)
    val agg = src
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(count(lit(1)).as("n_on_time"))
      .select(unix_millis(col("window.start")).as("hour_start_ms"),
        col("n_on_time"))
    val emitted = drain(agg, freshName("graft_late_", dir), "append")
    val totals = base
      .groupBy(expr("(unix_micros(ts_utc) div 3600000000L) * 3600000L")
        .as("hour_start_ms"))
      .agg(count(lit(1)).as("n_total"))
    emitted.join(totals, "hour_start_ms")
      .select(col("hour_start_ms"), col("n_on_time"), col("n_total"),
        (col("n_total") - col("n_on_time")).as("n_late_dropped"))
      .orderBy("hour_start_ms")
  }

  val streamLateDataSql: String =
    """WITH e AS (
      |  SELECT event_id, epoch_us(ts) AS us, event_id % 3 AS b FROM events),
      |bmax AS (SELECT b, MAX(us) AS mx FROM e GROUP BY 1),
      |wm AS (SELECT d.b,
      |              (SELECT ((MAX(p.mx) // 1000) - 3600000) * 1000
      |               FROM bmax p WHERE p.b < d.b - 1) AS wm_us
      |       FROM (SELECT DISTINCT b FROM e) d),
      |kept AS (
      |  SELECT (e.us // 3600000000) * 3600000000 AS wstart
      |  FROM e JOIN wm ON e.b = wm.b
      |  WHERE wm.wm_us IS NULL
      |     OR (e.us // 3600000000) * 3600000000 + 3600000000 > wm.wm_us),
      |fin AS (SELECT ((MAX(us) // 1000) - 3600000) * 1000 AS fwm FROM e),
      |ontime AS (SELECT wstart, COUNT(*) AS n_on_time FROM kept GROUP BY 1),
      |tot AS (SELECT (us // 3600000000) * 3600000000 AS wstart,
      |               COUNT(*) AS n_total FROM e GROUP BY 1)
      |SELECT CAST(ontime.wstart // 1000 AS BIGINT) AS hour_start_ms,
      |       CAST(n_on_time AS BIGINT) AS n_on_time,
      |       CAST(n_total AS BIGINT) AS n_total,
      |       CAST(n_total - n_on_time AS BIGINT) AS n_late_dropped
      |FROM ontime JOIN tot ON ontime.wstart = tot.wstart, fin
      |WHERE ontime.wstart + 3600000000 <= fin.fwm
      |ORDER BY 1""".stripMargin
}
