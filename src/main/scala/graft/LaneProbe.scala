package graft

import org.apache.spark.sql.DataFrame

/** One-off scale-lane cost probe: times a named ScaleBench lane at the
  * given replica factors in one warmed JVM, before the lane is wired
  * into the bench proper (usage:
  * runMain graft.LaneProbe <sfDir> <lane> <factors-csv> [reps]). */
object LaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val laneName = if (args.length > 1) args(1) else "q218_weighted_jaccard"
    val factors = (if (args.length > 2) args(2) else "1,5").split(",").map(_.toInt)
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = Session.get("graft-lane-probe")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // probe fixtures are multi-GB at x20 — always clean them up, even
    // when a rep throws (Bench deleteQuietly's its lane fixtures; the
    // probe must too or repeated runs accumulate under target/)
    val probeDirs = scala.collection.mutable.ListBuffer.empty[String]
    try factors.foreach { times =>
      val run: () => DataFrame = laneName match {
        case "q218_weighted_jaccard" =>
          // same 1/5 slice the bench lane runs (doc_id = base*times+i,
          // so `div times` recovers the base id in every replica)
          val docs = ScaleBench.documents(spark, sfDir, times)
            .filter(org.apache.spark.sql.functions.expr(s"(doc_id div $times) % 5 = 0"))
            .localCheckpoint(true)
          () => ScaleBench.weightedJaccard(docs)
        case "q223_kcore" =>
          val e = ScaleBench.kcoreEdges(spark, sfDir, times).localCheckpoint(true)
          () => ScaleBench.kcore(e)
        case "q141_stream_incremental_cc" =>
          val p = s"${sys.props("user.dir")}/target/probe_incc_x$times"
          probeDirs += p
          ScaleBench.streamIncCcPrep(spark, sfDir, times, p)
          () => ScaleBench.streamIncrementalCc(spark, sfDir, p, times)
        case "q61_stream_bounded_pair" =>
          // interleaved bounded/unbounded reps in one JVM: the rep pair
          // is the measured cost/saving of the 64-doc bucket cap
          val p = s"${sys.props("user.dir")}/target/probe_bnd_x$times"
          probeDirs += p
          ScaleBench.streamNearDupPrep(spark, sfDir, times, p)
          // rep 1 (the coldest, JIT-penalized rep) must land on the
          // BOUNDED arm the lane is named for; flipping from `true`
          // put it on the unbounded arm and, with an odd rep count,
          // sampled the arms 3-2 against the cap
          var bounded = false
          () => {
            bounded = !bounded
            val k = if (bounded) 64 else Int.MaxValue
            println(s"LANEPROBE variant: maxBucketHistory=$k")
            ScaleBench.streamNearDup(spark, p, times, maxBucketHistory = k)
          }
        case "q61_stream_rocksdb" =>
          val p = s"${sys.props("user.dir")}/target/probe_stream_x$times"
          probeDirs += p
          ScaleBench.streamNearDupPrep(spark, sfDir, times, p)
          () => graft.streaming.StreamOps.withStateStore(spark,
            graft.streaming.StreamOps.RocksDbProvider) { s2 =>
            ScaleBench.streamNearDup(s2, p, times)
          }
        case "q61_microbatch_floor" =>
          // round-12 verdict #2: the q61 lane pays ~0.9 s/microbatch
          // fixed cost. Sweep the two candidate levers in one JVM —
          // batch COUNT (maxFilesPerTrigger) and STATE-STORE count
          // (shuffle partitions: each microbatch commits one store per
          // partition) — same data every combo, so the fit isolates the
          // floor. Cycle combos across reps; pass reps = k*|combos|.
          val p = s"${sys.props("user.dir")}/target/probe_floor_x$times"
          probeDirs += p
          ScaleBench.streamNearDupPrep(spark, sfDir, times, p)
          val combos = Seq( // (filesPerTrigger, statePartitions)
            (2, -1), (2, 8), (2, 4), (times, -1), (times, 8))
          var i = -1
          () => {
            i += 1
            val (f, sp) = combos(i % combos.length)
            val batches = math.ceil(2.0 * times / f).toInt
            println(s"LANEPROBE combo: filesPerTrigger=$f " +
              s"statePartitions=$sp batches=$batches")
            ScaleBench.streamNearDup(spark, p, times, filesPerTrigger = f,
              statePartitions = sp)
          }
        case "q146_layout_build" =>
          // byte-law probe for the build's shuffle shape: each rep
          // prints its measured shuffle-write MB (the wall is
          // secondary — the law is bytes-linear-in-E at every factor)
          val e = ScaleBench.pageRankEdges(spark, sfDir, times)
          () => {
            val io = Metrics.measure(spark)(
              ScaleBench.pageRankLayoutBuild(spark, e, times))
            println(f"LANEPROBE shuffleMB x$times: ${io.shuffleWriteBytes / 1e6}%.2f")
            spark.range(0).toDF() // noop target
          }
        case "ingest_load_largest" =>
          // the bench's Polars-comparable typed parse of the largest
          // fixture file, in a fresh JVM — attribution probe for
          // round-over-round drift in the ingest block (factor ignored)
          val (largest, _) = graft.sources.IngestFixture.ensure(spark)
          () => graft.sources.CsvSource.alignTo(
            graft.sources.CsvSource.readRaw(spark, largest),
            graft.model.ReferenceSchemas.transactions)
        case "ingest_raw_read" =>
          // the parse-only control for the lane above: same file, same
          // univocity read, NO typed repair — the wall delta between
          // the two lanes is the alignTo expression cost, the part the
          // engine owns (the parse is Spark's CSV datasource)
          val (largest, _) = graft.sources.IngestFixture.ensure(spark)
          () => graft.sources.CsvSource.readRaw(spark, largest)
        case "ingest_attrib" =>
          // attribution sweep INSIDE the typed-repair term: the same
          // largest-file frame through expression subsets, so the wall
          // deltas name the cost of each repair stage (cycle variants
          // across reps; pass reps = k*|variants|)
          import org.apache.spark.sql.functions.{col, lit}
          import org.apache.spark.sql.types.{BooleanType, DecimalType}
          val (largest, _) = graft.sources.IngestFixture.ensure(spark)
          val target = graft.model.ReferenceSchemas.transactions
          def raw() = graft.sources.CsvSource.readRaw(spark, largest)
            .toDF(graft.sources.CsvSource.readRaw(spark, largest)
              .columns.map(_.toLowerCase): _*)
          val variants: Seq[(String, () => DataFrame)] = Seq(
            "full" -> (() => graft.sources.CsvSource.alignTo(
              graft.sources.CsvSource.readRaw(spark, largest), target)),
            // no placeholder normalization: typed casts on raw strings
            "no_placeholder" -> (() => {
              val r = raw()
              r.select(target.fields.map { f =>
                if (!r.columns.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
                else (f.dataType match {
                  case d: DecimalType =>
                    graft.functions.Validate.decimalComma(col(f.name), d.precision, d.scale)
                  case BooleanType => graft.functions.Validate.bool01(col(f.name))
                  case t => col(f.name).cast(t)
                }).as(f.name)
              }.toSeq: _*)
            }),
            // placeholders only, every column stays string
            "no_casts" -> (() => {
              val r = raw()
              r.select(target.fields.map { f =>
                if (!r.columns.contains(f.name)) lit(null).cast("string").as(f.name)
                else graft.functions.Validate.normalizePlaceholders(col(f.name)).as(f.name)
              }.toSeq: _*)
            }),
            // neither: the projection-only control (≈ raw parse)
            "neither" -> (() => {
              val r = raw()
              r.select(target.fields.map(f =>
                (if (r.columns.contains(f.name)) col(f.name)
                 else lit(null).cast("string")).as(f.name)).toSeq: _*)
            }))
          var vi = -1
          () => { vi += 1; val (n, f) = variants(vi % variants.length)
                  println(s"LANEPROBE variant: $n"); f() }
        case "ingest_ph_variants" =>
          // expression-level attribution INSIDE normalizePlaceholders:
          // which term costs — trim, the length gate, lower+isin?
          import org.apache.spark.sql.functions._
          val (largest, _) = graft.sources.IngestFixture.ensure(spark)
          val target = graft.model.ReferenceSchemas.transactions
          val tokens = graft.functions.Validate.defaultNullTokens
          val maxLen = tokens.map(_.length).max
          val byLen = tokens.groupBy(_.length).toSeq.sortBy(_._1)
          def sweep(norm: org.apache.spark.sql.Column =>
              org.apache.spark.sql.Column): DataFrame = {
            val r0 = graft.sources.CsvSource.readRaw(spark, largest)
            val r = r0.toDF(r0.columns.map(_.toLowerCase): _*)
            r.select(target.fields.map(f =>
              (if (r.columns.contains(f.name)) norm(col(f.name))
               else lit(null).cast("string")).as(f.name)).toSeq: _*)
          }
          val variants: Seq[(String, () => DataFrame)] = Seq(
            "current" -> (() => sweep(c =>
              graft.functions.Validate.normalizePlaceholders(c, tokens))),
            "trim_only" -> (() => sweep(c =>
              when(length(trim(c.cast("string"))) === -1, lit(null))
                .otherwise(c))),
            "len_gate_only" -> (() => sweep { c =>
              val t = trim(c.cast("string"))
              when(length(t) <= maxLen && t === "~never~", lit(null))
                .otherwise(c)
            }),
            "exact_len_groups" -> (() => sweep { c =>
              val t = trim(c.cast("string"))
              val n = length(t)
              val cond = byLen.map { case (len, toks) =>
                if (len == 0) n === 0
                else n === len && lower(t).isin(toks.map(_.toLowerCase): _*)
              }.reduce(_ || _)
              when(cond, lit(null)).otherwise(c)
            }))
          var vj = -1
          () => { vj += 1; val (n, f) = variants(vj % variants.length)
                  println(s"LANEPROBE variant: $n"); f() }
        case "ingest_aligned" =>
          // full-warehouse stage control (round-14 verdict #1): parse +
          // normalize + typed repair + align + diagonal union over all
          // THREE files, no write — the bench's ingest_stage_aligned
          // lane in a fresh JVM
          val (_, files) = graft.sources.IngestFixture.ensure(spark)
          () => graft.sources.CsvSource.readAligned(spark, files,
            graft.model.ReferenceSchemas.transactions)
        case "ingest_full_warehouse" =>
          // the whole lane (read -> repair -> union -> month-partitioned
          // write) on its own clock in a fresh JVM — the attribution
          // probe for round-over-round drift in the full-warehouse wall
          val (_, files) = graft.sources.IngestFixture.ensure(spark)
          val whP = s"${sys.props("user.dir")}/target/probe_ingest_wh"
          probeDirs += whP
          () => {
            graft.sources.IngestFixture.fullIngest(spark, files, whP)
            spark.range(0).toDF() // noop target
          }
        case other => sys.error(s"unknown lane $other")
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        noop(run())
        println(f"LANEPROBE $laneName x$times rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally {
      probeDirs.foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      spark.stop()
    }
  }
}
