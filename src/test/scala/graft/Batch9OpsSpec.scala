package graft

import graft.operators.{Curation, Quality, TextQuality}
import org.apache.spark.sql.functions._

/** Law checks for the round-9 operator batches (q187-q213: curation,
  * sketches, graph features, event analytics, multimodal funnels) —
  * each is independently gated against DuckDB; these specs pin the
  * SEMANTICS against brute-force recomputations so a refactor that
  * changes both engine and oracle in the same wrong way still fails.
  */
class Batch9OpsSpec extends SparkSpec {

  test("q187 paragraphDedup: kept lines are exactly the distinct lines, " +
    "each at its first occurrence") {
    val rows = Curation.paragraphDedup(spark, sf).collect()
    // rebuild the page corpus the operator saw
    val pages = Tables.documents(spark, sf)
      .select((col("doc_id") / 5).cast("long").as("page_id"),
        col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (pid, rs) =>
        pid -> rs.sortBy(_._2).map(_._3).mkString("\n")
      }
    val allLines = pages.toSeq.sortBy(_._1)
      .flatMap { case (pid, text) =>
        text.split("\n", -1).zipWithIndex.map { case (l, i) => (pid, i, l) } }
    val nDistinct = allLines.map(_._3).distinct.size
    // conservation: total kept == distinct line count
    assert(rows.map(_.getLong(2)).sum === nDistinct.toLong)
    // per page: the kept lines are those whose (page, pos) is the
    // global arg-min occurrence of the line
    val firstOcc = allLines.groupBy(_._3)
      .map { case (l, occ) => l -> occ.map(o => o._1 * 1000000L + o._2).min }
    rows.foreach { r =>
      val pid = r.getLong(0)
      val cleaned = r.getString(3)
      val expected = allLines
        .filter(o => o._1 == pid && firstOcc(o._3) == o._1 * 1000000L + o._2)
        .sortBy(_._2).map(_._3).mkString("\n")
      assert(cleaned === expected, s"page $pid")
    }
  }

  test("q188 qualityClassifier: score equals the brute-force integer form") {
    val got = TextQuality.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5), r.getBoolean(6)))
      .toMap
    val stopRe = graft.functions.Text.stopwords.toMap.apply("en").r
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .foreach { r =>
        val id = r.getLong(0); val text = r.getString(1)
        val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        val nToks = toks.size.toLong
        val wc = toks.map(_.length).sum.toLong
        val nc = text.length.toLong
        val nStop = stopRe.findAllIn(text).size.toLong
        val stopPm = nStop * 1000 / math.max(nToks, 1)
        val alnumPm = wc * 1000 / math.max(nc, 1)
        val avglen = wc * 1000 / math.max(nToks, 1)
        val score = 3000 * stopPm + 1000 * alnumPm -
          400 * math.abs(avglen - 4500) + 800 * math.min(nToks, 500) - 1000000
        val (gToks, gScore, gKeep) = got(id)
        assert(gToks === nToks, s"doc $id n_toks")
        assert(gScore === score, s"doc $id score")
        assert(gKeep === (score >= 0), s"doc $id keep")
      }
    // the threshold must actually split the corpus (a degenerate
    // all-keep / all-drop classifier gates nothing)
    val keeps = got.values.map(_._3).toSeq
    assert(keeps.contains(true) && keeps.contains(false))
  }

  test("q189 cmsAccuracy: CM overcount law holds and the estimate is " +
    "the min over the 4 probed cells") {
    val rows = Quality.cmsAccuracy(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      val over = r.getLong(3); val slack = r.getLong(4)
      assert(est >= exact, s"${r.getString(0)}: CM must never undercount")
      assert(over === est - exact)
      assert(slack >= 0L)
    }
    // probes are the 20 heaviest tokens in exact-descending order
    val exacts = rows.map(_.getLong(1)).toSeq
    assert(exacts === exacts.sorted.reverse)
  }

  test("q191 sourceOverlap: exact Jaccard matches a brute-force set fold; " +
    "estimate within 4/sqrt(k) of exact") {
    val rows = Curation.sourceOverlap(spark, sf).collect()
    val sets = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.flatMap(r =>
          "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)).toSet }
    val srcs = sets.keys.toSeq.sorted
    assert(rows.length === srcs.combinations(2).size)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val inter = (sets(sa) & sets(sb)).size.toLong
      val union = (sets(sa) | sets(sb)).size.toLong
      assert(r.getLong(2) === inter, s"$sa-$sb inter")
      assert(r.getLong(3) === union, s"$sa-$sb union")
      assert(r.getLong(4) === inter * 1000000L / union, s"$sa-$sb exact ppm")
      // KMV concentration: |est - exact| <= ~4/sqrt(k) (k=256 -> 250000 ppm
      // worst case; typically far tighter)
      assert(math.abs(r.getLong(6)) <= 250000L, s"$sa-$sb est err ${r.getLong(6)}")
    }
  }

  test("q192 audioSegments: segment structure equals a driver-side " +
    "recomputation from the decoded samples") {
    val got = graft.operators.Advanced.audioSegments(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 2 == 1)
      .map { id =>
        val nVals = ((id % 3 + 1) * (id % 100 + 1)).toInt
        val xs = (0 until nVals).map { k =>
          val u = (2 * k * 37) % 256 + 256 * (((2 * k + 1) * 37) % 256)
          if (u >= 32768) u - 65536 else u
        }
        val frames = xs.grouped(8).toSeq
        val active = frames.map(f =>
          f.map(x => x.toLong * x).sum >= 300000000L * f.size)
        // islands over the boolean gate sequence
        val segLens = active.foldLeft(Vector.empty[Long] -> false) {
          case ((segs, prev), a) =>
            if (a && prev) (segs.init :+ (segs.last + 1), true)
            else if (a) (segs :+ 1L, true)
            else (segs, false)
        }._1
        id -> (frames.size.toLong, segLens.sum, segLens.size.toLong, segLens.sorted.lastOption.getOrElse(0L))
      }.toMap
    assert(got === expected)
  }

  test("q193 dupSpanProfile: width flags are monotone and 20-width flag " +
    "agrees with q162 membership") {
    val rows = Curation.dupSpanProfile(spark, sf).collect()
    rows.foreach { r =>
      val (s10, s20, s40, mx) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // a shared 40-window implies shared 20 and 10 subwindows
      assert(s40 <= s20 && s20 <= s10, s"doc ${r.getLong(0)} monotone")
      val expectedMax = if (s40 == 1) 40L else if (s20 == 1) 20L else if (s10 == 1) 10L else 0L
      assert(mx === expectedMax)
    }
    val w20docs = rows.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet
    val q162docs = Curation.sharedSubstring(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(w20docs === q162docs)
  }

  test("q194 streamCms: the incremental sketch fold produces the exact " +
    "batch gate frame") {
    val streamed = graft.streaming.StreamOps.streamCmsHeavyHitters(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = Quality.cmsAccuracy(spark, sf).collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }

  private def testGraphEdges(): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = li.groupBy(_._1)
    val e0 = byOrder.values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    e0 ++ e0.map { case (u, v) => (v, u) }
  }

  test("q195 twoHopReach: equals a driver-side adjacency fold") {
    val got = graft.operators.Graph.twoHopReach(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = testGraphEdges()
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val expected = adj.map { case (u, ns) =>
      u -> ns.flatMap(adj(_)).diff(ns + u).size.toLong
    }.filter(_._2 > 0)
    assert(got === expected)
  }

  test("q196 labelPropagation: equals a driver-side 3-round synchronous fold") {
    val got = graft.operators.Graph.labelPropagation(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val edges = testGraphEdges()
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq }
    val nodes = adj.keySet
    val seeds = nodes.filter(_ % 50 == 0).map(n => n -> n).toMap
    var labels: Map[Long, Option[Long]] =
      nodes.map(n => n -> seeds.get(n)).toMap
    for (_ <- 1 to 3) {
      val voted = nodes.map { n =>
        val nb = adj(n).flatMap(labels(_))
        val v = if (nb.isEmpty) None
        else Some(nb.groupBy(identity).toSeq
          .map { case (l, o) => (-o.size, l) }.min._2)
        n -> v
      }.toMap
      labels = nodes.map(n =>
        n -> seeds.get(n).orElse(voted(n))).toMap
    }
    assert(got === labels)
  }

  test("q197 featureHash: equals a driver-side signed-hash fold") {
    val got = graft.operators.Retrieval.featureHash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).map { w =>
          val bucket = java.lang.Long.parseLong(md5hex("fh" + w).take(15), 16) % 64
          val sign = if (java.lang.Long.parseLong(md5hex("sgn" + w).take(1), 16) % 2 == 0) 1L else -1L
          (id, bucket) -> sign
        }
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      .filter(_._2 != 0L)
    assert(got === expected)
  }

  test("q198 sampleAqp: the sample is the md5 channel's and scaled counts " +
    "reconcile") {
    val rows = Quality.sampleAqpGate(spark, sf).collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getString(0), r.getLong(1) * 10 + r.getInt(2)))
    val exact = li.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val sampled = li.filter { case (_, rk) =>
      java.lang.Long.parseLong(md5hex(rk.toString).take(15), 16) % 16 == 0 }
      .groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(1) === exact(flag))
      assert(r.getLong(2) === sampled.getOrElse(flag, 0L) * 16)
      assert(r.getLong(5) ===
        math.abs(r.getLong(2) - r.getLong(1)) * 1000000L / r.getLong(1))
    }
  }

  test("q199 lshRecall: confusion counts are consistent and post-verify " +
    "LSH never fabricates a pair") {
    val r = graft.operators.Llm.lshRecallGate(spark, sf).collect().head
    val (nTrue, nFound, nTp, nMissed, nFalse, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nFalse === 0L, "post-verify LSH must be a subset of ground truth")
    assert(nFound === nTp)
    assert(nTp + nMissed === nTrue)
    assert(recall === nTp * 1000000L / math.max(nTrue, 1L))
    assert(nTrue > 0L, "gate corpus must contain true near-dup pairs")
    assert(recall >= 900000L, s"recall floor: $recall ppm")
  }

  test("q200 audioFunnel: per-rule flags recompute from the feature columns") {
    val rows = graft.operators.Advanced.audioFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    var keeps = 0
    rows.foreach { r =>
      val maxAbs = r.getLong(2); val nFrames = r.getLong(3)
      val nActive = r.getLong(4); val nSegs = r.getLong(5)
      val duty = r.getLong(6)
      assert(duty === nActive * 1000 / math.max(nFrames, 1))
      assert(r.getBoolean(7) === (nSegs >= 1))
      assert(r.getBoolean(8) === (maxAbs < 32000))
      assert(r.getBoolean(9) === (duty >= 100 && duty <= 950))
      assert(r.getBoolean(10) ===
        (r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9)))
      if (r.getBoolean(10)) keeps += 1
    }
    assert(keeps > 0 && keeps < rows.length,
      "funnel must actually separate assets")
  }

  test("q201 incrementalZoneMaps: incremental union equals the " +
    "source-derived stats and the append created new files") {
    val got = graft.operators.Advanced.incrementalZoneMaps(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0))
    val byBucket = keys.groupBy(_ % 4)
    assert(got.keySet === byBucket.keySet.map(b => s"bucket=$b"))
    byBucket.foreach { case (b, ks) =>
      val (nFiles, nRows, minK, maxK) = got(s"bucket=$b")
      assert(nFiles === ks.map(k => k % 5 == 0).distinct.size.toLong,
        s"bucket $b files")
      assert(nRows === ks.length.toLong)
      assert(minK === ks.min && maxK === ks.max)
    }
  }

  private def collectedEvents(): Array[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("q202 conversionFunnel: stage populations equal a driver-side fold") {
    val got = graft.operators.Temporal.conversionFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byUser = collectedEvents().groupBy(_._1)
    val tv = byUser.flatMap { case (u, es) =>
      es.filter(_._3 == "view").map(_._4).minOption.map(u -> _) }
    val tc = tv.flatMap { case (u, t) =>
      byUser(u).filter(e => e._3 == "click" && e._4 > t)
        .map(_._4).minOption.map(u -> _) }
    val tp = tc.flatMap { case (u, t) =>
      byUser(u).filter(e => e._3 == "purchase" && e._4 > t)
        .map(_._4).minOption.map(u -> _) }
    assert(got("1_view")._1 === tv.size.toLong)
    assert(got("2_click_after_view")._1 === tc.size.toLong)
    assert(got("3_purchase_after_click")._1 === tp.size.toLong)
    // stage 1 has no previous stage: conv_ppm is DEFINED as 10^6, not
    // n_users·10^6 (the value Spark's null-skipping greatest() would
    // produce if the first stage rode the ratio path — round-9 ADVICE)
    assert(got("1_view")._2 === 1000000L)
    assert(got("2_click_after_view")._2 === tc.size.toLong * 1000000L / tv.size)
    assert(got("3_purchase_after_click")._2 === tp.size.toLong * 1000000L / tc.size)
  }

  test("q203 retentionCohorts: matrix equals a driver-side Monday-week fold") {
    val got = graft.operators.Temporal.retentionCohorts(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    def week(us: Long): java.time.LocalDate = {
      val d = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    }
    val uw = collectedEvents().map(e => (e._1, week(e._4))).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expected = uw.groupBy { case (u, w) =>
      (cohort(u).toString,
        java.time.temporal.ChronoUnit.DAYS.between(cohort(u), w) / 7)
    }.map { case (k, v) => k -> v.map(_._1).distinct.size.toLong }
    assert(got === expected)
  }

  test("q204 eventTransitions: pair counts equal a driver-side ordered fold") {
    val got = graft.operators.Temporal.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val pairs = collectedEvents().groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).map(_._3)
      sorted.zip(sorted.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expected = counts.map { case (k, n) =>
      k -> (n, n * 1000000L / totals(k._1)) }
    assert(got === expected)
  }

  test("q205 runningBalance: extremes equal a BigDecimal ordered fold") {
    val got = graft.operators.Temporal.runningBalance(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("us"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    evs.groupBy(_._1).foreach { case (u, es) =>
      val vs = es.sortBy(e => (e._3, e._2))
        .map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      val bals = vs.scanLeft(BigDecimal(0))(_ + _).drop(1)
      val (n, fin, peak, trough) = got(u)
      assert(n === es.length.toLong)
      assert(fin === bals.last.toDouble, s"user $u final")
      assert(peak === bals.max.toDouble, s"user $u peak")
      assert(trough === bals.min.toDouble, s"user $u trough")
    }
  }

  test("q206 sessionFunnel: stage session counts equal a driver-side " +
    "session fold") {
    val got = graft.operators.Temporal.sessionFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gap = 30L * 60 * 1000 * 1000
    val sessions = collectedEvents().groupBy(_._1).toSeq.flatMap {
      case (u, es) =>
        val sorted = es.sortBy(e => (e._4, e._2))
        var sid = 0L; var prev = Long.MinValue
        sorted.map { e =>
          if (prev == Long.MinValue || e._4 - prev > gap) sid += 1
          prev = e._4
          ((u, sid), e._3, e._4)
        }
    }.groupBy(_._1)
    val s1 = sessions.flatMap { case (k, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.map(k -> _) }
    val s2 = s1.flatMap { case (k, tv) =>
      sessions(k).filter(e => e._2 == "click" && e._3 > tv)
        .map(_._3).minOption.map(k -> _) }
    val s3 = s2.flatMap { case (k, tc) =>
      sessions(k).filter(e => e._2 == "purchase" && e._3 > tc)
        .map(_._3).minOption.map(k -> _) }
    assert(got("1_view") === s1.size.toLong)
    assert(got("2_click_after_view") === s2.size.toLong)
    assert(got("3_purchase_after_click") === s3.size.toLong)
  }

  test("q207 gapQuantiles: dyadic percentiles equal a driver-side " +
    "interpolation") {
    val got = graft.operators.Temporal.gapQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val gaps = collectedEvents().groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (b._3, b._4 - a._4) }
    }.groupBy(_._1)
    def pct(xs: Seq[Long], q: Double): Double = {
      val s = xs.sorted
      val pos = (s.size - 1) * q
      val lo = pos.toInt; val frac = pos - lo
      if (frac == 0) s(lo).toDouble
      else s(lo) + frac * (s(lo + 1) - s(lo))
    }
    gaps.foreach { case (t, g) =>
      val xs = g.map(_._2)
      val (n, med, p75, mx) = got(t)
      assert(n === xs.size.toLong)
      assert(med === pct(xs, 0.5), s"$t median")
      assert(p75 === pct(xs, 0.75), s"$t p75")
      assert(mx === xs.max)
    }
  }

  test("q208 groupingSets: every set is its own exact GROUP BY") {
    val got = graft.operators.Advanced.groupingSetsSummary(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val detail = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byFlag = li.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val byMode = li.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    detail.foreach { case ((f, m), n) => assert(got((f, m)) === n) }
    byFlag.foreach { case (f, n) => assert(got((f, "ALL")) === n) }
    byMode.foreach { case (m, n) => assert(got(("ALL", m)) === n) }
    assert(got.size === detail.size + byFlag.size + byMode.size)
  }

  test("q209 locfImpute: fill equals a driver-side carry and leading " +
    "nulls stay unfillable") {
    val got = graft.operators.Temporal.locfImpute(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    evs.groupBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val vs = sorted.map(e => if (e._2 % 7 == 0) None else Some(e._4))
      val filled = vs.scanLeft(Option.empty[Double])((c, v) => v.orElse(c)).drop(1)
      val sum = filled.flatten
        .map(d => BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum
      val (n, miss, unfill, fs) = got(u)
      assert(n === es.length.toLong)
      assert(miss === vs.count(_.isEmpty).toLong)
      assert(unfill === filled.count(_.isEmpty).toLong)
      assert(fs === sum.toDouble, s"user $u")
    }
  }

  test("q212 vacuum: construction counts pinned, snapshot survives, " +
    "rerun deletes nothing") {
    val r = graft.operators.Advanced.vacuumOrphans(spark, sf).collect().head
    assert(r.getLong(0) === 6L, "2+2 manifested + 2 orphaned files")
    assert(r.getLong(1) === 2L, "vacuum deletes exactly the orphans")
    assert(r.getLong(2) === 0L, "second vacuum is a no-op")
    assert(r.getLong(3) === Tables.lineitem(spark, sf).count())
  }

  test("q213 embeddingAudit: norm profile equals a driver-side fold") {
    val got = graft.operators.Llm.embeddingAudit(spark, sf).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val embs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    embs.groupBy(_._1).foreach { case (lab, vs) =>
      val norms = vs.map { case (_, v) =>
        val dot = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
        BigDecimal(math.sqrt(dot))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val (n, dimOk, nZero, mn, mx, sm) = got(lab)
      assert(n === vs.length.toLong)
      assert(dimOk === vs.count(_._2.length == 64).toLong)
      assert(nZero === norms.count(_ == 0.0).toLong)
      assert(mn === norms.min && mx === norms.max)
      assert(sm === norms.map(d =>
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }
  }

  test("q214 basketTriples: L2-pruned counts equal an unpruned driver fold") {
    val got = graft.operators.Graph.basketTriples(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val expected = baskets.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.size; k <- j + 1 until ps.size)
        yield (ps(i), ps(j), ps(k))
    }.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      .filter(_._2 >= 2L)
    assert(got === expected)
  }

  test("q215 personalizedPageRank: ranks concentrate on/near seeds and " +
    "differ from uniform PageRank") {
    val ppr = graft.operators.Graph.personalizedPageRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(ppr.nonEmpty)
    // non-seed nodes can only hold diffused mass: every top node is
    // either a seed or has positive rank strictly below the max seed
    val seeds = ppr.filter { case (n, _) => n % 100 == 0 && n < 10000000L }
    assert(seeds.nonEmpty, "seed nodes must surface in the top-20")
    // personalization must actually change the ranking
    val uniform = graft.operators.Graph.pageRank(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(ppr.map(_._1).toSeq !== uniform)
  }

  test("q216 seasonalOutliers: deviation equals a BigInt weekday-baseline " +
    "fold") {
    val got = graft.operators.Temporal.seasonalOutliers(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(to_date(col("l_shipdate")).as("day"), col("l_extendedprice"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val daily = rows.groupBy(_._1).map { case (d, vs) =>
      val cents = vs.map(v => BigDecimal(v._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum * 10000
      (d, cents.toBigInt)
    }
    val dowOf = (d: java.time.LocalDate) =>
      (java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(1970, 1, 1), d) % 7 + 7) % 7
    val base = daily.groupBy { case (d, _) => dowOf(d) }
      .map { case (k, vs) => k -> (vs.size, vs.map(_._2).sum) }
    daily.foreach { case (d, cents) =>
      val (nDow, sCents) = base(dowOf(d))
      val dev = ((cents * nDow - sCents).abs * 1000000 / sCents).toLong
      val (gDow, gDev, gOut) = got(d.toString)
      assert(gDow === dowOf(d), s"$d dow")
      assert(gDev === dev, s"$d deviation")
      assert(gOut === (dev > 500000L))
    }
  }

  test("q211 imageFunnel: flags recompute from the closed-form fixture") {
    val rows = graft.operators.Advanced.imageFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    var keeps = 0
    rows.foreach { r =>
      val (w, h, np, bp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val id = r.getLong(0)
      assert(w === id % 64 + 1 && h === id * 7 % 48 + 1 && np === w * h)
      assert(r.getBoolean(5) === (np >= 256))
      assert(r.getBoolean(6) === (math.max(w, h) <= 4 * math.min(w, h)))
      assert(r.getBoolean(7) === (bp >= 100 && bp <= 900))
      assert(r.getBoolean(8) ===
        (r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7)))
      if (r.getBoolean(8)) keeps += 1
    }
    assert(keeps > 0 && keeps < rows.length,
      "funnel must actually separate assets")
  }

  test("q190 sourceDrift: tvd_ppm equals the BigInt brute-force fold " +
    "and sits in [0, 1e6]") {
    val got = Curation.sourceDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap { r =>
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
          .map(w => (r.getString(0), w)) }
    val bySrcWord = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byWord = toks.groupBy(_._2).map { case (w, v) => w -> v.length.toLong }
    val bySrc = toks.groupBy(_._1).map { case (s, v) => s -> v.length.toLong }
    val nTot = BigInt(toks.length)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, nS) =>
      val vocab = bySrcWord.keys.filter(_._1 == src).map(_._2).toSeq
      // TRUE total variation: the fold runs over the FULL corpus
      // vocabulary — words the source never emits contribute n_w·N_s
      // each (round-9 ADVICE: the old fold shared the operator's
      // inner-join truncation, so the gate couldn't see the missing
      // mass)
      // iterator, not .keys.map: mapping a key SET would collapse
      // equal cross-term values before the sum
      val cross = byWord.iterator.map { case (w, nW) =>
        (BigInt(bySrcWord.getOrElse((src, w), 0L)) * nTot
          - BigInt(nW) * nS).abs
      }.sum
      val tvd = (cross * 1000000 / (BigInt(nS) * nTot * 2)).toLong
      val (gTok, gVocab, gTvd) = got(src)
      assert(gTok === nS, s"$src tokens")
      assert(gVocab === vocab.size.toLong, s"$src vocab")
      assert(gTvd === tvd, s"$src tvd")
      assert(gTvd >= 0L && gTvd <= 1000000L)
    }
  }
}
