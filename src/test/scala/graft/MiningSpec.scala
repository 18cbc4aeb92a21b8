package graft

import graft.operators.Mining
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-10 mining batch: weighted-Jaccard prefix-filter exactness,
  * URL canonicalization invariants, kappa closed form, IPF marginal
  * convergence, containment directionality, k-core vs brute peel. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // deterministic multi-token corpus with planted near/exact dups and
  // heavy size skew — the shapes the prefix + length filters must not drop
  private lazy val corpus: DataFrame = {
    val base = Seq(
      1L -> "alpha beta beta gamma gamma gamma delta",
      2L -> "alpha beta beta gamma gamma gamma delta", // exact dup of 1
      3L -> "alpha beta gamma gamma delta delta epsilon",
      4L -> "zeta eta theta iota kappa",
      5L -> "zeta eta theta iota kappa lambda lambda lambda lambda lambda",
      6L -> "mu", // single-token doc
      7L -> "alpha alpha alpha alpha alpha alpha alpha alpha alpha alpha")
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum",
      "gold", "jade", "rust", "sand")
    val random = (100L until 140L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    (base ++ random).toDF("doc_id", "text")
  }

  /** Unfiltered brute-force weighted Jaccard — the comparator. */
  private def bruteWeighted(docs: DataFrame, p: Long, q: Long): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val sz = tf.groupBy("doc_id").agg(sum("tf").as("sz"))
    val num = tf.as("a").join(tf.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(least(col("a.tf"), col("b.tf"))).as("num"))
    val den = col("sza") + col("szb") - col("num")
    num
      .join(sz.select(col("doc_id"), col("sz").as("sza")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("sz").as("szb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .filter(col("num") * lit(q) >= den * lit(p))
      .select(col("doc_a"), col("doc_b"),
        call_function("div", col("num") * lit(1000000L), den)
          .cast("long").as("wj_ppm"))
  }

  test("q218: prefix+length-filtered pairs identical to brute force") {
    for ((p, q) <- Seq((3L, 5L), (1L, 2L), (4L, 5L))) {
      val fast = Mining.weightedJaccardPairs(corpus, "doc_id", "text", p, q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = bruteWeighted(corpus, p, q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast === brute, s"pair set diverged at t=$p/$q")
      assert(fast.nonEmpty, s"degenerate test corpus at t=$p/$q")
    }
  }

  test("q218: exact duplicate scores 1000000 ppm") {
    val out = Mining.weightedJaccardPairs(corpus, "doc_id", "text")
      .filter(col("doc_a") === 1 && col("doc_b") === 2).collect()
    assert(out.length === 1 && out.head.getLong(2) === 1000000L)
  }

  test("q219: domain partition + dup accounting invariants") {
    val out = Mining.urlHostStats(spark, sf)
    val total = Tables.documents(spark, sf).count()
    assert(out.agg(sum("n_docs")).first().getLong(0) === total)
    // 20 sources x 3 TLDs, every residue class present at sf0.001
    assert(out.count() === 60)
    assert(out.filter(col("dup_docs") =!= col("n_docs") - col("n_urls")).isEmpty)
    assert(out.filter(col("n_urls") > col("n_docs")).isEmpty)
    // tracking params + fragments + case noise MUST collapse some URLs:
    // doc_id%4 in {0,1} share '?id=K' after utm-stripping
    assert(out.agg(sum("dup_docs")).first().getLong(0) > 0)
  }

  test("q220: kappa matches driver-side closed form") {
    val row = Mining.annotatorKappa(spark, sf).first()
    val lab = Tables.events(spark, sf).select(
        col("event_type"),
        expr("CASE WHEN event_id % 10 < 7 THEN event_type " +
          "ELSE concat('aux', CAST(event_id % 3 AS STRING)) END"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = lab.length.toLong
    val agree = lab.count { case (a, b) => a == b }.toLong
    val na = lab.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nb = lab.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val s = na.map { case (k, v) => v * nb.getOrElse(k, 0L) }.sum
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("po_ppm") === agree * 1000000L / n)
    assert(row.getAs[Long]("pe_ppm") === s * 1000000L / (n * n))
    assert(row.getAs[Long]("kappa_ppm") === (agree * n - s) * 1000000L / (n * n - s))
    // the planted 30% corruption keeps kappa strictly inside (0, 1)
    assert(row.getAs[Long]("kappa_ppm") > 0L &&
      row.getAs[Long]("kappa_ppm") < 1000000L)
  }

  test("q221: four IPF rounds land both marginals within 2% of target") {
    val w = Mining.ipfWeights(spark, sf)
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val tRow = total / docs.select("source").distinct().count()
    val tCol = total / docs.select("lang").distinct().count()
    val cells = w.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def maxDev(target: Long, marg: Iterable[Long]): Double =
      marg.map(m => math.abs(m.toDouble / 1e6 - target) / target).max
    val rows = cells.groupBy(_._1).values.map(_.map(c => c._3 * c._4).sum)
    val cols = cells.groupBy(_._2).values.map(_.map(c => c._3 * c._4).sum)
    // column scaling ran LAST, so columns are tighter; rows within 2%
    assert(maxDev(tCol, cols) < 0.001, "column marginals off target")
    assert(maxDev(tRow, rows) < 0.02, "row marginals off target")
  }

  test("q222: containment is directional and size-consistent") {
    val out = Mining.containmentPairs(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 800000L && r.getLong(2) <= 1000000L))
    // full containment requires |A| <= |B|
    val sz = graft.operators.Dedup.shingleTable(
        Tables.documents(spark, sf), "doc_id", "text", 5)
      .groupBy("doc_id").agg(count(lit(1)).as("szn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_.getLong(2) == 1000000L).foreach { r =>
      assert(sz(r.getLong(0)) <= sz(r.getLong(1)),
        s"full containment ${r.getLong(0)} in ${r.getLong(1)} violates sizes")
    }
  }

  test("q224: weighted MinHash pairs are a subset of q218 with identical " +
    "scores; exact-dup recall is total; overall recall clears the band floor") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 400)
    val exact = Mining.weightedJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sketch = Mining.weightedMinhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every surfaced pair verified exactly -> subset with equal scores
    sketch.foreach { case (k, v) =>
      assert(exact.get(k).contains(v), s"pair $k not in exact set or score drifted")
    }
    // banding cannot miss an identical pair: its band keys are equal
    val dups = exact.filter(_._2 == 1000000L).keySet
    assert(dups.subsetOf(sketch.keySet), "missed an exact duplicate")
    // (12,4) banding at t=0.6: P(cand) = 1-(1-J^3)^4 = 0.62 at J=0.6,
    // higher above — 0.4 is a safe floor for the measured mix
    val recall = sketch.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall below band floor")
  }

  test("q226: l-diversity matches driver recompute") {
    val row = Mining.lDiversity(spark, sf).first()
    val groups = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("(CAST(c_acctbal * 100 AS BIGINT) + 100000L) div 100000L"))
      .collect()
      .groupBy(r => (r.getAs[Number](0).longValue, r.getString(1)))
      .view.mapValues(rs => (rs.length.toLong, rs.map(_.getLong(2)).distinct.length.toLong))
      .toMap
    assert(row.getAs[Long]("n_groups") === groups.size.toLong)
    assert(row.getAs[Long]("n_low_div") === groups.values.count(_._2 < 3).toLong)
    assert(row.getAs[Long]("rows_at_risk") ===
      groups.values.filter(_._2 < 3).map(_._1).sum)
    assert(row.getAs[Long]("min_l") === groups.values.map(_._2).min)
  }

  test("q227: modularity matches BigInt driver fold; self-partition scores 0 bound") {
    val row = Mining.modularity(spark, sf).first()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .groupBy(_.getLong(0)).values
      .flatMap(rs => {
        // ROW-level co-occurrence (no within-order part dedup): a part
        // on two lineitems of one order multiplies, matching the
        // operator's row self-join support semantics
        val ps = rs.map(_.getLong(1))
        for (i <- ps.indices; j <- ps.indices; if ps(i) < ps(j))
          yield (ps(i), ps(j))
      })
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSeq
    val brand = Tables.part(spark, sf).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the brand attachment is an INNER join: edges touching a planted
    // orphan part (q12's fixture) fall out in both engines
    val edges = li.filter(e => brand.contains(e._1) && brand.contains(e._2))
    val m = BigInt(edges.size)
    val ec = edges.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).view.mapValues(es => BigInt(es.size)).toMap
    val dc = edges.flatMap(e => Seq(brand(e._1), brand(e._2)))
      .groupBy(identity).view.mapValues(es => BigInt(es.size)).toMap
    val num = dc.map { case (c, d) => 4 * m * ec.getOrElse(c, BigInt(0)) - d * d }.sum
    assert(row.getAs[Long]("m") === m.toLong)
    assert(row.getAs[Long]("n_communities") === dc.size.toLong)
    assert(row.getAs[Long]("q_ppm") === ((num * 1000000) / (4 * m * m)).toLong)
    // brand communities on co-purchase are near-random: |Q| small but
    // the exact value is pinned by the oracle; here only sanity-bound
    assert(math.abs(row.getAs[Long]("q_ppm")) < 500000L)
  }

  test("q228: ER clusters equal a driver union-find over blocked edit-1 pairs") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue,
        r.getString(3), r.getLong(4)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      block <- rows.groupBy(r => (r._3, r._4)).values
      i <- block.indices; j <- i + 1 until block.length
      if lev(block(i)._2, block(j)._2) <= 1
    } {
      val (ra, rb) = (find(block(i)._1), find(block(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = rows.groupBy(r => find(r._1)).collect {
      case (ent, rs) if rs.length > 1 =>
        ent -> (rs.length.toLong, rs.map(_._1).max, rs.map(_._5).sum)
    }
    val got = graft.operators.Mining.entityResolution(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q229: attribution matches a driver session fold; revenue conserved") {
    val out = graft.operators.Mining.touchAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("ts_ns div 1000").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
    val agg = scala.collection.mutable.Map[(String, String), (Long, BigDecimal)]()
    for ((_, events) <- ev.groupBy(_._1)) {
      val sorted = events.sortBy(e => (e._5, e._2))
      var session = Vector.empty[(String, Double)]
      var lastUs = Long.MinValue
      for (e <- sorted) {
        if (lastUs != Long.MinValue && e._5 - lastUs > 1800000000L)
          session = Vector.empty
        if (e._3 == "purchase") {
          val firstT = session.headOption.map(_._1).getOrElse(e._3)
          val lastT = session.lastOption.map(_._1).getOrElse("none")
          val k = (firstT, lastT)
          val (n, v) = agg.getOrElse(k, (0L, BigDecimal(0)))
          agg(k) = (n + 1, v + BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }
        session = session :+ ((e._3, e._4))
        lastUs = e._5
      }
    }
    assert(out.keySet === agg.keySet.toSet)
    out.foreach { case (k, (n, rev)) =>
      assert(n === agg(k)._1, s"count drift at $k")
      assert(math.abs(rev - agg(k)._2.toDouble) < 1e-6, s"revenue drift at $k")
    }
  }

  test("q223: a graph needing exactly maxRounds peels converges; +1 throws") {
    // a path of 2R nodes sheds BOTH deg-1 endpoints per synchronized
    // round: R rounds to the (empty) 2-core — the boundary the budget
    // check must admit (the oracle unrolls exactly maxRounds rounds)
    val R = 4
    val chain = (1L until 2L * R).map(i => (i, i + 1))
    val sym = chain.toDF("src", "dst")
      .unionAll(chain.map(_.swap).toDF("src", "dst"))
    assert(Mining.kcoreOn(sym, k = 2L, maxRounds = R).isEmpty)
    val ex = intercept[IllegalArgumentException] {
      Mining.kcoreOn(sym, k = 2L, maxRounds = R - 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("q231: restored dedup state drops re-sent rows; a fresh-state " +
    "restart double-counts them (negative control)") {
    val row = graft.streaming.StreamOps.streamRestartDedup(spark, sf).first()
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
    assert(row.getAs[Long]("n_docs") === docs.length.toLong)
    assert(row.getAs[Long]("sum_doc_id") === docs.map(_.getLong(0)).sum)
    assert(row.getAs[Long]("sum_chars") === docs.map(_.getLong(1)).sum)

    // negative control: same two-generation replay, but the
    // checkpoint's state/ directory is DELETED between incarnations —
    // offsets survive, dedup state does not. The recovery contract
    // says a restart must never silently act on lost state: either
    // the resumed query fails loudly (state store cannot load its
    // expected version) or the re-sent rows leak into the sink and
    // the totals diverge from the batch oracle. Both outcomes are
    // gate-visible; SILENTLY matching the oracle would mean the
    // positive run above proves nothing.
    import org.apache.spark.sql.functions._
    val root = Scratch.dir("restart_neg")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val even = d.filter(col("doc_id") % 2 === 0)
    even.coalesce(1).write.mode("overwrite").parquet(s"$in/g1")
    val schema = spark.read.parquet(s"$in/g1").schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet").parquet(in)
        .dropDuplicates("doc_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // incarnation A: generation 1
    d.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/g2")
    even.coalesce(1).write.mode("overwrite").parquet(s"$in/g2_resend")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$ckpt/state"))
    val outcome = scala.util.Try { run(); spark.read.parquet(sink).count() }
    outcome match {
      case scala.util.Success(n) =>
        assert(n !== docs.length.toLong,
          "state loss went UNDETECTED: sink matches the batch oracle")
      case scala.util.Failure(_) => () // loud failure — acceptable outcome
    }
  }

  test("q230: histogram-product prediction equals the actual join count") {
    val out = graft.operators.Mining.joinCardinality(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      // the identity |A join B| = sum_k nA_k*nB_k, pinned per key pair
      assert(r.getAs[Long]("predicted_rows") === r.getAs[Long]("actual_rows"),
        s"identity broken for ${r.getString(0)}")
      assert(r.getAs[Long]("top_key_rows") <= r.getAs[Long]("predicted_rows"))
      assert(r.getAs[Long]("skew_ppm") >= 0L &&
        r.getAs[Long]("skew_ppm") <= 1000000L)
    }
    // BigInt driver fold for one pair (customer x orders)
    val co = Tables.orders(spark, sf).select("o_custkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val ck = Tables.customer(spark, sf).select("c_custkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val predicted = ck.map { case (k, n) => BigInt(n) * BigInt(co.getOrElse(k, 0L)) }.sum
    val row = out.find(_.getString(0) == "customer_orders").get
    assert(BigInt(row.getAs[Long]("predicted_rows")) === predicted)
  }

  test("q225: late-data accounting conserves rows and drops strictly late ones") {
    val out = graft.streaming.StreamOps.streamLateData(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_on_time") >= 1L) // emitted windows have survivors
      assert(r.getAs[Long]("n_on_time") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("n_late_dropped") ===
        r.getAs[Long]("n_total") - r.getAs[Long]("n_on_time"))
    }
    // the 3-way interleave plants real late arrivals — drops must occur
    assert(out.map(_.getAs[Long]("n_late_dropped")).sum > 0L)
    // conservation: emitted on-time + emitted drops + rows in the
    // trailing unemitted (still-open) windows == corpus
    val total = Tables.events(spark, sf).count()
    val emittedTotals = out.map(_.getAs[Long]("n_total")).sum
    assert(emittedTotals <= total)
    assert(out.map(_.getAs[Long]("n_on_time")).sum +
      out.map(_.getAs[Long]("n_late_dropped")).sum === emittedTotals)
  }

  test("q223: k-core equals brute-force peel; pendant trees stripped") {
    // triangle 1-2-3 + pendant chain 3-4-5 + isolated edge 6-7:
    // the 2-core is exactly the triangle with residual degree 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val sym = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val core = Mining.kcoreOn(sym, k = 2L, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))

    // random graph: synchronized peel == sequential brute-force peel
    val rnd = new scala.util.Random(11)
    val redges = (1 to 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    var adj = redges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val bad = adj.collect { case (n, ns) if ns.size < 3 => n }.toSet
      changed = bad.nonEmpty
      adj = (adj -- bad).map { case (n, ns) => n -> (ns -- bad) }
        .filter(_._2.nonEmpty)
    }
    val rsym = redges.toDF("src", "dst")
      .unionAll(redges.map(_.swap).toDF("src", "dst"))
    val got = Mining.kcoreOn(rsym, k = 3L, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === adj.view.mapValues(_.size.toLong).toMap)
  }

  test("q258 target encoding: exact shrinkage toward the 50% prior") {
    // cat A: 10/10 positive, cat B: 0/10 -> prior 500000 ppm;
    // enc_A = (10·1e6 + 20·5e5) div 30 = 666666, enc_B = 1e7 div 30
    val t = Seq.fill(10)(("A", 1L)) ++ Seq.fill(10)(("B", 0L))
    val rows = Mining.targetEncodingOf(t.toDF("cat", "y")).collect()
    val m = rows.map(r => r.getAs[String]("cat") ->
      (r.getAs[Long]("prior_ppm"), r.getAs[Long]("enc_ppm"))).toMap
    assert(m("A") === ((500000L, 666666L)))
    assert(m("B") === ((500000L, 333333L)))
    // shrinkage sits strictly between the raw rate and the prior
    assert(m("A")._2 > 500000L && m("A")._2 < 1000000L)
  }

  test("q259 mixture quota: seats sum to K and each is within 1 of exact") {
    val t = Tables.documents(spark, sf).select("source")
    val rows = Mining.mixtureQuotaOf(t, 10000L).collect()
    val n = rows.map(_.getAs[Long]("c")).sum
    assert(rows.map(_.getAs[Long]("quota")).sum === 10000L)
    rows.foreach { r =>
      val (c, q) = (r.getAs[Long]("c"), r.getAs[Long]("quota"))
      // Hamilton bound: |q - c·K/N| < 1  <=>  c·K - N < q·N < c·K + N
      assert(q * n > c * 10000L - n && q * n < c * 10000L + n,
        s"${r.getAs[String]("source")}: quota $q off exact share")
    }
    // deterministic tie-break: equal counts, leftover to smallest name
    val tie = Seq("s1", "s2", "s3").flatMap(s => Seq.fill(1)(s))
    val tr = Mining.mixtureQuotaOf(tie.toDF("source"), 10L).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    assert(tr === Map("s1" -> 4L, "s2" -> 3L, "s3" -> 3L))
  }

  test("q271 Pareto front equals brute-force dominance; cumMax primitive law") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1 to 400).map(_ =>
      (rnd.nextInt(50).toLong * 10 + 100, rnd.nextInt(30).toLong))
    // brute-force skyline: p=(price,size) survives iff no q with
    // q.price <= p.price, q.size >= p.size, and one strict
    val distinct = pts.distinct
    val brute = distinct.filter { case (px, py) =>
      !distinct.exists { case (qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py) }
    }.toSet
    val cells = pts.toDF("price_cents", "size")
      .groupBy("price_cents", "size").agg(count(lit(1)).as("n"))
    val best = cells.groupBy("price_cents")
      .agg(max("size").as("best_size"))
    val front = graft.functions.Ranking.globalCumMaxSorted(
        best, Seq(col("price_cents")), col("best_size"), "prev_best")
      .filter(col("prev_best").isNull || col("best_size") > col("prev_best"))
      .collect().map(r => (r.getAs[Long]("price_cents"),
        r.getAs[Long]("best_size"))).toSet
    assert(front === brute, s"front != brute: extra=${front -- brute} missing=${brute -- front}")

    // the primitive itself: exclusive running max must agree with a
    // sequential scan, including the NULL first row
    val seq0 = (1 to 200).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val got = graft.functions.Ranking.globalCumMaxSorted(
        seq0.toDF("k", "v"), Seq(col("k")), col("v"), "mb")
      .collect().map(r => r.getAs[Long]("k") ->
        (if (r.isNullAt(r.fieldIndex("mb"))) None else Some(r.getAs[Long]("mb"))))
      .toMap
    var run: Option[Long] = None
    seq0.foreach { case (k, v) =>
      assert(got(k) === run, s"k=$k")
      run = Some(run.fold(v)(math.max(_, v)))
    }
  }
}
