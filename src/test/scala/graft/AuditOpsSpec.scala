package graft

import graft.operators.{Quality, Retrieval, Temporal, TextQuality}
import org.apache.spark.sql.functions._

/** Law checks for the round-9 audit/retrieval operators (q181-q185) —
  * each is independently gated against DuckDB; these specs pin the
  * SEMANTICS against brute-force recomputations so a refactor that
  * changes both engine and oracle in the same wrong way still fails.
  */
class AuditOpsSpec extends SparkSpec {

  test("q181 encodingAudit: per-source counts equal the planted residue classes") {
    val got = TextQuality.encodingAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySource = docs.groupBy(_._1)
    assert(got.keySet === bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val ids = rows.map(_._2)
      val (nDocs, nMoji, nCtrl, nRepl) = got(src)
      assert(nDocs === ids.length.toLong)
      // the corpus itself is clean ASCII, so detection == planting
      assert(nMoji === ids.count(_ % 7 == 0).toLong, s"mojibake in $src")
      assert(nCtrl === ids.count(_ % 11 == 0).toLong, s"control in $src")
      assert(nRepl === ids.count(_ % 13 == 0).toLong, s"replacement in $src")
    }
  }

  test("q182 phraseSearch: equals a driver-side sliding-window scan") {
    val phrase = Seq("table", "window", "key")
    val got = Retrieval.phraseSearch(spark, sf, phrase).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        val starts = toks.sliding(phrase.size).zipWithIndex
          .collect { case (w, i) if w.sameElements(phrase) => i.toLong }
          .toSeq
        if (starts.isEmpty) None
        else Some(r.getLong(0) -> ((starts.size.toLong, starts.min)))
      }.toMap
    assert(got === brute)
  }

  test("q182 phraseSearch: rejects repeated phrase terms") {
    intercept[IllegalArgumentException] {
      Retrieval.phraseSearch(spark, sf, Seq("table", "table"))
    }
  }

  test("q183 ohlcBars: OHLC invariants and totals") {
    val rows = Temporal.ohlcBars(spark, sf).collect()
    val nTotal = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(6)).sum === nTotal) // every event lands in one bar
    rows.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= high)
      assert(open >= low && open <= high)
      assert(close >= low && close <= high)
      if (r.getLong(6) == 1L) assert(open === close && open === high && high === low)
    }
    // spot-check one multi-event bar against a driver-side recompute
    val bar = rows.filter(_.getLong(6) > 2).head
    val evs = Tables.events(spark, sf)
      .filter(col("event_type") === bar.getString(0) &&
        date_trunc("hour", col("ts")) === bar.getTimestamp(1))
      .select(col("ts"), col("event_id"), col("value")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(bar.getDouble(2) === evs.head._3)   // open
    assert(bar.getDouble(5) === evs.last._3)   // close
    assert(bar.getDouble(3) === evs.map(_._3).max)
    assert(bar.getDouble(4) === evs.map(_._3).min)
  }

  test("q184 benfordAudit: counts partition the table; ppm columns consistent") {
    val rows = Quality.benfordAudit(spark, sf).collect()
    val nOrders = Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getLong(1)).sum === nOrders)
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum <= 1000000L && obsSum > 1000000L - 9) // floor-div slack
    rows.foreach { r =>
      assert(r.getLong(4) === math.abs(r.getLong(2) - r.getLong(3)))
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 9)
    }
  }

  test("q186 streamOhlcBars: drained stream equals the batch bar table") {
    val stream = graft.streaming.StreamOps.streamOhlcBars(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    val batch = Temporal.ohlcBars(spark, sf).collect()
      .map(r => (r.getTimestamp(1).getTime, r.getString(0)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    assert(stream === batch)
  }

  test("q185 hotKeys: l_orderkey row equals driver-side counts") {
    val row = Quality.hotKeys(spark, sf).collect()
      .find(_.getString(0) == "l_orderkey").get
    val counts = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    assert(row.getLong(1) === n)
    assert(row.getLong(2) === counts.length.toLong)
    val topN = counts.map(_._2).max
    assert(row.getLong(4) === topN)
    // deterministic tiebreak: hottest count, then smallest key
    assert(row.getLong(3) === counts.filter(_._2 == topN).map(_._1).min)
    assert(row.getLong(5) === topN * 1000000L / n)
    val hhi = counts.map(c => BigInt(c._2) * BigInt(c._2)).sum * 1000000 /
      (BigInt(n) * BigInt(n))
    assert(row.getLong(6) === hhi.toLong)
  }

  test("q273/q274: profiling discovers the TPC-H key FDs and FK INDs") {
    val fd = Quality.fdDiscovery(spark, sf).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs")) -> r.getAs[Boolean]("holds")).toMap
    // key-determined FDs must hold by construction
    assert(fd(("customer", "c_custkey", "c_nationkey")))
    assert(fd(("orders", "o_orderkey", "o_custkey")))
    assert(fd(("nation", "n_nationkey", "n_regionkey")))
    // a customer placing orders of different priorities breaks the
    // false candidate (guaranteed at every sf by order volume)
    assert(!fd(("orders", "o_custkey", "o_orderpriority")),
      "o_custkey -> o_orderpriority should not hold")

    val ind = Quality.indDiscovery(spark, sf).collect()
      .map(r => r.getAs[String]("candidate") ->
        (r.getAs[Long]("n_missing"), r.getAs[Boolean]("holds"))).toMap
    // the FK web holds
    assert(ind("orders.o_custkey<customer.c_custkey")._2)
    assert(ind("lineitem.l_orderkey<orders.o_orderkey")._2)
    assert(ind("customer.c_nationkey<nation.n_nationkey")._2)
    assert(ind("nation.n_regionkey<region.r_regionkey")._2)
    // the reverse direction counts exactly the order-less customers
    val custNoOrders = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").distinct().count()
    assert(ind("customer.c_custkey<orders.o_custkey")._1 === custNoOrders)
  }

  test("q282 order dependencies: planted violations counted per candidate") {
    import spark.implicits._
    // order 1: price dips at line 2 (1 violation); qty/date sorted.
    // order 2: date goes backwards and qty drops (1 violation each);
    //          price sorted.
    // order 3: two rows share linenumber 1 — the canonical tiebreak
    //          orders them by the compared columns, so neither pair
    //          direction can register a violation.
    val rows = Seq(
      (1L, 1, "2024-01-01", 10.0, 1.0),
      (1L, 2, "2024-01-02", 5.0, 2.0),
      (1L, 3, "2024-01-03", 7.0, 3.0),
      (2L, 1, "2024-02-05", 3.0, 5.0),
      (2L, 2, "2024-02-01", 4.0, 2.0),
      (3L, 1, "2024-03-01", 9.0, 1.0),
      (3L, 1, "2024-03-01", 5.0, 1.0)
    ).toDF("l_orderkey", "l_linenumber", "l_shipdate",
      "l_extendedprice", "l_quantity")
    val got = Quality.odOf(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("linenumber->extendedprice") === ((4L, 1L, 1L)))
    assert(got("linenumber->quantity") === ((4L, 1L, 1L)))
    assert(got("linenumber->shipdate") === ((4L, 1L, 1L)))
  }

  test("q288 g3: minimal repair count, not violating-row count") {
    import spark.implicits._
    // l=1 maps to a,a,a,b: ONE deletion repairs it (the naive
    // "rows in violating groups" answer would say 4); l=2 is clean.
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"),
      (2L, "c"), (2L, "c")).toDF("l", "r0")
    val r = Quality.g3Of(rows, "t.l->r0").head()
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("g3") === 1L)
    assert(r.getAs[Long]("g3_ppm") === 166666L)
    // an exact FD scores zero
    val clean = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("l", "r0")
    assert(Quality.g3Of(clean, "x").head().getAs[Long]("g3") === 0L)
  }
}
