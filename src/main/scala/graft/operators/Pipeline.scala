package graft.operators

import graft.Tables
import graft.functions.Ranking
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-pipeline operators (q91-q95): distributed global ranking /
  * NTILE, fixed-width histograms, data-contract expectation suites,
  * incremental (partial re-aggregation) rollups, and CDC last-wins
  * apply — the maintenance half of a production lakehouse, each with a
  * cross-engine oracle.
  */
object Pipeline {

  // ---- q91: decile stats via DISTRIBUTED global ranking ---------------
  // `NTILE(k) OVER (ORDER BY ...)` with no PARTITION BY runs on ONE
  // partition in Spark — the whole table through a single task. The
  // scalable form (functions/Ranking.scala): range-repartition on the
  // sort key, rank within partitions in parallel, add per-partition
  // prefix offsets (driver sees one count per partition), then compute
  // the NTILE bucket arithmetically from the global row number. The
  // oracle is the definitional single-window NTILE.
  def decileStats(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    // n comes back with the ranking (it's on the driver from the
    // per-partition count pass) — no second execution of the pipeline
    val (ranked, n) = Ranking.globalRowNumberWithCount(
      orders, Seq("o_totalprice", "o_orderkey"))
    ranked
      .withColumn("decile", Ranking.ntileFromRowNumber(col("rn"), n, 10))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy("decile")
  }

  val decileStatsSql: String =
    """WITH r AS (SELECT o_totalprice,
      |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile FROM orders)
      |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q92: fixed-width histogram (integer cent math) -----------------
  // Bin assignment goes through exact decimal cents, never double
  // division: CAST to DECIMAL(18,2) is exact for money-typed data, *100
  // stays decimal, the BIGINT conversion is integral, and `div` is
  // integer division in both engines — so bin edges cannot drift by an
  // ulp between engines (double-divide-then-floor can).
  private val BinCents = 5000000L // $50,000 per bin

  def priceHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bin",
        expr(s"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div $BinCents"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo_dollars", col("bin") * lit(BinCents / 100L))
      .orderBy("bin")

  val priceHistogramSql: String =
    s"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // $BinCents AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // $BinCents
       |       * ${BinCents / 100L} AS BIGINT) AS bin_lo_dollars
       |FROM orders GROUP BY 1, 3 ORDER BY 1""".stripMargin

  // ---- q93: data-contract expectation suite ---------------------------
  // dbt-test-style contract checks as ONE declarative union of bounded
  // aggregates — each check is a single pass over its table (the FK
  // check is a left-anti join), and the result is one row per check, so
  // the operator's output is bounded by the contract size, not the data.
  def expectationSuite(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def check(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check"), col("violations"))
    val checks = Seq(
      check("accepted_values_l_returnflag",
        li.filter(!col("l_returnflag").isin("A", "N", "R"))),
      check("fk_orders_customer",
        orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")),
      check("not_null_c_name", cust.filter(col("c_name").isNull)),
      check("range_l_discount",
        li.filter(col("l_discount") < 0.0 || col("l_discount") > 1.0)),
      check("unique_o_orderkey",
        orders.groupBy("o_orderkey").count().filter(col("count") > 1)))
    checks.reduce(_ unionByName _).orderBy("check")
  }

  val expectationSuiteSql: String =
    """SELECT 'accepted_values_l_returnflag' AS "check",
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R')) AS BIGINT) AS violations
      |UNION ALL SELECT 'fk_orders_customer',
      |  CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      |UNION ALL SELECT 'not_null_c_name',
      |  CAST((SELECT COUNT(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
      |UNION ALL SELECT 'range_l_discount',
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 1.0) AS BIGINT)
      |UNION ALL SELECT 'unique_o_orderkey',
      |  CAST((SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)
      |ORDER BY "check"""".stripMargin

  // ---- q94: incremental aggregate merge (partial re-aggregation) ------
  // Materialized-view maintenance shape: two independently-computed
  // partial rollups (here: even/odd order-key shards — in production,
  // yesterday's materialized state + today's delta) merge by
  // re-aggregating the partials. COUNT merges as SUM, decimal SUM
  // merges as SUM — both commutative, so the merged view is exactly the
  // direct aggregate, which is the oracle. The merge input is day-grain
  // partials, never raw facts.
  def incrementalDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
    partial(li.filter(col("l_orderkey") % 2 === 0))
      .unionByName(partial(li.filter(col("l_orderkey") % 2 === 1)))
      .groupBy("day")
      .agg(sum("n").as("n"), sum("rev").as("rev"))
      .select(col("day"), col("n"), col("rev").cast("double").as("revenue"))
      .orderBy("day")
  }

  val incrementalDailyMergeSql: String =
    """SELECT CAST(l_shipdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q95: CDC apply (last-wins upsert/delete merge) -----------------
  // The MERGE half of a CDC pipeline: a change stream of upserts and
  // deletes collapses to final table state by keeping each key's LAST
  // change (one per-key window — one shuffle on the key) and dropping
  // keys whose last op is a delete. The change stream is derived
  // deterministically from lineitem ((seq, val, op) descending breaks
  // the synthetic data's duplicate (key, seq) ties, so "last" is
  // well-defined in both engines).
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val ch = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("key"),
      col("l_linenumber").as("seq"),
      when(col("l_returnflag") === "R", lit("D")).otherwise(lit("U")).as("op"),
      col("l_extendedprice").cast("decimal(18,4)").as("val"))
    val w = Window.partitionBy("key")
      .orderBy(col("seq").desc, col("val").desc, col("op").desc)
    ch.withColumn("rrn", row_number().over(w))
      .filter(col("rrn") === 1 && col("op") === "U")
      .agg(
        count(lit(1)).as("n_live"),
        sum("val").cast("double").as("total_value"))
  }

  val cdcApplySql: String =
    """WITH ch AS (
      |  SELECT l_orderkey AS key, l_linenumber AS seq,
      |         CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
      |         CAST(l_extendedprice AS DECIMAL(18,4)) AS val
      |  FROM lineitem),
      |last AS (
      |  SELECT op, val,
      |         ROW_NUMBER() OVER (PARTITION BY key
      |                            ORDER BY seq DESC, val DESC, op DESC) AS rrn
      |  FROM ch)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_live,
      |  CAST(SUM(val) AS DOUBLE) AS total_value
      |FROM last WHERE rrn = 1 AND op = 'U'""".stripMargin

  // ---- q102: IQR outlier trim (Tukey fences, exact arithmetic) --------
  // Statistical cleaning for the curation pipeline: per-order totals
  // outside [q1 - 1.5*IQR, q3 + 1.5*IQR] are trimmed. The metric is an
  // integer (summed floored quantities), its quartiles are dyadic-exact
  // (q84's argument), and 1.5*IQR over dyadic quartiles is still dyadic
  // — every comparison is exact in both engines. The fences are driver
  // scalars (two bounded aggregates, the q1 bound-attachment pattern),
  // so the final pass is one scan with pushable predicates.
  def iqrTrim(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(
        sum(floor(col("l_quantity")).cast("long")).as("tq"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
      .localCheckpoint(true) // consumed by the fence agg AND the trim pass
    val qs = t.agg(expr("percentile(tq, array(0.25D, 0.75D))").as("qs"))
      .select(
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("q3"))
      .head()
    // empty input -> empty frame (the percentile row is null; getDouble
    // would NPE on the driver)
    if (qs.isNullAt(0))
      return t.agg(count(lit(1)).as("n_kept"), count(lit(1)).as("n_trimmed"),
        lit(null).cast("double").as("kept_revenue")).limit(0)
    val (q1, q3) = (qs.getDouble(0), qs.getDouble(1))
    val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
    val kept = col("tq") >= lo && col("tq") <= hi
    t.agg(
      sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
      sum(when(kept, 0L).otherwise(1L)).as("n_trimmed"),
      sum(when(kept, col("rev"))).cast("double").as("kept_revenue"))
  }

  val iqrTrimSql: String =
    """WITH t AS (
      |  SELECT l_orderkey, CAST(SUM(floor(l_quantity)) AS BIGINT) AS tq,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      |  FROM lineitem GROUP BY 1),
      |q AS (SELECT quantile_cont(tq, 0.25) AS q1, quantile_cont(tq, 0.75) AS q3 FROM t),
      |b AS (SELECT q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
      |SELECT
      |  CAST(SUM(CASE WHEN tq BETWEEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN tq BETWEEN lo AND hi THEN 0 ELSE 1 END) AS BIGINT) AS n_trimmed,
      |  CAST(SUM(CASE WHEN tq BETWEEN lo AND hi THEN rev END) AS DOUBLE) AS kept_revenue
      |FROM t, b""".stripMargin

  // ---- q103: table diff / reconciliation (snapshot compare) -----------
  // The regression-testing primitive for pipeline migrations: two
  // versions of a keyed table -> added / removed / changed / unchanged
  // counts in ONE full-outer hash join on the key (never a row-by-row
  // driver compare). Versions are derived deterministically from orders
  // so both engines see identical inputs.
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val v1 = o.filter(col("o_orderkey") % 100 =!= 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val v2 = o.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit("9-CHANGED"))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"),
        col("o_totalprice"))
    val j = v1.as("a").join(v2.as("b"),
      col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
    val both = col("a.o_orderkey").isNotNull && col("b.o_orderkey").isNotNull
    val same = col("a.o_orderpriority") === col("b.o_orderpriority") &&
      col("a.o_totalprice") === col("b.o_totalprice")
    j.agg(
      sum(when(col("a.o_orderkey").isNull, 1L).otherwise(0L)).as("n_added"),
      sum(when(col("b.o_orderkey").isNull, 1L).otherwise(0L)).as("n_removed"),
      sum(when(both && !same, 1L).otherwise(0L)).as("n_changed"),
      sum(when(both && same, 1L).otherwise(0L)).as("n_unchanged"))
  }

  val tableDiffSql: String =
    """WITH v1 AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      |            WHERE o_orderkey % 100 <> 0),
      |v2 AS (SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 0 THEN '9-CHANGED'
      |              ELSE o_orderpriority END AS o_orderpriority,
      |         o_totalprice
      |       FROM orders WHERE o_orderkey % 97 <> 0)
      |SELECT
      |  CAST(SUM(CASE WHEN v1.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(SUM(CASE WHEN v2.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
      |       AND (v1.o_orderpriority <> v2.o_orderpriority
      |            OR v1.o_totalprice <> v2.o_totalprice)
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
      |       AND v1.o_orderpriority = v2.o_orderpriority
      |       AND v1.o_totalprice = v2.o_totalprice
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey""".stripMargin

  // ---- q151: anti-entropy partition diff (re-sync planner) -----------
  // q103 answers "which ROWS changed"; at 100 TB you first need "which
  // PARTITIONS changed" — the Merkle-style anti-entropy pass a
  // replication/sync job runs so only dirty partitions pay the
  // row-level diff or re-copy. One map-side-combinable fingerprint
  // aggregate per version — (count, bit_xor of a canonical row hash)
  // per month partition, the q132 channel — then a partition-count-
  // sized full-outer join. The row hash renders doubles through the
  // cents channel (round(x*100) -> BIGINT: identical IEEE product and
  // half-up rounding on positive prices in both engines) so no float
  // ever reaches a string.
  //
  // Versions derive deterministically from orders: v2 drops every
  // 997th key and rewrites priority on every 499th — so SOME months
  // differ and most don't, which is exactly the selectivity the
  // planner exploits. Output: the non-identical partitions only.
  def partitionDiff(spark: SparkSession, dir: String): DataFrame = {
    def fp(df: DataFrame): DataFrame = {
      val cents = round(col("o_totalprice") * 100).cast("long")
      // the separator is the ESCAPED \u0001 — matching the oracle's
      // chr(1) channel — written as an escape (not a raw control byte,
      // which is invisible in most viewers and was misread as "" in a
      // past review)
      val repr = concat_ws("\u0001", col("o_orderkey").cast("string"),
        col("o_orderpriority"), cents.cast("string"))
      val h = conv(substring(md5(repr.cast("binary")), 1, 15), 16, 10)
        .cast("long")
      df.select(date_format(col("o_orderdate"), "yyyy-MM").as("sale_month"),
          h.as("h"))
        .groupBy("sale_month")
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("sig"))
    }
    val o = Tables.orders(spark, dir)
    val v1 = fp(o)
    val v2 = fp(o.filter(col("o_orderkey") % 997 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 499 === 0, lit("9-CHANGED"))
          .otherwise(col("o_orderpriority"))))
    v1.as("a").join(v2.as("b"),
        col("a.sale_month") === col("b.sale_month"), "full_outer")
      .select(
        coalesce(col("a.sale_month"), col("b.sale_month")).as("sale_month"),
        when(col("a.sale_month").isNull, "only_v2")
          .when(col("b.sale_month").isNull, "only_v1")
          .when(col("a.n") === col("b.n") && col("a.sig") === col("b.sig"),
            "same")
          .otherwise("changed").as("status"),
        col("a.n").as("n_v1"), col("b.n").as("n_v2"))
      .filter(col("status") =!= "same")
      .orderBy("sale_month")
  }

  val partitionDiffSql: String =
    """WITH fp1 AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS sale_month, COUNT(*) AS n,
      |    bit_xor(CAST('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || chr(1) || o_orderpriority || chr(1)
      |      || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
      |    ), 1, 15) AS BIGINT)) AS sig
      |  FROM orders GROUP BY 1),
      |v2 AS (SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 499 = 0 THEN '9-CHANGED'
      |              ELSE o_orderpriority END AS o_orderpriority,
      |         o_totalprice, o_orderdate
      |       FROM orders WHERE o_orderkey % 997 <> 0),
      |fp2 AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS sale_month, COUNT(*) AS n,
      |    bit_xor(CAST('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || chr(1) || o_orderpriority || chr(1)
      |      || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
      |    ), 1, 15) AS BIGINT)) AS sig
      |  FROM v2 GROUP BY 1)
      |SELECT * FROM (
      |  SELECT COALESCE(fp1.sale_month, fp2.sale_month) AS sale_month,
      |    CASE WHEN fp1.sale_month IS NULL THEN 'only_v2'
      |         WHEN fp2.sale_month IS NULL THEN 'only_v1'
      |         WHEN fp1.n = fp2.n AND fp1.sig = fp2.sig THEN 'same'
      |         ELSE 'changed' END AS status,
      |    fp1.n AS n_v1, fp2.n AS n_v2
      |  FROM fp1 FULL OUTER JOIN fp2 ON fp1.sale_month = fp2.sale_month) d
      |WHERE status <> 'same' ORDER BY sale_month""".stripMargin

  // ---- q120: MAD outlier detection (robust statistics) ---------------
  // Median absolute deviation: the robust spread measure IQR fences
  // approximate — unlike stdev it ignores the outliers it is hunting.
  // Exactness chain: the metric (per-order total quantity) is INTEGER;
  // its dyadic median is k/2-exact; |x - med| is then k/2-exact; the
  // median of those is k/4-exact; and the 2.5x threshold multiplies by
  // 5/2 — every value in the pipeline is exactly representable, so the
  // outlier SET is engine-identical. Same two-driver-scalar shape as
  // iqrTrim (bounded aggregates -> pushable final predicate).
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(floor(col("l_quantity")).cast("long")).as("tq"))
      .localCheckpoint(true) // consumed by 2 threshold aggs + final pass
    val medRow = t.agg(expr("percentile(tq, 0.5D)")).head()
    // empty input -> the same 1-row shape SQL aggregation gives (count
    // 0, NULL sum/med/mad), not a driver NPE on the null percentile
    if (medRow.isNullAt(0))
      return t.agg(count(lit(1)).as("n_orders"),
        lit(null).cast("long").as("n_outliers"),
        lit(null).cast("double").as("med"),
        lit(null).cast("double").as("mad"))
    val med = medRow.getDouble(0)
    val dev = abs(col("tq") - lit(med))
    val mad = t.agg(expr(s"percentile(abs(tq - ${med}D), 0.5D)"))
      .head().getDouble(0)
    t.agg(
      count(lit(1)).as("n_orders"),
      sum(when(dev > lit(2.5) * lit(mad), 1L).otherwise(0L)).as("n_outliers"),
      lit(med).as("med"),
      lit(mad).as("mad"))
  }

  val madOutliersSql: String =
    """WITH t AS (
      |  SELECT l_orderkey, CAST(SUM(floor(l_quantity)) AS BIGINT) AS tq
      |  FROM lineitem GROUP BY 1),
      |m AS (SELECT quantile_cont(tq, 0.5) AS med FROM t),
      |d AS (SELECT abs(tq - med) AS dev FROM t, m),
      |md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
      |SELECT COUNT(*) AS n_orders,
      |       CAST(SUM(CASE WHEN dev > 2.5 * mad THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_outliers,
      |       (SELECT med FROM m) AS med,
      |       (SELECT mad FROM md) AS mad
      |FROM d, md""".stripMargin

  // ---- q121: exact sufficient statistics (distributed moments) -------
  // The one-pass, map-side-combinable sufficient statistics every
  // downstream regression/correlation needs: n, Σx, Σy, Σxy, Σx², Σy²
  // per group — INTEGER-EXACT, which is the only way moment sums
  // hash-match across engines (float Σxy depends on addition order).
  // x = integral quantity (<= 50), y = whole-dollar price (<= ~10^5):
  // Σy² <= 10^10 per row * ~10^7 rows stays under 2^63 through ~sf100;
  // past that the same sums go DECIMAL(38,0) — exactness survives, only
  // the output type widens. Downstream: var/cov/corr/OLS slope are
  // driver arithmetic on these six numbers.
  def sufficientStats(spark: SparkSession, dir: String): DataFrame = {
    val xy = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      floor(col("l_quantity")).cast("long").as("x"),
      floor(col("l_extendedprice") / 100.0).cast("long").as("y"))
    xy.groupBy("flag")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .orderBy("flag")
  }

  val sufficientStatsSql: String =
    """WITH t AS (
      |  SELECT l_returnflag AS flag,
      |         CAST(floor(l_quantity) AS BIGINT) AS x,
      |         CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS y
      |  FROM lineitem)
      |SELECT flag, COUNT(*) AS n,
      |       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |       CAST(SUM(x * y) AS BIGINT) AS sxy,
      |       CAST(SUM(x * x) AS BIGINT) AS sx2,
      |       CAST(SUM(y * y) AS BIGINT) AS sy2
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_decile_stats"    -> (decileStats _),
    "q92_price_histogram" -> (priceHistogram _),
    "q93_expectations"    -> (expectationSuite _),
    "q94_incremental_agg" -> (incrementalDailyMerge _),
    "q95_cdc_apply"       -> (cdcApply _),
    "q102_iqr_trim"       -> (iqrTrim _),
    "q103_table_diff"     -> (tableDiff _),
    "q151_partition_diff" -> (partitionDiff _),
    "q120_mad_outliers"   -> (madOutliers _),
    "q121_sufficient_stats" -> (sufficientStats _))

  val oracles: Map[String, String] = Map(
    "q91_decile_stats"    -> decileStatsSql,
    "q92_price_histogram" -> priceHistogramSql,
    "q93_expectations"    -> expectationSuiteSql,
    "q94_incremental_agg" -> incrementalDailyMergeSql,
    "q95_cdc_apply"       -> cdcApplySql,
    "q102_iqr_trim"       -> iqrTrimSql,
    "q103_table_diff"     -> tableDiffSql,
    "q151_partition_diff" -> partitionDiffSql,
    "q120_mad_outliers"   -> madOutliersSql,
    "q121_sufficient_stats" -> sufficientStatsSql)
}
