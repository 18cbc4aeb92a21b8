package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal / ordered-data analytics plus record-linkage and privacy
  * audits (q84-q89) — beyond-parity operators a training-data or
  * warehouse pipeline needs that the reference has no analog for.
  *
  * Scale notes, per operator:
  *  - Every windowed form here runs over a PRE-AGGREGATED frame (one
  *    row per day / per change event), never over the raw fact table:
  *    the only full-data pass is a grouped aggregation that shuffles
  *    once on its key and combines map-side. The unpartitioned window
  *    that follows sees |days| or |changes-per-entity| rows, not |facts|.
  *  - The edit-distance join never goes quadratic: deletion-neighborhood
  *    keys (FastSS / SymSpell family, public literature) make candidate
  *    generation an equality join, with an exact `levenshtein` verify.
  */
object Temporal {

  // ---- q84: exact percentiles (quartiles) per group -------------------
  // Spark's exact `percentile` aggregates counts per DISTINCT value, so
  // executor memory is O(distinct), not O(rows) — safe for bounded-
  // cardinality metrics like quantities; unbounded-cardinality columns
  // take approx_percentile (a sketch, spec-only since no cross-engine
  // hash can match). The p-values are dyadic (1/4, 1/2, 3/4) and the
  // input is floored to integral doubles, so the linear interpolation
  // `lo + (hi-lo)*frac` is exact in binary in both engines — this is
  // what makes a cross-engine hash match possible at all.
  def quartiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(floor(l_quantity), array(0.25D, 0.5D, 0.75D))").as("qs"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        element_at(col("qs"), 1).as("p25"),
        element_at(col("qs"), 2).as("p50"),
        element_at(col("qs"), 3).as("p75"),
        col("n"))
      .orderBy("l_returnflag")

  val quartilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(floor(l_quantity), 0.25) AS p25,
      |  quantile_cont(floor(l_quantity), 0.50) AS p50,
      |  quantile_cont(floor(l_quantity), 0.75) AS p75,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q85: time-series gap fill (calendar densification) -------------
  // Sparse per-day aggregate -> dense daily series with explicit zero
  // rows. The calendar dimension is generated from the aggregate's own
  // min/max (driver scalars -> a few-row exploded sequence), so the
  // left join is a broadcast of the TINY side against the already-
  // aggregated daily frame; the raw events table is scanned exactly
  // once, by the grouped aggregation.
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("user_id") % 97 === 0)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    val cal = daily.agg(min("day").as("mn"), max("day").as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    cal.join(daily, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("day")
  }

  val gapFillDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |  FROM events WHERE event_type = 'purchase' AND user_id % 97 = 0 GROUP BY 1),
      |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
      |cal AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
      |        FROM bounds)
      |SELECT cal.day AS day, COALESCE(n, 0) AS n, COALESCE(total_value, 0.0) AS total_value
      |FROM cal LEFT JOIN daily ON cal.day = daily.day ORDER BY 1""".stripMargin

  // ---- q86: rolling 7-day revenue (RANGE window over day numbers) -----
  // The raw fact table collapses to one row per day FIRST (one map-side-
  // combined shuffle); the rolling window then runs over |days| rows —
  // a frame bounded by the calendar, not the data volume, so the
  // unpartitioned window is deliberate and safe at any scale. Ordering
  // by an integer day number makes the frame a true RANGE (value) frame:
  // missing days do NOT contribute phantom rows, matching the SQL
  // definition of "trailing 7 calendar days".
  def rollingRevenue7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val w = Window.orderBy("day_num").rangeBetween(-6, 0)
    daily.select(
        col("day"),
        col("rev").cast("double").as("revenue"),
        sum(col("rev")).over(w).cast("double").as("rolling_7d"))
      .orderBy("day")
  }

  val rollingRevenue7dSql: String =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day_num,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT day, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(SUM(rev) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |       AS DOUBLE) AS rolling_7d
      |FROM daily ORDER BY 1""".stripMargin

  // ---- q87: SCD2 change-history construction --------------------------
  // Builds a slowly-changing-dimension type-2 table from an ordered
  // attribute stream: run-length encode consecutive equal values (lag),
  // then stitch validity intervals (lead). Both windows partition by the
  // entity key — one key shuffle, per-entity frames stay small. The
  // (o_orderdate, o_orderkey) composite sort makes same-day changes
  // deterministic in both engines.
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val h = Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
      .withColumn("prev", lag("o_orderpriority", 1).over(w))
      .withColumn("rn", row_number().over(w))
    val w2 = Window.partitionBy("o_custkey").orderBy("rn")
    h.filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      .select(
        col("o_custkey").as("custkey"),
        row_number().over(w2).cast("long").as("version"),
        col("o_orderpriority").as("priority"),
        col("d").as("valid_from"),
        lead(col("d"), 1).over(w2).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("custkey", "version")
  }

  val scd2HistorySql: String =
    """WITH h AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderpriority,
      |         lag(o_orderpriority) OVER w AS prev,
      |         ROW_NUMBER() OVER w AS rn
      |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |chg AS (
      |  SELECT o_custkey, o_orderpriority, d AS valid_from, rn,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY rn) AS version,
      |         lead(d) OVER (PARTITION BY o_custkey ORDER BY rn) AS valid_to
      |  FROM h WHERE prev IS NULL OR prev <> o_orderpriority)
      |SELECT o_custkey AS custkey, CAST(version AS BIGINT) AS version,
      |       o_orderpriority AS priority, valid_from, valid_to,
      |       valid_to IS NULL AS is_current
      |FROM chg ORDER BY 1, 2""".stripMargin

  // ---- q88: edit-distance<=1 join via deletion neighborhoods ----------
  // Variable-length fuzzy join (vs q69's fixed-width pigeonhole keys).
  // Candidate keys are the string itself plus every single-character
  // deletion (FastSS / SymSpell, public literature): two strings within
  // edit distance 1 ALWAYS share a key (substitution -> same-position
  // deletions collide; insert/delete -> the shorter string IS a deletion
  // of the longer), so recall is exact; an explicit `levenshtein <= 1`
  // verify removes the false positives (e.g. transpositions). Per-row
  // fan-out is len+1 keys and the join is pure equality — linear
  // candidates where the oracle's definitional form is the full
  // quadratic self-join.
  def edit1NamePairs(spark: SparkSession, dir: String): DataFrame = {
    val variants = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        explode(array_union(
          array(col("c_name")),
          expr("transform(sequence(0, length(c_name) - 1)," +
            " i -> concat(substr(c_name, 1, i), substr(c_name, i + 2)))"))).as("key"))
    val a = variants.select(
      col("c_custkey").as("custkey_a"), col("c_name").as("name_a"), col("key"))
    val b = variants.select(
      col("c_custkey").as("custkey_b"), col("c_name").as("name_b"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("custkey_a") < col("custkey_b"))
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select("custkey_a", "custkey_b")
      .distinct()
      .orderBy("custkey_a", "custkey_b")
  }

  val edit1NamePairsSql: String =
    """SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY 1, 2""".stripMargin

  // ---- q292: sorted-neighborhood blocking (ER candidate strategy) ----
  // Hernández & Stolfo's merge/purge blocking (SIGMOD'95, public
  // literature): sort by a fuzzy key, compare only rows within a
  // sliding window of w positions — the OTHER classic blocking family
  // next to q86's deletion-neighborhood keys and q228's token blocks.
  // Its selling point is similarity-function independence: the window
  // bounds candidates at n·w regardless of what the verify step is.
  // Window w = 3 over (c_name, c_custkey) order, exact
  // levenshtein <= 1 verify; pairs normalized to (least, greatest).
  //
  // Shape at scale: the global sort is the DISTRIBUTED range-partition
  // ranker (no single-partition window); the "within w positions" join
  // is an explode of exactly w probe ranks + ONE hash equi-join — a
  // rank-range condition written as an inequality join would be a
  // broadcast-nested-loop bomb.
  private val SnWindow = 3

  def sortedNeighborPairs(spark: SparkSession, dir: String): DataFrame =
    sortedNeighborsOf(Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_name").as("name")))

  /** Blocking core over a (key, name) frame — factored so the spec can
    * plant twins just inside and just outside the window. */
  private[graft] def sortedNeighborsOf(rows: DataFrame): DataFrame = {
    val ranked = graft.functions.Ranking
      .globalRowNumberSorted(rows, Seq(asc("name"), asc("key")), "rn")
      .localCheckpoint(true) // probe fan-out + build side
    val probes = ranked.select(col("key").as("key_a"),
        col("name").as("name_a"),
        explode(expr(s"sequence(rn + 1, rn + $SnWindow)")).as("rn"))
    probes.join(ranked.select(col("rn"), col("key").as("key_b"),
        col("name").as("name_b")), "rn")
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(least(col("key_a"), col("key_b")).as("custkey_a"),
        greatest(col("key_a"), col("key_b")).as("custkey_b"))
      .orderBy("custkey_a", "custkey_b")
  }

  val sortedNeighborPairsSql: String =
    s"""WITH r AS (SELECT c_custkey AS key, c_name AS name,
       |             row_number() OVER (ORDER BY c_name, c_custkey) AS rn
       |           FROM customer)
       |SELECT LEAST(a.key, b.key) AS custkey_a,
       |       GREATEST(a.key, b.key) AS custkey_b
       |FROM r a JOIN r b
       |  ON b.rn BETWEEN a.rn + 1 AND a.rn + $SnWindow
       | AND levenshtein(a.name, b.name) <= 1
       |ORDER BY 1, 2""".stripMargin

  // ---- q307: prefix-compression estimate (sorted-key LCP audit) ------
  // How many bytes would prefix compression save if this column were a
  // sort key? — the SSTable/parquet-delta-encoding sizing question.
  // For each key in global sort order, the longest common prefix with
  // its PREDECESSOR is exactly what delta encoding elides; the audit
  // reports total key bytes, elidable bytes and the ratio. LCP is
  // computed cross-engine-exactly as Σ_k [prefix_k(a) = prefix_k(b)]
  // over a broadcast position dim (prefix equality is monotone, so the
  // count IS the LCP — no char-loop UDF).
  //
  // Shape at scale: the global sort is the range-partition ranker;
  // adjacent pairs are ONE equality join on rank+1; the position
  // fan-out is bounded by the max key length (a broadcast dim).
  def prefixCompression(spark: SparkSession, dir: String): DataFrame =
    prefixCompressionOf(Tables.customer(spark, dir)
      .select(col("c_name").as("name")))

  /** Audit core over a (name) frame — factored so the spec can plant
    * keys with hand-counted common prefixes. */
  private[graft] def prefixCompressionOf(rows: DataFrame): DataFrame = {
    val ranked = graft.functions.Ranking
      .globalRowNumberSorted(rows.select("name"), Seq(asc("name")), "rn")
      .localCheckpoint(true) // both sides of the adjacency join
    val pairs = ranked.select(col("name").as("a"), (col("rn") + 1L).as("rn"))
      .join(ranked.select(col("rn"), col("name").as("b")), "rn")
    val maxLen = 64 // position dim bound; c_name-style keys are short
    val lcp = pairs
      .select(col("a"), col("b"), explode(expr(s"sequence(1, $maxLen)")).as("k"))
      .filter(col("k") <= least(length(col("a")), length(col("b"))) &&
        expr("substring(a, 1, k) = substring(b, 1, k)"))
      .groupBy().agg(count(lit(1)).as("saved_bytes"))
    val tot = ranked.groupBy().agg(count(lit(1)).as("n_keys"),
      sum(length(col("name")).cast("long")).as("total_bytes"))
    tot.crossJoin(broadcast(lcp))
      .select(col("n_keys"), col("total_bytes"), col("saved_bytes"),
        expr("saved_bytes * 1000000 div total_bytes").as("saved_ppm"))
  }

  val prefixCompressionSql: String =
    """WITH r AS (SELECT c_name AS name,
      |             row_number() OVER (ORDER BY c_name) AS rn
      |           FROM customer),
      |p AS (SELECT a.name AS a, b.name AS b
      |      FROM r a JOIN r b ON b.rn = a.rn + 1),
      |l AS (SELECT COUNT(*) AS saved_bytes
      |      FROM p, (SELECT unnest(generate_series(1, 64)) AS k) ks
      |      WHERE k <= LEAST(len(a), len(b))
      |        AND substr(a, 1, k) = substr(b, 1, k)),
      |t AS (SELECT COUNT(*) AS n_keys, SUM(len(name)) AS total_bytes
      |      FROM r)
      |SELECT CAST(n_keys AS BIGINT) AS n_keys,
      |       CAST(total_bytes AS BIGINT) AS total_bytes,
      |       CAST(saved_bytes AS BIGINT) AS saved_bytes,
      |       CAST(saved_bytes * 1000000 // total_bytes AS BIGINT)
      |         AS saved_ppm
      |FROM t, l""".stripMargin

  // ---- q89: k-anonymity audit over quasi-identifiers ------------------
  // Privacy-side complement to the PII redaction lane (q55): how many
  // quasi-identifier groups are small enough to re-identify. One grouped
  // count then a driver-sized summary aggregate — the group count is
  // bounded by the quasi-identifier domain, not the row count.
  val KAnonThreshold = 12

  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < KAnonThreshold, 1L).otherwise(0L)).as("n_small_groups"),
        sum(when(col("n") < KAnonThreshold, col("n")).otherwise(0L)).as("rows_at_risk"),
        min("n").as("min_group_size"))

  val kAnonymityAuditSql: String =
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1, 2)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(CASE WHEN n < $KAnonThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
       |  CAST(SUM(CASE WHEN n < $KAnonThreshold THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |  CAST(MIN(n) AS BIGINT) AS min_group_size
       |FROM g""".stripMargin

  // ---- q264: l-diversity histogram over quasi-identifier groups -------
  // k-anonymity (q89) counts group SIZES; a group can be large yet
  // leak everything if all its members share one sensitive value.
  // Distinct l-diversity audits that: per quasi-identifier group
  // (nation × market segment), l = number of DISTINCT sensitive values
  // (the order priority of the group's orders), reduced to the l →
  // (groups, rows) histogram a privacy review reads. One fact-dim
  // shuffle join, then two aggregates on the QI-domain-bounded frame
  // (the per-(QI, priority) pre-aggregate keeps the distinct count
  // exact without a distinct over raw orders).
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame =
    lDiversityOf(Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("qi1"), col("c_mktsegment").as("qi2"),
        col("o_orderpriority").as("sensitive")))

  /** Core over (qi1, qi2, sensitive) rows — factored so the spec can
    * plant a large-but-zero-diversity group that q89's size audit
    * would wave through. */
  private[graft] def lDiversityOf(t: DataFrame): DataFrame =
    t.groupBy("qi1", "qi2", "sensitive")
      .agg(count(lit(1)).as("n"))
      .groupBy("qi1", "qi2")
      .agg(count(lit(1)).as("l"), sum("n").as("rows"))
      .groupBy("l")
      .agg(count(lit(1)).as("n_groups"), sum("rows").as("n_rows"))
      .orderBy("l")

  val lDiversityAuditSql: String =
    """WITH p AS (
      |  SELECT c_nationkey, c_mktsegment, o_orderpriority, COUNT(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3),
      |g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS l,
      |             SUM(n) AS rows FROM p GROUP BY 1, 2)
      |SELECT CAST(l AS BIGINT) AS l, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |       CAST(SUM(rows) AS BIGINT) AS n_rows
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q269: robust seasonal decomposition (median STL-lite) ----------
  // cnt = trend + seasonal + residual over the daily series, all
  // integer: trend is the CENTERED 7-day rolling lower median
  // (positional pick from the sorted window list — robust to spike
  // days, unlike a rolling mean), seasonal is the per-weekday lower
  // median of the detrended values (q260's integer (day+4) mod 7
  // weekday), residual is the exact remainder. Classical STL runs
  // loess — floats, iterated — this is the median-based variant a
  // monitoring pipeline can hash-verify: both engines materialize the
  // same sorted 7-window and pick the same element, so the
  // decomposition is bit-exact. Edge days see a shrunken window
  // (lower median of 4..6 values), identically in both engines.
  //
  // Shape at scale: one full-data grouped aggregate; every window runs
  // on the |days| frame (pre-aggregated-window pattern).
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame =
    seasonalOf(Tables.events(spark, dir)
      .select(expr("ts_ns div 1000 div 86400000000").as("day")))

  /** Core over (day) observation rows — factored so the spec can plant
    * a pure weekly pattern (residual identically 0) plus one spike the
    * median trend must NOT absorb. */
  private[graft] def seasonalOf(t: DataFrame): DataFrame = {
    val d = t.groupBy("day").agg(count(lit(1)).as("cnt"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = d
      .withColumn("win", sort_array(collect_list("cnt").over(w7)))
      .withColumn("trend",
        element_at(col("win"),
          expr("cast((size(win) + 1) div 2 as int)")))
      .withColumn("detr", col("cnt") - col("trend"))
      .withColumn("dow", pmod(col("day") + 4, lit(7L)))
      .drop("win")
      .localCheckpoint(true) // feeds the seasonal median AND the output
    val seasonal = trended
      .withColumn("rn", row_number().over(
        Window.partitionBy("dow").orderBy(col("detr"), col("day"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("dow")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("dow"), col("detr").as("seasonal"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("cnt"), col("trend"), col("seasonal"),
        (col("cnt") - col("trend") - col("seasonal")).as("residual"))
      .orderBy("day")
  }

  val seasonalDecomposeSql: String =
    """WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |           FROM events),
      |d AS (SELECT day, COUNT(*) AS cnt FROM e GROUP BY 1),
      |t AS (SELECT day, cnt,
      |        list_sort(list(cnt) OVER (ORDER BY day
      |          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS win,
      |        (day + 4) % 7 AS dow
      |      FROM d),
      |tr AS (SELECT day, cnt, dow, win[(len(win) + 1) // 2] AS trend,
      |              cnt - win[(len(win) + 1) // 2] AS detr
      |       FROM t),
      |m AS (SELECT dow, detr AS seasonal FROM
      |        (SELECT dow, detr, day,
      |                ROW_NUMBER() OVER (PARTITION BY dow
      |                  ORDER BY detr, day) AS rn,
      |                COUNT(*) OVER (PARTITION BY dow) AS n FROM tr)
      |      WHERE rn = (n + 1) // 2)
      |SELECT tr.day, CAST(tr.cnt AS BIGINT) AS cnt,
      |       CAST(tr.trend AS BIGINT) AS trend,
      |       CAST(m.seasonal AS BIGINT) AS seasonal,
      |       CAST(tr.cnt - tr.trend - m.seasonal AS BIGINT) AS residual
      |FROM tr JOIN m ON tr.dow = m.dow
      |ORDER BY tr.day""".stripMargin

  // ---- q270: cohort LTV curves (cumulative revenue by cohort age) ----
  // The lifetime-value read beside q203's retention cohorts: customers
  // cohorted by FIRST-ORDER month, each later order binned by age =
  // months since the cohort month, revenue accumulated along age. The
  // month index is pure integer calendar math ((year−1970)·12 +
  // month−1 — no interval arithmetic, no locale), revenue is exact
  // decimal cents, and the running total is a window over the
  // |cohorts × ages| pre-aggregated frame. Active-customer counts are
  // exact distincts per cell.
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      ((year(to_date(col("o_orderdate"))) - 1970) * 12 +
        month(to_date(col("o_orderdate"))) - 1).cast("long").as("m"),
      (col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("decimal(38,0)").as("cents"))
    val first = o.groupBy("o_custkey").agg(min("m").as("cohort"))
    val cells = o.join(first, "o_custkey")
      .withColumn("age", col("m") - col("cohort"))
      .groupBy("cohort", "age")
      .agg(countDistinct("o_custkey").as("n_active"),
        sum("cents").cast("decimal(38,0)").as("cents"))
    cells
      .withColumn("cum_cents",
        sum("cents").over(Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("decimal(38,0)"))
      .select(col("cohort"), col("age"), col("n_active"),
        col("cents").cast("long").as("cents"),
        col("cum_cents").cast("long").as("cum_cents"))
      .orderBy("cohort", "age")
  }

  val cohortLtvSql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    CAST((EXTRACT(year FROM CAST(o_orderdate AS DATE)) - 1970) * 12
      |         + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1
      |         AS BIGINT) AS m,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS HUGEINT)
      |      AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, MIN(m) AS cohort FROM o GROUP BY 1),
      |c AS (SELECT f.cohort, o.m - f.cohort AS age,
      |             COUNT(DISTINCT o.o_custkey) AS n_active,
      |             SUM(o.cents) AS cents
      |      FROM o JOIN f ON o.o_custkey = f.o_custkey
      |      GROUP BY 1, 2)
      |SELECT cohort, age, CAST(n_active AS BIGINT) AS n_active,
      |       CAST(cents AS BIGINT) AS cents,
      |       CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum_cents
      |FROM c ORDER BY cohort, age""".stripMargin

  // ---- q97: anomaly (spike) detection with exact integer arithmetic --
  // Flags days whose event count exceeds 9/8 of the trailing-7-day
  // mean. The comparison `8*n*k > 9*sum` stays in integers — no
  // float mean, so no cross-engine ulp drift and no false boundary
  // flips. Same pre-aggregate-then-window shape as q86: the RANGE
  // frame (7 PRECEDING .. 1 PRECEDING — strictly historical, so a
  // spike never dilutes its own baseline) runs over day-grain rows.
  def spikeDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val w = Window.orderBy("day_num").rangeBetween(-7, -1)
    daily
      .withColumn("prev7", sum("n").over(w))
      .withColumn("prev7_days", count("n").over(w))
      .filter(col("prev7_days") >= 3 &&
        col("n") * lit(8) * col("prev7_days") > lit(9) * col("prev7"))
      .select("day", "n", "prev7", "prev7_days")
      .orderBy("day")
  }

  val spikeDaysSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
      |         COUNT(*) AS n
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      |r AS (
      |  SELECT day, n,
      |         SUM(n) OVER (ORDER BY day_num RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prev7,
      |         COUNT(n) OVER (ORDER BY day_num RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prev7_days
      |  FROM daily)
      |SELECT day, CAST(n AS BIGINT) AS n, CAST(prev7 AS BIGINT) AS prev7,
      |       CAST(prev7_days AS BIGINT) AS prev7_days
      |FROM r WHERE prev7_days >= 3 AND n * 8 * prev7_days > 9 * prev7
      |ORDER BY day""".stripMargin

  // ---- q104: gaps and islands (activity-run analysis) -----------------
  // The classic contiguity pattern: consecutive active days share
  // day_num - row_number(), so islands fall out of one groupBy. Both
  // windows run over the DAY-GRAIN frame (<= |days| rows after the
  // distinct — q86's pre-aggregate-first argument), never the raw
  // events; at 100 TB the only full-data pass is the distinct-day
  // aggregation.
  def gapsAndIslands(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("user_id") % 97 === 0)
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("day_num"))
      .distinct()
    val w = Window.orderBy("day_num")
    val islands = daily
      .withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy("grp")
      .agg(min("day_num").as("s"), max("day_num").as("e"),
        count(lit(1)).as("len"))
    val wI = Window.orderBy("s")
    islands
      .withColumn("gap", col("s") - lag("e", 1).over(wI) - 1)
      .agg(
        count(lit(1)).as("n_islands"),
        max("len").as("longest_island"),
        max("gap").as("longest_gap"))
  }

  val gapsAndIslandsSql: String =
    """WITH daily AS (
      |  SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      |  FROM events WHERE event_type = 'purchase' AND user_id % 97 = 0),
      |r AS (SELECT day_num,
      |        day_num - ROW_NUMBER() OVER (ORDER BY day_num) AS grp FROM daily),
      |isl AS (SELECT grp, MIN(day_num) AS s, MAX(day_num) AS e, COUNT(*) AS len
      |        FROM r GROUP BY 1),
      |g AS (SELECT s - lag(e) OVER (ORDER BY s) - 1 AS gap FROM isl)
      |SELECT CAST((SELECT COUNT(*) FROM isl) AS BIGINT) AS n_islands,
      |       CAST((SELECT MAX(len) FROM isl) AS BIGINT) AS longest_island,
      |       CAST((SELECT MAX(gap) FROM g) AS BIGINT) AS longest_gap""".stripMargin

  // ---- q108: sliding-window COUNT DISTINCT (rolling active users) -----
  // Window functions cannot express COUNT(DISTINCT) over a frame; the
  // scalable form EXPANDS each (day, user) activity fact to the 7
  // window positions it contributes to (explode of a 7-element
  // sequence — a bounded fan-out equal to the window length), then one
  // grouped distinct count per day. Input is the DISTINCT day-grain
  // activity (the only full-data pass); window-length x |active-days|
  // rows feed the final aggregate, never raw events.
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("d"), col("user_id"))
      .distinct()
      .localCheckpoint(true) // consumed by the bounds agg AND the expand
    val b = du.agg(min("d").as("mn"), max("d").as("mx")).head()
    // no activity at all -> empty frame (not a driver NPE on the null
    // bounds row). Output contract is SPARSE: an in-range day whose
    // trailing 7-day window saw no activity emits no row (the DuckDB
    // oracle does the same expansion); left-join q85's gap-fill
    // calendar for a dense zero-filled series.
    if (b.isNullAt(0))
      return du.select(col("d").as("day_num"),
        lit(0L).as("n_users_7d")).limit(0)
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    du.select(explode(expr("sequence(d, d + 6)")).as("day_num"), col("user_id"))
      .filter(col("day_num") >= mn && col("day_num") <= mx)
      .groupBy("day_num")
      .agg(countDistinct("user_id").as("n_users_7d"))
      .orderBy("day_num")
  }

  val rollingActiveUsersSql: String =
    """WITH du AS (
      |  SELECT DISTINCT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |         user_id
      |  FROM events WHERE event_type = 'view'),
      |b AS (SELECT min(d) AS mn, max(d) AS mx FROM du),
      |ex AS (SELECT unnest(generate_series(d, d + 6)) AS day_num, user_id FROM du)
      |SELECT day_num, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
      |FROM ex, b WHERE day_num BETWEEN mn AND mx GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q98: top-k per group (rank pushdown) ---------------------------
  // Per-group top-3 parts by decimal-exact revenue. The plan matters as
  // much as the result: Spark lowers the rank-filter idiom to
  // WindowGroupLimit, which keeps only k rows PER GROUP PER PARTITION
  // before the window's sort-shuffle — the full ranked table never
  // materializes (asserted in PlanAuditSpec for the q25 family; same
  // operator here). Input is the (group, part) aggregate, one shuffle.
  def topPartsPerFlag(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("rev").desc, col("l_partkey"))
    rev.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("l_returnflag"), col("rk"), col("l_partkey"),
        col("rev").cast("double").as("revenue"))
      .orderBy("l_returnflag", "rk")
  }

  val topPartsPerFlagSql: String =
    """WITH rev AS (
      |  SELECT l_returnflag, l_partkey,
      |         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, l_partkey, rev,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |                           ORDER BY rev DESC, l_partkey) AS rk
      |      FROM rev)
      |SELECT l_returnflag, CAST(rk AS BIGINT) AS rk, l_partkey,
      |       CAST(rev AS DOUBLE) AS revenue
      |FROM r WHERE rk <= 3 ORDER BY 1, 2""".stripMargin

  // ---- q139: per-entity rate cap (first-k per user per day) ----------
  // The ingestion throttle every abuse-resistant pipeline runs: keep at
  // most k events per user per day, FIRST-k by event time (not an
  // arbitrary k — replayable), report kept/dropped per event type.
  // Shape at scale: the window partitions by (user, DAY) — millions of
  // tiny partitions, each a handful of rows, so no skew and no global
  // sort. Note this query CANNOT take the q98 WindowGroupLimit
  // lowering: the report counts dropped rows and capped users, so rows
  // with rn > k must survive the window — every row pays exactly one
  // (user, day)-keyed shuffle, which is the floor for this semantics.
  // A delivery variant that only KEEPS the first k (no drop
  // accounting) would filter rn <= k and get the group-limit pushdown
  // for free. The day bucket is integer floor-division on the
  // int96-free ns channel; ordering tiebreaks on event_id so the kept
  // set is unique and engine-identical.
  private val RateCapK = 3

  def rateCap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window
      .partitionBy(col("user_id"), expr("ts_ns div 86400000000000"))
      .orderBy(col("ts_ns"), col("event_id"))
    ev.withColumn("__rn", row_number().over(w))
      .groupBy("event_type")
      .agg(sum(when(col("__rn") <= RateCapK, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") > RateCapK, 1L).otherwise(0L)).as("n_dropped"),
        countDistinct(when(col("__rn") > RateCapK, col("user_id"))).as("n_capped_users"))
      .orderBy("event_type")
  }

  val rateCapSql: String =
    s"""WITH r AS (
       |  SELECT event_type, user_id,
       |         ROW_NUMBER() OVER (
       |           PARTITION BY user_id, epoch_ns(ts) // 86400000000000
       |           ORDER BY epoch_ns(ts), event_id) AS rn
       |  FROM events)
       |SELECT event_type,
       |       CAST(SUM(CASE WHEN rn <= $RateCapK THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN rn > $RateCapK THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(COUNT(DISTINCT CASE WHEN rn > $RateCapK THEN user_id END) AS BIGINT)
       |         AS n_capped_users
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q183: OHLC bar downsampling -----------------------------------
  // The classic time-series reduction (open/high/low/close/volume per
  // bar) as ONE hash aggregate: open/close are `min_by`/`max_by` over
  // the (ts, event_id) struct — the event_id tiebreak makes the bar
  // boundary deterministic even under equal timestamps — so the whole
  // operator is a single map-side-combinable aggregate on
  // (event_type, hour). No window, no sort, no second pass: at 100 TB
  // this is one shuffle keyed on the bar, with partial aggregation
  // collapsing each map partition to |bars| rows before the exchange.
  // high/low/open/close are UNTOUCHED input doubles (no arithmetic →
  // no float divergence); volume goes through the DECIMAL(18,4)
  // exact-sum channel like q3's revenue.
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("volume"))
      .orderBy("event_type", "bar_ts")

  val ohlcBarsSql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bar_ts, ts, event_id, value
      |  FROM events),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY event_type, bar_ts
      |                           ORDER BY ts, event_id) AS rn_a,
      |        row_number() OVER (PARTITION BY event_type, bar_ts
      |                           ORDER BY ts DESC, event_id DESC) AS rn_d
      |      FROM e)
      |SELECT event_type, bar_ts,
      |       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
      |       MAX(value) AS high,
      |       MIN(value) AS low,
      |       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q202: ordered conversion funnel -------------------------------
  // The product-analytics staple the reference's SQL suite stops short
  // of: per user, the strictly-ordered view -> click -> purchase
  // funnel (each stage must happen AFTER the previous stage's first
  // occurrence), reduced to stage populations and step-conversion
  // ppm. Times are exact integer micros (never raw timestamps — the
  // cross-engine rule), stage entry is the MIN-after-previous-stage,
  // and every step is a grouped conditional MIN + an equality join
  // back on user_id — three bounded passes, no window over the event
  // stream, no ordering shuffle.
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .localCheckpoint(true) // three stage passes share the scan
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("tv"))
    val s2 = ev.join(s1, "user_id")
      .filter(col("event_type") === "click" && col("us") > col("tv"))
      .groupBy("user_id").agg(min("us").as("tc"))
    val s3 = ev.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("us") > col("tc"))
      .groupBy("user_id").agg(min("us").as("tp"))
    val counts = Seq(
      ("1_view", s1), ("2_click_after_view", s2), ("3_purchase_after_click", s3))
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"),
          col("n_users"))
      }.reduce(_.unionByName(_))
    val w = Window.orderBy("stage") // 3-row frame: the window is bounded
    counts
      .withColumn("prev_n", lag("n_users", 1).over(w))
      .select(col("stage"), col("n_users"),
        // Stage 1 has no previous stage: its conversion is DEFINED as
        // 10^6 and computed explicitly — Spark's greatest() SKIPS
        // nulls (greatest(NULL, 1) = 1), so routing the first stage
        // through the ratio would quietly yield n_users·10^6 and the
        // null-coalesce fallback would be dead code (round-9 ADVICE).
        // greatest(,1) below guards only the empty-corpus stage
        // (prev_n = 0 ⇒ n_users = 0 ⇒ conv reads 0 instead of
        // erroring under ANSI division).
        when(col("prev_n").isNull, lit(1000000L))
          .otherwise(expr("n_users * 1000000 div greatest(prev_n, 1)"))
          .as("conv_ppm"))
      .orderBy("stage")
  }

  val conversionFunnelSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS tv FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT ev.user_id, MIN(us) AS tc FROM ev JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND us > tv GROUP BY 1),
      |s3 AS (SELECT ev.user_id, MIN(us) AS tp FROM ev JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND us > tc GROUP BY 1),
      |c AS (SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
      |      UNION ALL SELECT '2_click_after_view', COUNT(*) FROM s2
      |      UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM s3)
      |SELECT stage, CAST(n_users AS BIGINT) AS n_users,
      |       CAST(CASE WHEN lag(n_users) OVER (ORDER BY stage) IS NULL
      |                 THEN 1000000
      |                 ELSE n_users * 1000000
      |                      // greatest(lag(n_users) OVER (ORDER BY stage), 1)
      |            END AS BIGINT) AS conv_ppm
      |FROM c ORDER BY stage""".stripMargin

  // ---- q203: weekly retention cohorts --------------------------------
  // The cohort-retention matrix: users grouped by first-seen week,
  // counted in every later week they were active, keyed (cohort_week,
  // week_offset). Weeks via date_trunc('week') (Monday start in both
  // engines), offsets as integer floor((active - cohort) / 7 days).
  // Two grouped aggregates + one join on user_id; the matrix is
  // |weeks|² rows of metadata, never data-sized.
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
      .localCheckpoint(true) // feeds cohorts AND activity
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val retentionCohortsSql: String =
    """WITH ev AS (SELECT DISTINCT user_id,
      |              CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1)
      |SELECT cohort_week,
      |       CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
      |       CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
      |FROM ev JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q204: event-type transition matrix ----------------------------
  // First-order Markov structure of the event stream: per user, each
  // consecutive (prev_type -> type) pair under the total (us,
  // event_id) order, counted corpus-wide with row-share ppm per
  // source state. One per-user window (user-sized partitions) + one
  // grouped count + a per-from-state total join.
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the per-state total AND the output
    val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div tot").as("share_ppm"))
      .orderBy("from_type", "to_type")
  }

  // ---- q280: Markov stationary distribution (power iteration) --------
  // The long-run visit share of each event type under the empirical
  // transition matrix from q204 — the "where do user journeys spend
  // their time" statistic behind landing-page weighting. Six fixed
  // power-iteration rounds from the uniform ppm vector; every round is
  // pi'(dst) = sum_src (pi(src) * n(src,dst)) div tot(src), the q146
  // integer-PageRank discipline (nonnegative floor division, products
  // through DECIMAL(38,0)/HUGEINT so per-state counts up to ~1e12
  // can't wrap int64): truncation loss is deterministic and identical,
  // so six rounds land on byte-identical ppm vectors cross-engine.
  //
  // Shape at scale: states are a |event-type| frame (broadcast); each
  // round is ONE edges-join-pi hash join + ONE groupBy(to_type) —
  // rounds checkpointed so the lineage stays flat, exactly the q146
  // loop. The oracle unrolls the six rounds as chained CTEs (no
  // recursive aggregation needed, genuinely different plan shape).
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    stationaryOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n")))
  }

  /** Power-iteration core over a (from_type, to_type, n) count frame —
    * factored so the spec can plant a chain with a closed-form
    * stationary vector. */
  private[graft] def stationaryOf(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.localCheckpoint(true) // totals + edge stream
    val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
    val edges = pairs.join(broadcast(totals), "from_type")
      .localCheckpoint(true) // consumed every round
    val states = edges.select(col("from_type").as("state"))
      .unionAll(edges.select(col("to_type").as("state"))).distinct()
      .localCheckpoint(true) // init + per-round left join
    var pi = states
      .crossJoin(broadcast(states.groupBy().agg(count(lit(1)).as("ns"))))
      .select(col("state"), expr("1000000 div ns").as("pi"))
      .localCheckpoint(true)
    for (_ <- 1 to 6) {
      val contrib = edges.join(pi, edges("from_type") === pi("state"))
        .groupBy(col("to_type").as("state"))
        .agg(expr("CAST(SUM(CAST(pi AS DECIMAL(38,0)) * n div tot) AS BIGINT)")
          .as("mass"))
      pi = states.join(contrib, Seq("state"), "left")
        .select(col("state"), coalesce(col("mass"), lit(0L)).as("pi"))
        .localCheckpoint(true)
    }
    pi.join(broadcast(totals.select(col("from_type").as("state"),
        col("tot").as("n_out"))), Seq("state"), "left")
      .select(col("state"), col("pi").as("pi_ppm"),
        coalesce(col("n_out"), lit(0L)).as("n_out"))
      .orderBy("state")
  }

  val markovStationarySql: String = {
    def round(k: Int): String =
      s"""p$k AS (SELECT s.state, COALESCE(x.pi, 0) AS pi
         |  FROM states s LEFT JOIN (
         |    SELECT e.to_type AS state,
         |           SUM((CAST(p.pi AS HUGEINT) * e.n) // e.tot) AS pi
         |    FROM e JOIN p${k - 1} p ON p.state = e.from_type
         |    GROUP BY 1) x USING (state))""".stripMargin
    s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
       |            FROM events),
       |pr AS (SELECT user_id, event_type,
       |        lag(event_type) OVER (PARTITION BY user_id
       |                              ORDER BY us, event_id) AS prev_type
       |      FROM ev),
       |c AS (SELECT prev_type AS from_type, event_type AS to_type,
       |        COUNT(*) AS n
       |      FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1),
       |e AS (SELECT c.from_type, c.to_type, c.n, t.tot
       |      FROM c JOIN t USING (from_type)),
       |states AS (SELECT from_type AS state FROM e
       |           UNION SELECT to_type FROM e),
       |p0 AS (SELECT state,
       |         1000000 // (SELECT COUNT(*) FROM states) AS pi
       |       FROM states),
       |${(1 to 6).map(round).mkString(",\n")}
       |SELECT p6.state, CAST(p6.pi AS BIGINT) AS pi_ppm,
       |       CAST(COALESCE(t.tot, 0) AS BIGINT) AS n_out
       |FROM p6 LEFT JOIN t ON p6.state = t.from_type
       |ORDER BY state""".stripMargin
  }

  // ---- q283: time-weighted average value (TWAP) per event type -------
  // The metric behind "average position/price while it was held": each
  // event's value persists until the user's NEXT event, so it weighs by
  // its holding duration, not its row count — a burst of 100 ticks in
  // one second must not outvote one value held for a day. Weight =
  // microseconds to the next event in the same user's stream (the last
  // event has no duration and drops out, the standard open-interval
  // convention). Exactness: value goes through the repo's DECIMAL(18,4)
  // float discipline BEFORE multiplying by the integer duration, so the
  // weighted sum is an exact DECIMAL(38,4) in both engines; the final
  // twap is one double division of two exactly-agreed operands.
  //
  // Shape at scale: ONE window (partitioned by user — the q29
  // sessionization shuffle, no global sort) computes every duration;
  // the per-type reduction combines map-side. Nothing here is
  // per-pair or per-interval-expansion.
  def twapByType(spark: SparkSession, dir: String): DataFrame =
    twapOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), expr("ts_ns div 1000").as("us")))

  /** TWAP core over (user_id, event_id, event_type, value, us) rows —
    * factored so the spec can plant a two-event stream whose TWAP is a
    * hand-computed weighted mean. */
  private[graft] def twapOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.withColumn("dt_us", lead("us", 1).over(w) - col("us"))
      .filter(col("dt_us").isNotNull)
      .withColumn("vdec", col("value").cast(DecimalType(18, 4)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segments"),
        sum("dt_us").as("held_us"),
        sum(col("vdec") * col("dt_us")).cast(DecimalType(38, 4)).as("vdt"))
      // a type whose segments are ALL zero-duration (equal timestamps)
      // has no holding time to average over: drop it rather than emit
      // the engine-specific 0/0 (NaN in Spark, DuckDB double semantics)
      .filter(col("held_us") > 0L)
      .select(col("event_type"), col("n_segments"), col("held_us"),
        round(col("vdt").cast("double") / col("held_us").cast("double"), 6)
          .as("twap"))
      .orderBy("event_type")
  }

  val twapByTypeSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, value,
      |                   epoch_us(ts) AS us FROM events),
      |d AS (SELECT event_type, value,
      |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |          - us AS dt_us
      |      FROM ev)
      |SELECT event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_segments,
      |       CAST(SUM(dt_us) AS BIGINT) AS held_us,
      |       round(CAST(SUM(CAST(value AS DECIMAL(18,4)) * dt_us) AS DOUBLE)
      |             / CAST(SUM(dt_us) AS DOUBLE), 6) AS twap
      |FROM d WHERE dt_us IS NOT NULL
      |GROUP BY event_type HAVING SUM(dt_us) > 0 ORDER BY event_type""".stripMargin

  // ---- q284: DAU / rolling-7-day WAU / stickiness ---------------------
  // The product-analytics headline triple. WAU(d) = DISTINCT users over
  // days [d-6, d]; a user active on 5 of the 7 days counts ONCE, so a
  // windowed SUM over daily counts is wrong by construction — the
  // correct unit is the user-day. DAU*1e6 div WAU is the integer
  // stickiness ratio (ppm).
  //
  // Shape at scale — the interval-merge delta form, not a 7x anchor
  // fan-out: each active day serves anchors [day, day+6], so a user's
  // anchor coverage is the UNION of those intervals; merging them
  // (one user-partitioned window: new interval when the day gap
  // exceeds 7) turns WAU into a difference array — +1 where a merged
  // interval starts, -1 after it ends — and ONE cumulative sum over
  // the calendar-bounded day grid (the q294 |days|-frame convention)
  // reads off every WAU. Shuffle volume: the user-day DISTINCT (the
  // only full-events pass) + one |user-day| window exchange + a
  // 2x|intervals| delta fold, instead of DISTINCTing 7x the user-day
  // frame. A streak-heavy corpus (the common case) collapses to few
  // intervals per user, so the delta frame is tiny.
  def activeUsers(spark: SparkSession, dir: String): DataFrame =
    activeUsersOf(Tables.events(spark, dir)
      .select(col("user_id"),
        expr("(ts_ns div 1000) div 86400000000").as("day")))

  /** DAU/WAU core over (user_id, day) rows — factored so the spec can
    * plant a user active every day vs one-day visitors. */
  private[graft] def activeUsersOf(rows: DataFrame): DataFrame = {
    val ud = rows.select("user_id", "day").distinct()
      .localCheckpoint(true) // feeds DAU and the interval merge
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    // merge anchor intervals [day, day+6] per user: a new interval
    // starts when this day's window no longer touches the previous
    // one (gap > 7 ⇔ day > prev + 6 + 1)
    val w = Window.partitionBy("user_id").orderBy("day")
    val intervals = ud
      .withColumn("prev", lag("day", 1).over(w))
      .withColumn("newint",
        when(col("prev").isNull || col("day") - col("prev") > 7L, 1L)
          .otherwise(0L))
      .withColumn("intid", sum("newint")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "intid")
      .agg(min("day").as("a"), (max("day") + 6L).as("b"))
    val deltas = intervals.select(col("a").as("day"), lit(1L).as("d"))
      .unionAll(intervals.select((col("b") + 1L).as("day"), lit(-1L).as("d")))
      .groupBy("day").agg(sum("d").as("delta"))
      .localCheckpoint(true) // grid + cumsum both read it
    // cumulative coverage over the day grid (calendar-bounded frame:
    // |distinct days| + interval boundaries — the unpartitioned
    // window is the q294 small-dim convention)
    val grid = dau.select("day").unionAll(deltas.select("day")).distinct()
    val wg = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    val wau = grid.join(deltas, Seq("day"), "left")
      .withColumn("wau", sum(coalesce(col("delta"), lit(0L))).over(wg))
    dau.join(wau.select("day", "wau"), "day")
      .select(date_add(to_date(lit("1970-01-01")), col("day").cast("int"))
          .as("day"),
        col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
      .orderBy("day")
  }

  val activeUsersSql: String =
    """WITH ud AS (SELECT DISTINCT user_id,
      |                   epoch_us(ts) // 86400000000 AS day FROM events),
      |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
      |wau AS (SELECT day, COUNT(*) AS wau FROM (
      |          SELECT DISTINCT ud.user_id, ud.day + r.k AS day
      |          FROM ud CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS k) r)
      |        GROUP BY 1)
      |SELECT DATE '1970-01-01' + CAST(dau.day AS INTEGER) AS day,
      |       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
      |       dau.dau * 1000000 // wau.wau AS stickiness_ppm
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY 1""".stripMargin

  // ---- q290: temporal co-occurrence (same user, same half hour) ------
  // Which event types happen TOGETHER, not merely back-to-back: q204's
  // transitions only see adjacent pairs, so "view and purchase in the
  // same session-ish window, with a search in between" never counts.
  // Unit of evidence is the (user, 30-minute bucket) cell; each cell
  // contributes each unordered type pair at most ONCE (distinct before
  // pairing — a 50-view burst must not manufacture 50 votes).
  //
  // Shape at scale: one DISTINCT to the (user, bucket, type) frame,
  // then a per-cell self-join whose fan-out is bounded by the type
  // ALPHABET squared per cell (alphabets are small; for open alphabets
  // this is where the q110 A-Priori guard would bolt on), one grouped
  // count. No interval explosion, no windows.
  def typeCooccurrence(spark: SparkSession, dir: String): DataFrame =
    cooccurrenceOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("(ts_ns div 1000) div 1800000000").as("bucket")))

  /** Pair fold over (user_id, event_type, bucket) rows — factored so
    * the spec can plant a burst that must count once. */
  private[graft] def cooccurrenceOf(rows: DataFrame): DataFrame = {
    val cell = rows.select("user_id", "bucket", "event_type").distinct()
    cell.as("a").join(cell.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_cells"))
      .orderBy("type_a", "type_b")
  }

  val typeCooccurrenceSql: String =
    """WITH cell AS (SELECT DISTINCT user_id,
      |        epoch_us(ts) // 1800000000 AS bucket, event_type
      |      FROM events)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       CAST(COUNT(*) AS BIGINT) AS n_cells
      |FROM cell a JOIN cell b
      |  ON a.user_id = b.user_id AND a.bucket = b.bucket
      | AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q293: entry-path trie (first three steps per user) ------------
  // "What do users do FIRST" — the prefix-anchored complement to q232's
  // GSP (which mines frequent subsequences anywhere in the stream) and
  // q204's adjacent transitions: the top user journeys restricted to
  // steps 1-2-3 from each user's first event. Users with fewer than
  // three events pad with '-' so two-step journeys rank too.
  //
  // Shape at scale: one user-partitioned window (the q29 shuffle) to
  // rank events, a FILTER to rank <= 3 BEFORE any aggregation (the
  // 3-row-per-user frame is what shuffles), a conditional-min pivot,
  // one grouped count, TakeOrderedAndProject for the top 20.
  def entryPaths(spark: SparkSession, dir: String): DataFrame =
    entryPathsOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us")))

  /** Trie fold over (user_id, event_id, event_type, us) rows —
    * factored so the spec can plant short and long journeys. */
  private[graft] def entryPathsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(min(when(col("rn") === 1, col("event_type"))).as("s1"),
        min(when(col("rn") === 2, col("event_type"))).as("s2"),
        min(when(col("rn") === 3, col("event_type"))).as("s3"))
      .groupBy(col("s1").as("step1"),
        coalesce(col("s2"), lit("-")).as("step2"),
        coalesce(col("s3"), lit("-")).as("step3"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("step1"), asc("step2"), asc("step3"))
      .limit(20)
  }

  val entryPathsSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |r AS (SELECT user_id, event_type,
      |        row_number() OVER (PARTITION BY user_id
      |                           ORDER BY us, event_id) AS rn
      |      FROM ev),
      |p AS (SELECT user_id,
      |        MIN(CASE WHEN rn = 1 THEN event_type END) AS s1,
      |        MIN(CASE WHEN rn = 2 THEN event_type END) AS s2,
      |        MIN(CASE WHEN rn = 3 THEN event_type END) AS s3
      |      FROM r WHERE rn <= 3 GROUP BY 1)
      |SELECT s1 AS step1, COALESCE(s2, '-') AS step2,
      |       COALESCE(s3, '-') AS step3,
      |       CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM p GROUP BY 1, 2, 3
      |ORDER BY n_users DESC, step1, step2, step3 LIMIT 20""".stripMargin

  // ---- q294: temporal train/test split audit --------------------------
  // The time-based split every forecasting/recsys pipeline needs, with
  // the two leakage-adjacent statistics that decide whether it is
  // usable: the cold-start rate (test users never seen in train) and
  // the unseen-type rate. The cut is the POSITIONAL p80 day (rank
  // ceil(0.8·|days|) of the distinct-day frame — both engines pick the
  // identical element; ceil via (8n+9) div 10, no floats). Complements
  // q135, whose split is identity-hash cluster-atomic, not temporal.
  //
  // Shape at scale: one full-events pass to (user, type, day), a
  // |days|-sized ranked frame (calendar-bounded, the q262 small-dim
  // convention) broadcast back as a 1-row cut, two anti-join distinct
  // counts on user/type frames — never on raw events.
  def temporalSplitAudit(spark: SparkSession, dir: String): DataFrame =
    splitAuditOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("(ts_ns div 1000) div 86400000000").as("day")))

  /** Audit core over (user_id, event_type, day) rows — factored so the
    * spec can plant a cold-start user and an unseen type. */
  private[graft] def splitAuditOf(rows: DataFrame): DataFrame = {
    val days = rows.select("day").distinct()
    val wd = Window.orderBy("day") // |days| rows: calendar-bounded dim
    val cut = days
      .withColumn("rn", row_number().over(wd))
      .crossJoin(broadcast(days.groupBy().agg(count(lit(1)).as("nd"))))
      .filter(col("rn") === expr("(8 * nd + 9) div 10"))
      .select(col("day").as("day_cut"))
    val tagged = rows.crossJoin(broadcast(cut))
      .withColumn("is_train", col("day") <= col("day_cut"))
      .localCheckpoint(true) // counts + two distinct frames
    val counts = tagged.groupBy().agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test"),
      max("day_cut").as("day_cut"))
    def unseen(c: String) = {
      val tr = tagged.filter(col("is_train")).select(c).distinct()
      val te = tagged.filter(!col("is_train")).select(c).distinct()
        .localCheckpoint(true)
      te.groupBy().agg(count(lit(1)).as(s"n_test_$c"))
        .crossJoin(broadcast(
          te.join(tr, Seq(c), "left_anti").groupBy()
            .agg(count(lit(1)).as(s"n_unseen_$c"))))
    }
    counts.crossJoin(broadcast(unseen("user_id")))
      .crossJoin(broadcast(unseen("event_type")))
      .select(col("day_cut"), col("n_train"), col("n_test"),
        col("n_test_user_id").as("n_test_users"),
        col("n_unseen_user_id").as("n_unseen_users"),
        expr("n_unseen_user_id * 1000000 div n_test_user_id")
          .as("cold_start_ppm"),
        col("n_unseen_event_type").as("n_unseen_types"))
  }

  val temporalSplitAuditSql: String =
    """WITH ev AS (SELECT user_id, event_type,
      |              epoch_us(ts) // 86400000000 AS day FROM events),
      |days AS (SELECT DISTINCT day FROM ev),
      |cut AS (SELECT day AS day_cut FROM (
      |          SELECT day, row_number() OVER (ORDER BY day) AS rn,
      |                 COUNT(*) OVER () AS nd FROM days)
      |        WHERE rn = (8 * nd + 9) // 10),
      |t AS (SELECT ev.*, ev.day <= cut.day_cut AS is_train
      |      FROM ev CROSS JOIN cut),
      |tru AS (SELECT DISTINCT user_id FROM t WHERE is_train),
      |teu AS (SELECT DISTINCT user_id FROM t WHERE NOT is_train),
      |trt AS (SELECT DISTINCT event_type FROM t WHERE is_train),
      |tet AS (SELECT DISTINCT event_type FROM t WHERE NOT is_train),
      |uu AS (SELECT COUNT(*) AS n FROM teu
      |       WHERE user_id NOT IN (SELECT user_id FROM tru)),
      |ut AS (SELECT COUNT(*) AS n FROM tet
      |       WHERE event_type NOT IN (SELECT event_type FROM trt))
      |SELECT (SELECT day_cut FROM cut) AS day_cut,
      |       CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_train,
      |       CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
      |         AS n_test,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM teu) AS n_test_users,
      |       (SELECT CAST(n AS BIGINT) FROM uu) AS n_unseen_users,
      |       (SELECT CAST(n * 1000000 // (SELECT COUNT(*) FROM teu)
      |                    AS BIGINT) FROM uu) AS cold_start_ppm,
      |       (SELECT CAST(n AS BIGINT) FROM ut) AS n_unseen_types
      |FROM t""".stripMargin

  // ---- q298: weekly growth accounting (new/retained/resurrected/churned)
  // The standard growth-accounting identity (public analytics
  // literature): each active (user, week) is exactly one of NEW (first
  // week ever), RETAINED (also active the prior week) or RESURRECTED
  // (returning after a gap); CHURNED(w) counts users active in w-1 and
  // silent in w. The identity actives(w) = new + retained + resurrected
  // and retained(w) = actives(w-1) - churned(w) both hold by
  // construction — the spec asserts them.
  //
  // Shape at scale: ONE distinct to the user-week frame (map-side
  // combinable; |user-weeks| << |events|), a per-user MIN for first
  // weeks, and two self-equi-joins of the user-week frame on the
  // shifted key. No windows, no per-user sequences materialized.
  def growthAccounting(spark: SparkSession, dir: String): DataFrame =
    growthOf(Tables.events(spark, dir)
      .select(col("user_id"),
        expr("((ts_ns div 1000) div 86400000000) div 7").as("week")))

  /** Accounting core over (user_id, week) rows — factored so the spec
    * can plant a resurrection and a churn-then-return arc. */
  private[graft] def growthOf(rows: DataFrame): DataFrame = {
    val uw = rows.select("user_id", "week").distinct()
      .localCheckpoint(true) // firsts + both shifted joins
    val firsts = uw.groupBy("user_id").agg(min("week").as("w0"))
    val prevActive = uw.select(col("user_id"),
      (col("week") + 1L).as("week"), lit(1L).as("was_prev"))
    val classified = uw.join(firsts, "user_id")
      .join(prevActive, Seq("user_id", "week"), "left")
      .groupBy("week").agg(
        count(lit(1)).as("n_active"),
        sum(when(col("week") === col("w0"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("was_prev").isNotNull, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("was_prev").isNull && col("week") =!= col("w0"), 1L)
          .otherwise(0L)).as("n_resurrected"))
    val churned = uw.select(col("user_id"), (col("week") + 1L).as("week"))
      .join(uw, Seq("user_id", "week"), "left_anti")
      .groupBy("week").agg(count(lit(1)).as("n_churned"))
    classified.join(churned, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("week")
  }

  val growthAccountingSql: String =
    """WITH uw AS (SELECT DISTINCT user_id,
      |        (epoch_us(ts) // 86400000000) // 7 AS week FROM events),
      |f AS (SELECT user_id, MIN(week) AS w0 FROM uw GROUP BY 1),
      |cl AS (SELECT uw.week,
      |        COUNT(*) AS n_active,
      |        SUM(CASE WHEN uw.week = f.w0 THEN 1 ELSE 0 END) AS n_new,
      |        SUM(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |          AS n_retained,
      |        SUM(CASE WHEN p.user_id IS NULL AND uw.week <> f.w0
      |                 THEN 1 ELSE 0 END) AS n_resurrected
      |      FROM uw JOIN f USING (user_id)
      |      LEFT JOIN uw p ON p.user_id = uw.user_id
      |                    AND p.week + 1 = uw.week
      |      GROUP BY 1),
      |ch AS (SELECT a.week + 1 AS week, COUNT(*) AS n_churned
      |       FROM uw a LEFT JOIN uw b
      |         ON b.user_id = a.user_id AND b.week = a.week + 1
      |       WHERE b.user_id IS NULL GROUP BY 1)
      |SELECT cl.week, CAST(n_active AS BIGINT) AS n_active,
      |       CAST(n_new AS BIGINT) AS n_new,
      |       CAST(n_retained AS BIGINT) AS n_retained,
      |       CAST(n_resurrected AS BIGINT) AS n_resurrected,
      |       CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
      |FROM cl LEFT JOIN ch ON cl.week = ch.week
      |ORDER BY cl.week""".stripMargin

  // ---- q303: dwell-weighted transition matrix --------------------------
  // q204 counts WHERE users go; this adds HOW LONG the hop takes: per
  // (from_type, to_type), the transition count, total dwell, and the
  // integer mean dwell in microseconds — the edge weights a journey
  // optimizer actually needs (a frequent-but-instant hop and a rare-
  // but-10-minute hop are different products).
  //
  // Shape at scale: the SAME single user-partitioned window as q204
  // (lag of type and of timestamp in one pass), one grouped fold.
  def dwellMatrix(spark: SparkSession, dir: String): DataFrame =
    dwellOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us")))

  /** Matrix core over (user_id, event_id, event_type, us) rows —
    * factored so the spec can plant hops with hand-computed dwell. */
  private[graft] def dwellOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("us") - col("prev_us")).as("dwell_us"))
      .select(col("from_type"), col("to_type"), col("n"), col("dwell_us"),
        expr("dwell_us div n").as("mean_dwell_us"))
      .orderBy("from_type", "to_type")
  }

  val dwellMatrixSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |pr AS (SELECT user_id, event_type, us,
      |        lag(event_type) OVER w AS prev_type,
      |        lag(us) OVER w AS prev_us
      |      FROM ev
      |      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
      |SELECT prev_type AS from_type, event_type AS to_type,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(us - prev_us) AS BIGINT) AS dwell_us,
      |       CAST(SUM(us - prev_us) // COUNT(*) AS BIGINT)
      |         AS mean_dwell_us
      |FROM pr WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- q291: transition reciprocity -----------------------------------
  // Garlaschelli & Loffredo's reciprocity (PRL 2004, public
  // literature) over the q204 transition digraph: how much of the
  // A->B traffic flows back B->A — navigation loops vs a one-way
  // funnel. Unweighted: reciprocated edges over all non-loop edges.
  // Weighted: 2·Σ min(n_ab, n_ba) over Σ n (each unordered pair's
  // returnable mass, both in ppm).
  //
  // Shape at scale: the edge frame is the q204 grouped count
  // (|alphabet|², small); ONE self-equi-join on the reversed key and a
  // 1-row fold. Generalizes verbatim to any directed edge frame.
  def transitionReciprocity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    reciprocityOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n")))
  }

  /** Reciprocity core over a (from_type, to_type, n) edge frame —
    * factored so the spec can plant a pure cycle (r = 1) and a pure
    * funnel (r = 0). */
  private[graft] def reciprocityOf(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("from_type") =!= col("to_type"))
      .localCheckpoint(true) // both sides of the reverse join
    e.as("x").join(e.as("y"),
        col("x.from_type") === col("y.to_type") &&
          col("x.to_type") === col("y.from_type"), "left")
      .groupBy()
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("y.n").isNotNull, 1L).otherwise(0L)).as("n_recip"),
        sum(col("x.n")).as("w_total"),
        sum(least(col("x.n"), coalesce(col("y.n"), lit(0L)))).as("w_recip"))
      .select(col("n_edges"), col("n_recip"),
        expr("n_recip * 1000000 div n_edges").as("recip_ppm"),
        expr("w_recip * 1000000 div w_total").as("w_recip_ppm"))
  }

  val transitionReciprocitySql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |pr AS (SELECT user_id, event_type,
      |        lag(event_type) OVER (PARTITION BY user_id
      |                              ORDER BY us, event_id) AS prev_type
      |      FROM ev),
      |c AS (SELECT prev_type AS from_type, event_type AS to_type,
      |        COUNT(*) AS n
      |      FROM pr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |e AS (SELECT * FROM c WHERE from_type <> to_type),
      |m AS (SELECT COUNT(*) AS n_edges,
      |        SUM(CASE WHEN y.n IS NOT NULL THEN 1 ELSE 0 END) AS n_recip,
      |        SUM(x.n) AS w_total,
      |        SUM(LEAST(x.n, COALESCE(y.n, 0))) AS w_recip
      |      FROM e x LEFT JOIN e y
      |        ON x.from_type = y.to_type AND x.to_type = y.from_type)
      |SELECT CAST(n_edges AS BIGINT) AS n_edges,
      |       CAST(n_recip AS BIGINT) AS n_recip,
      |       CAST(n_recip * 1000000 // n_edges AS BIGINT) AS recip_ppm,
      |       CAST(w_recip * 1000000 // w_total AS BIGINT) AS w_recip_ppm
      |FROM m""".stripMargin

  val eventTransitionsSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |p AS (SELECT user_id, event_type,
      |        lag(event_type) OVER (PARTITION BY user_id
      |                              ORDER BY us, event_id) AS prev_type
      |      FROM ev),
      |c AS (SELECT prev_type AS from_type, event_type AS to_type,
      |        COUNT(*) AS n
      |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, CAST(n AS BIGINT) AS n,
      |       CAST(n * 1000000 // tot AS BIGINT) AS share_ppm
      |FROM c JOIN t USING (from_type)
      |ORDER BY 1, 2""".stripMargin

  // ---- q205: per-user running balance (ordered cumulative sum) -------
  // The ledger shape: each user's event values as a running balance
  // under the total (us, event_id) order, reduced to final / peak /
  // trough per user. The running sum is DECIMAL(18,4) — exact and
  // order-independent within the frame — so extremes are
  // bit-identical cross-engine where a double cumsum would drift. One
  // per-user window (user-sized partitions), one grouped reduce.
  def runningBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("us"),
        col("value").cast(DecimalType(18, 4)).as("v"))
      .withColumn("bal", sum("v").over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("v").cast("double").as("final_balance"),
        max("bal").cast("double").as("peak_balance"),
        min("bal").cast("double").as("trough_balance"))
      .orderBy("user_id")
  }

  val runningBalanceSql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
      |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
      |b AS (SELECT user_id, v,
      |        SUM(v) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS bal
      |      FROM ev)
      |SELECT user_id, COUNT(*) AS n_events,
      |       CAST(SUM(v) AS DOUBLE) AS final_balance,
      |       CAST(MAX(bal) AS DOUBLE) AS peak_balance,
      |       CAST(MIN(bal) AS DOUBLE) AS trough_balance
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q206: within-session conversion funnel ------------------------
  // q202 scoped to a session: the strictly-ordered view -> click ->
  // purchase must complete INSIDE one gap-session (q29's 30-min rule),
  // counted in sessions per stage. Session assignment inlines the gap
  // rule under the total (us, event_id) order (q29 orders by ts alone;
  // the funnel needs the tie-broken total order so the stage search is
  // engine-deterministic even on same-microsecond events). Stage
  // passes are the q202 shape keyed (user_id, session_seq).
  private val FunnelGapUs = 30L * 60 * 1000 * 1000

  def sessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("prev", lag("us", 1).over(wOrd))
      .withColumn("ns",
        when(col("prev").isNull || col("us") - col("prev") > FunnelGapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum("ns").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "sid", "event_type", "us")
      .localCheckpoint(true) // three stage passes share the assignment
    val key = Seq("user_id", "sid")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(key.map(col): _*).agg(min("us").as("tv"))
    val s2 = ev.join(s1, key)
      .filter(col("event_type") === "click" && col("us") > col("tv"))
      .groupBy(key.map(col): _*).agg(min("us").as("tc"))
    val s3 = ev.join(s2, key)
      .filter(col("event_type") === "purchase" && col("us") > col("tc"))
      .groupBy(key.map(col): _*).agg(min("us").as("tp"))
    Seq(("1_view", s1), ("2_click_after_view", s2),
      ("3_purchase_after_click", s3))
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_sessions"))
          .select(lit(stage).as("stage"), col("n_sessions"))
      }.reduce(_.unionByName(_))
      .orderBy("stage")
  }

  val sessionFunnelSql: String =
    s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
       |            FROM events),
       |m AS (SELECT user_id, event_id, event_type, us,
       |        CASE WHEN lag(us) OVER (PARTITION BY user_id
       |                                ORDER BY us, event_id) IS NULL
       |               OR us - lag(us) OVER (PARTITION BY user_id
       |                                     ORDER BY us, event_id) > $FunnelGapUs
       |             THEN 1 ELSE 0 END AS ns
       |      FROM ev),
       |sess AS (SELECT user_id, event_type, us,
       |           SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                         ROWS UNBOUNDED PRECEDING) AS sid
       |         FROM m),
       |s1 AS (SELECT user_id, sid, MIN(us) AS tv FROM sess
       |       WHERE event_type = 'view' GROUP BY 1, 2),
       |s2 AS (SELECT sess.user_id, sess.sid, MIN(us) AS tc
       |       FROM sess JOIN s1 USING (user_id, sid)
       |       WHERE event_type = 'click' AND us > tv GROUP BY 1, 2),
       |s3 AS (SELECT sess.user_id, sess.sid, MIN(us) AS tp
       |       FROM sess JOIN s2 USING (user_id, sid)
       |       WHERE event_type = 'purchase' AND us > tc GROUP BY 1, 2)
       |SELECT '1_view' AS stage, COUNT(*) AS n_sessions FROM s1
       |UNION ALL SELECT '2_click_after_view', COUNT(*) FROM s2
       |UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM s3
       |ORDER BY stage""".stripMargin

  // ---- q207: inter-event gap quantiles per event type ----------------
  // The latency-profile diagnostic: per event_type, the distribution
  // of gaps to the PREVIOUS event in the same user's total-ordered
  // stream — median and p75 as DYADIC exact percentiles over integral
  // micros (0.5/0.75 index fractions and dyadic interpolation weights
  // keep both engines bit-identical; a p90 would interpolate with 0.9
  // and drift in the last ulp). One per-user lag window + one grouped
  // aggregate.
  def gapQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap, 0.5D)").as("med_gap_us"),
        expr("percentile(gap, 0.75D)").as("p75_gap_us"),
        max("gap").as("max_gap_us"))
      .orderBy("event_type")
  }

  // The oracle interpolates EXPLICITLY from order statistics (type-7,
  // pos = q·(n−1), dyadic frac) — DuckDB 1.0's quantile_cont resolves
  // .5-midpoints differently than the R-7 rule Spark's percentile
  // implements, so the rule itself is spelled out in SQL.
  val gapQuantilesSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |g AS (SELECT event_type,
      |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |          AS gap
      |      FROM ev),
      |g2 AS (SELECT event_type, gap,
      |         row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |       FROM g WHERE gap IS NOT NULL),
      |a AS (SELECT event_type, MAX(n) AS n,
      |        MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN gap END) AS m_lo,
      |        MAX(CASE WHEN rn = n // 2 + 1 THEN gap END) AS m_hi,
      |        MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN gap END) AS p_lo,
      |        MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 2 THEN gap END) AS p_next,
      |        MAX(gap) AS mx
      |      FROM g2 GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
      |       (CAST(m_lo AS DOUBLE) + m_hi) / 2.0 AS med_gap_us,
      |       CAST(p_lo AS DOUBLE)
      |         + ((3 * (n - 1)) % 4) / 4.0 * (COALESCE(p_next, p_lo) - p_lo)
      |         AS p75_gap_us,
      |       CAST(mx AS BIGINT) AS max_gap_us
      |FROM a ORDER BY 1""".stripMargin

  // ---- q209: LOCF imputation (forward-fill missing values) -----------
  // The classic time-series repair: nulls (planted deterministically
  // at event_id % 7 == 0, the q55 residue convention) are filled with
  // the user's last observed value under the total (us, event_id)
  // order — `last(..., ignoreNulls)` over a running frame, the same
  // carry mechanism as the as-of join (Events.asOfJoin), surfaced as
  // a user-facing imputation lane. Leading nulls stay null (no
  // observation to carry) and are counted separately. The oracle has
  // no IGNORE NULLS in its window functions, so it uses the portable
  // two-window emulation: the running count of non-nulls defines
  // carry groups, and MAX within (user, group) recovers the carried
  // value — a genuinely different algorithm, so agreement proves the
  // fill semantics, not the implementation.
  def locfImpute(spark: SparkSession, dir: String): DataFrame = {
    val wRun = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("us"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .withColumn("filled", last("v", ignoreNulls = true).over(wRun))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("filled").isNull, 1L).otherwise(0L)).as("n_unfillable"),
        sum(coalesce(col("filled"), lit(0.0)).cast(DecimalType(18, 4)))
          .cast("double").as("filled_sum"))
      .orderBy("user_id")
  }

  val locfImputeSql: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
      |              CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |            FROM events),
      |g AS (SELECT user_id, v,
      |        COUNT(v) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                       ROWS UNBOUNDED PRECEDING) AS grp
      |      FROM ev),
      |f AS (SELECT user_id, v,
      |        MAX(v) OVER (PARTITION BY user_id, grp) AS filled
      |      FROM g)
      |SELECT user_id, COUNT(*) AS n_events,
      |       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_missing,
      |       CAST(SUM(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_unfillable,
      |       CAST(SUM(CAST(COALESCE(filled, 0.0) AS DECIMAL(18,4))) AS DOUBLE)
      |         AS filled_sum
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q216: seasonal-baseline outlier days --------------------------
  // The ops-monitoring staple q97's spike detector doesn't cover:
  // instead of a rolling window, the baseline is the SEASONAL profile
  // — each day is compared against the mean of its own weekday bucket
  // (dow = day_num mod 7: pure integer arithmetic both engines share,
  // no locale-sensitive dayofweek numbering). Deviation is exact
  // rational arithmetic in cents: |v·n_dow − S_dow|·10⁶ / S_dow in
  // DECIMAL(38,0)/HUGEINT — no float mean ever materializes, so the
  // outlier verdicts are bit-identical. Two grouped aggregates + one
  // broadcast of the 7-row baseline.
  def seasonalOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) * 10000)
        .cast("decimal(38,0)").as("cents"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).cast("long"))
      .localCheckpoint(true) // baseline agg + the deviation join
    val base = daily.groupBy("dow")
      .agg(count(lit(1)).as("n_dow"),
        sum("cents").cast("decimal(38,0)").as("s_cents"))
    daily.join(broadcast(base), "dow")
      .select(col("day"), col("dow"),
        (col("cents").cast("double") / 10000).as("revenue"),
        call_function("div",
          abs(col("cents") * col("n_dow").cast("decimal(38,0)")
            - col("s_cents")) * lit(1000000L).cast("decimal(38,0)"),
          col("s_cents")).cast("long").as("deviation_ppm"))
      .withColumn("is_outlier", col("deviation_ppm") > 500000L)
      .orderBy("day")
  }

  val seasonalOutliersSql: String =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
      |              AS HUGEINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |d2 AS (SELECT day, cents,
      |         CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
      |           AS dow
      |       FROM daily),
      |base AS (SELECT dow, COUNT(*) AS n_dow, SUM(cents) AS s_cents
      |         FROM d2 GROUP BY 1)
      |SELECT day, d2.dow,
      |       CAST(cents AS DOUBLE) / 10000 AS revenue,
      |       CAST(abs(cents * n_dow - s_cents) * 1000000 // s_cents
      |            AS BIGINT) AS deviation_ppm,
      |       abs(cents * n_dow - s_cents) * 1000000 // s_cents > 500000
      |         AS is_outlier
      |FROM d2 JOIN base USING (dow)
      |ORDER BY day""".stripMargin

  // ---- q236: interval union coverage (merge overlapping spans) -------
  // The interval-UNION operator q46's overlap join does not give: each
  // event opens a span [start, start + duration) (duration = 10·value
  // minutes, through the q92 round(x*1000) integer channel — the ×600
  // dial puts typical spans at the same order as the typical
  // inter-event gap, so merges, partial overlaps, full containment AND
  // gaps all occur on the real data: at sf0.001 the 1000 spans
  // coalesce into 436 components with 313 fully-covered spans), and
  // per user we want the MERGED time
  // covered — overlaps counted once — plus how many disjoint
  // components the spans coalesce into. The classic sweep is a single
  // running-max window: cm = max(end) over all PRIOR spans in
  // (start, event_id) order; a span's fresh contribution is
  // max(0, end - max(start, cm)), and it opens a new component iff
  // cm < start (touching spans, cm = start, merge). Summing both per
  // user gives exact union length and component count in one pass —
  // no interval self-join, no explode-per-unit-time.
  //
  // Shape at scale: ONE window shuffle hash-partitioned on user_id
  // (within-user sort only — no global funnel), then a user-keyed
  // map-side-combinable aggregate. All integer microseconds; the only
  // float touch is the same round(value*1000) double→long channel q92
  // established as cross-engine exact.
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageOfSpans(spansOfEvents(Tables.events(spark, dir)))

  /** Span construction from an events frame (user_id, event_id, ts_ns,
    * value): [start, start + 10·value minutes) in integer micros. */
  private[graft] def spansOfEvents(ev: DataFrame): DataFrame = ev.select(
    col("user_id"), col("event_id"),
    expr("ts_ns div 1000").as("s"),
    (expr("ts_ns div 1000")
      + round(col("value") * 1000).cast("long") * 600000L).as("e"))

  /** The sweep core over (user_id, event_id, s, e) spans — factored so
    * the spec can drive planted overlap/containment/touching cases. */
  private[graft] def coverageOfSpans(spans: DataFrame): DataFrame = {
    val prior = Window.partitionBy("user_id").orderBy("s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    spans.withColumn("cm", max("e").over(prior))
      .withColumn("contrib",
        when(col("cm").isNull, col("e") - col("s"))
          .otherwise(greatest(col("e") - greatest(col("s"), col("cm")), lit(0L))))
      .withColumn("nc",
        when(col("cm").isNull || col("cm") < col("s"), 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("nc").as("n_components"),
        sum("contrib").as("covered_us"))
      .orderBy("user_id")
  }

  val intervalCoverageSql: String =
    """WITH i AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |         epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 600000 AS e
      |  FROM events),
      |m AS (SELECT user_id, s, e,
      |        MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
      |      FROM i),
      |c AS (SELECT user_id,
      |        CASE WHEN cm IS NULL THEN e - s
      |             ELSE GREATEST(e - GREATEST(s, cm), 0) END AS contrib,
      |        CASE WHEN cm IS NULL OR cm < s THEN 1 ELSE 0 END AS nc
      |      FROM m)
      |SELECT user_id, COUNT(*) AS n_spans,
      |       CAST(SUM(nc) AS BIGINT) AS n_components,
      |       CAST(SUM(contrib) AS BIGINT) AS covered_us
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q238: per-brand revenue trend (exact OLS slope) ---------------
  // The "is this segment growing or shrinking" primitive every
  // analytics layer ships: ordinary-least-squares slope of daily
  // revenue against the day index, per part brand. The normal-equation
  // slope (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) is computed ENTIRELY in
  // DECIMAL(38,0)/HUGEINT from integer day indexes and the q216
  // 10⁻⁴-cent revenue channel, emitted as integer ppm — both engines
  // share every intermediate bit, where a float OLS would diverge in
  // the last ulp on the big products. Translation-invariance of the
  // slope means no need to re-center x (the raw epoch-day products
  // stay far inside 38 digits at any sf here).
  //
  // Shape at scale: one broadcast dim join, one (brand, day) grouped
  // aggregate (map-side combinable), then a |brands|-row moment
  // aggregate — nothing after the first shuffle is data-sized.
  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("x"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) * 10000)
        .cast("decimal(38,0)").as("y"))
    olsSlopePpm(daily)
  }

  /** Exact OLS slope (ppm) per brand over (brand, x: long, y: decimal)
    * observation rows — factored so the spec can plant exact lines. */
  private[graft] def olsSlopePpm(daily: DataFrame): DataFrame = {
    daily.groupBy("brand").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)")
          .as("sxy"))
      .filter(col("n") > 1)
      .select(col("brand"), col("n").as("n_days"),
        call_function("div",
          (col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx") * col("sy")) * lit(1000000L).cast("decimal(38,0)"),
          col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx"))
          .cast("long").as("slope_ppm"))
      .orderBy("brand")
  }

  val revenueTrendSql: String =
    """WITH d AS (
      |  SELECT p.p_brand AS brand,
      |         CAST(date_diff('day', DATE '1970-01-01',
      |                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS x,
      |         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000
      |              AS HUGEINT) AS y
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |s AS (SELECT brand, COUNT(*) AS n,
      |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(y) AS sy,
      |        SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
      |        SUM(CAST(x AS HUGEINT) * y) AS sxy
      |      FROM d GROUP BY 1)
      |SELECT brand, CAST(n AS BIGINT) AS n_days,
      |       CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
      |            AS BIGINT) AS slope_ppm
      |FROM s WHERE n > 1 ORDER BY brand""".stripMargin

  // ---- q241: AR(1) autoregression of daily revenue -------------------
  // Mean-reversion vs momentum audit: the lag-1 autoregression
  // coefficient of the daily-revenue series — OLS slope of x_{t+1} on
  // x_t over consecutive OBSERVED days (the lag is the previous
  // observed day, not calendar-day-minus-one; calendar gap handling is
  // q85's gap-fill, composable upstream). Negative = mean-reverting,
  // positive = momentum. Reuses q238's exact DECIMAL moment engine on
  // the lagged pairs, so the coefficient is integer-ppm exact.
  // Magnitude bound: n·Σx² ≈ days·(daily cents)² stays inside 38
  // digits up to ~sf100 here; a larger deployment would re-center x
  // first (slope is translation-invariant).
  //
  // Shape at scale: the only full-data pass is the daily aggregate;
  // the lag window and moments run over the |days|-sized frame (the
  // module-header PRE-AGGREGATED-window pattern).
  def ar1DailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
        .cast("long").as("day"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,4)")) * 10000)
        .cast("decimal(38,0)").as("cents"))
    val pairs = daily
      .withColumn("x", lag("cents", 1).over(Window.orderBy("day")))
      .filter(col("x").isNotNull)
      .select(col("x").cast("decimal(38,0)").as("x"), col("cents").as("yd"))
    // q238's moment engine expects (brand, x: long, y: decimal); here x
    // is decimal too, so inline the same normal-equation moments
    pairs.agg(
        count(lit(1)).as("n"),
        sum("x").cast("decimal(38,0)").as("sx"),
        sum("yd").cast("decimal(38,0)").as("sy"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("x") * col("yd")).cast("decimal(38,0)").as("sxy"))
      .select(col("n").as("n_pairs"),
        call_function("div",
          (col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx") * col("sy")) * lit(1000000L).cast("decimal(38,0)"),
          col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx"))
          .cast("long").as("ar1_ppm"))
  }

  val ar1DailyRevenueSql: String =
    """WITH d AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01',
      |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
      |              AS HUGEINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |p AS (SELECT lag(cents) OVER (ORDER BY day) AS x, cents AS y FROM d),
      |s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |        SUM(x * x) AS sxx, SUM(x * y) AS sxy
      |      FROM p WHERE x IS NOT NULL)
      |SELECT CAST(n AS BIGINT) AS n_pairs,
      |       CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
      |            AS BIGINT) AS ar1_ppm
      |FROM s""".stripMargin

  // ---- q262: autocorrelation panel (lags 1..7) of daily volume -------
  // q241 measures ONE lag; periodicity detection needs the panel — a
  // weekly cycle shows as the lag-7 coefficient towering over lags
  // 1..6. Per lag, the Pearson correlation of (x_t, x_{t+L}) over
  // consecutive OBSERVED-day ranks; correlation needs a square root,
  // so the channel carries q255's signed SQUARED correlation in ppm
  // (sign(num)·num²·10⁶ div (d1·d2)), exact in DECIMAL(38,0). The
  // seven lagged frames come from ONE equi-join: the day frame cross
  // a broadcast 7-row lag dim, matched on rank+lag — no per-lag pass,
  // no non-equi band join.
  //
  // Shape at scale: one full-data grouped aggregate; the lag join and
  // moments run on the 7·|days| pre-aggregated frame.
  def acfPanel(spark: SparkSession, dir: String): DataFrame =
    acfOf(Tables.events(spark, dir)
      .select(expr("ts_ns div 1000 div 86400000000").as("day")), 7)

  /** Core over (day) observation rows — factored so the spec can plant
    * an exact period-3 series (lags 3,6 at +1e6 ppm; others negative). */
  private[graft] def acfOf(t: DataFrame, maxLag: Int): DataFrame = {
    val d = t.groupBy("day").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      .localCheckpoint(true) // feeds both sides of the lag join
    val lags = d.sparkSession.range(1, maxLag + 1).toDF("lag")
    val pairs = d.select(col("rn"), col("cnt").as("x"))
      .crossJoin(broadcast(lags))
      .join(d.select(col("rn").as("rn2"), col("cnt").as("y")),
        col("rn2") === col("rn") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      .select(col("lag"), col("n").cast("long").as("n_pairs"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("d1"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("d2"))
      .select(col("lag"), col("n_pairs"),
        (signum(col("num")).cast("long") *
          expr("cast(num * num * 1000000 div (d1 * d2) as bigint)"))
          .as("acf2_ppm"))
      .orderBy("lag")
  }

  val acfPanelSql: String =
    """WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |           FROM events),
      |d AS (SELECT day, COUNT(*) AS cnt FROM e GROUP BY 1),
      |i AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
      |l AS (SELECT CAST(unnest([1,2,3,4,5,6,7]) AS BIGINT) AS lag),
      |p AS (SELECT l.lag, a.cnt AS x, b.cnt AS y
      |      FROM i a CROSS JOIN l JOIN i b ON b.rn = a.rn + l.lag),
      |s AS (SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
      |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |        SUM(CAST(y AS HUGEINT) * y) AS syy,
      |        SUM(CAST(x AS HUGEINT) * y) AS sxy
      |      FROM p GROUP BY 1),
      |c AS (SELECT lag, n, n * sxy - sx * sy AS num,
      |             n * sxx - sx * sx AS d1, n * syy - sy * sy AS d2
      |      FROM s)
      |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
      |       CAST(CASE WHEN num >= 0 THEN num * num * 1000000 // (d1 * d2)
      |            ELSE -(num * num * 1000000 // (d1 * d2)) END
      |            AS BIGINT) AS acf2_ppm
      |FROM c ORDER BY lag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_seasonal_outliers" -> (seasonalOutliers _),
    "q209_locf_impute"       -> (locfImpute _),
    "q205_running_balance"   -> (runningBalance _),
    "q206_session_funnel"    -> (sessionFunnel _),
    "q207_gap_quantiles"     -> (gapQuantiles _),
    "q202_conversion_funnel" -> (conversionFunnel _),
    "q203_retention_cohorts" -> (retentionCohorts _),
    "q204_event_transitions" -> (eventTransitions _),
    "q280_markov_stationary" -> (markovStationary _),
    "q283_twap_by_type"  -> (twapByType _),
    "q284_active_users"  -> (activeUsers _),
    "q290_type_cooccurrence" -> (typeCooccurrence _),
    "q291_reciprocity"   -> (transitionReciprocity _),
    "q292_sorted_neighbors" -> (sortedNeighborPairs _),
    "q293_entry_paths"   -> (entryPaths _),
    "q294_temporal_split" -> (temporalSplitAudit _),
    "q298_growth_accounting" -> (growthAccounting _),
    "q303_dwell_matrix"  -> (dwellMatrix _),
    "q307_prefix_compression" -> (prefixCompression _),
    "q183_ohlc_bars"     -> (ohlcBars _),
    "q139_rate_cap"      -> (rateCap _),
    "q84_quartiles"      -> (quartiles _),
    "q85_gapfill_daily"  -> (gapFillDaily _),
    "q86_rolling_7d"     -> (rollingRevenue7d _),
    "q87_scd2_history"   -> (scd2History _),
    "q88_edit1_pairs"    -> (edit1NamePairs _),
    "q89_kanonymity"     -> (kAnonymityAudit _),
    "q97_spike_days"     -> (spikeDays _),
    "q98_top_per_group"  -> (topPartsPerFlag _),
    "q104_gaps_islands"  -> (gapsAndIslands _),
    "q108_rolling_users" -> (rollingActiveUsers _),
    "q236_interval_coverage" -> (intervalCoverage _),
    "q238_revenue_trend" -> (revenueTrend _),
    "q241_ar1_revenue"   -> (ar1DailyRevenue _),
    "q262_acf_panel"     -> (acfPanel _),
    "q264_ldiversity"    -> (lDiversityAudit _),
    "q269_seasonal_decompose" -> (seasonalDecompose _),
    "q270_cohort_ltv"    -> (cohortLtv _))

  val oracles: Map[String, String] = Map(
    "q216_seasonal_outliers" -> seasonalOutliersSql,
    "q209_locf_impute"       -> locfImputeSql,
    "q205_running_balance"   -> runningBalanceSql,
    "q206_session_funnel"    -> sessionFunnelSql,
    "q207_gap_quantiles"     -> gapQuantilesSql,
    "q202_conversion_funnel" -> conversionFunnelSql,
    "q203_retention_cohorts" -> retentionCohortsSql,
    "q204_event_transitions" -> eventTransitionsSql,
    "q280_markov_stationary" -> markovStationarySql,
    "q283_twap_by_type"  -> twapByTypeSql,
    "q284_active_users"  -> activeUsersSql,
    "q290_type_cooccurrence" -> typeCooccurrenceSql,
    "q291_reciprocity"   -> transitionReciprocitySql,
    "q292_sorted_neighbors" -> sortedNeighborPairsSql,
    "q293_entry_paths"   -> entryPathsSql,
    "q294_temporal_split" -> temporalSplitAuditSql,
    "q298_growth_accounting" -> growthAccountingSql,
    "q303_dwell_matrix"  -> dwellMatrixSql,
    "q307_prefix_compression" -> prefixCompressionSql,
    "q183_ohlc_bars"     -> ohlcBarsSql,
    "q139_rate_cap"      -> rateCapSql,
    "q84_quartiles"      -> quartilesSql,
    "q85_gapfill_daily"  -> gapFillDailySql,
    "q86_rolling_7d"     -> rollingRevenue7dSql,
    "q87_scd2_history"   -> scd2HistorySql,
    "q88_edit1_pairs"    -> edit1NamePairsSql,
    "q89_kanonymity"     -> kAnonymityAuditSql,
    "q97_spike_days"     -> spikeDaysSql,
    "q98_top_per_group"  -> topPartsPerFlagSql,
    "q104_gaps_islands"  -> gapsAndIslandsSql,
    "q108_rolling_users" -> rollingActiveUsersSql,
    "q236_interval_coverage" -> intervalCoverageSql,
    "q238_revenue_trend" -> revenueTrendSql,
    "q241_ar1_revenue"   -> ar1DailyRevenueSql,
    "q262_acf_panel"     -> acfPanelSql,
    "q264_ldiversity"    -> lDiversityAuditSql,
    "q269_seasonal_decompose" -> seasonalDecomposeSql,
    "q270_cohort_ltv"    -> cohortLtvSql)
}
