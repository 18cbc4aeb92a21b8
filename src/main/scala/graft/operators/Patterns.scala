package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 continuation batch (beyond-parity, LLM-pipeline block):
  * sequential-pattern mining over event streams (q232), first-occurrence
  * n-gram novelty scoring (q233), and bipartite HITS authority scoring
  * over the purchase graph (q234). Reference scope: none — like
  * `Mining`, these are curation/analytics operators a training-data
  * pipeline layers on top of the reference's retail analytics. All
  * integer-exact against the DuckDB oracles.
  */
object Patterns {

  // ---- q232: frequent contiguous event 3-sequences (GSP-style) -------
  // The temporal sibling of q214's A-Priori 3-itemsets: which ordered
  // CONTIGUOUS event-type trigrams (a then b then c, adjacent under the
  // per-user (us, event_id) total order) occur for at least 5% of
  // users. Support is DISTINCT USERS (a user looping a>b>c a hundred
  // times counts once) — the GSP convention, and the one that makes
  // support anti-monotone for contiguous subsequences: a user stream
  // containing trigram (a,b,c) contiguously contains bigrams (a,b) and
  // (b,c) contiguously, so support(abc) <= min(support(ab),
  // support(bc)). That inequality is the level-wise prune: trigram
  // candidates are semi-joined against the frequent-bigram set BEFORE
  // the expensive distinct+count, exactly like A-Priori's L2 gate
  // (PropertySpec-style law in PatternsSpec: pruned == unpruned).
  //
  // Shape at scale: one per-user window (lead x2, user-sized
  // partitions), two map-side-combinable distinct+count aggregates
  // (bigram, trigram), and a broadcast semi-join against the
  // frequent-bigram set (bounded by |types|^2, never corpus-sized).
  // The prune is what matters when the alphabet is large (page URLs,
  // product ids): candidate trigrams collapse from |types|^3 to
  // extensions of surviving bigrams. All thresholds integer
  // cross-multiplied (support*20 >= n_users), ppm emitted via div.
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val tri = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("b", lead("event_type", 1).over(w))
      .withColumn("c", lead("event_type", 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .withColumnRenamed("event_type", "a")
      .localCheckpoint(true) // feeds bigram support AND trigram support
    // n_users over the same frame (users with >= 3 events can support
    // a trigram; the DENOMINATOR is all users, the GSP convention)
    val nUsers = Tables.events(spark, dir)
      .select(countDistinct("user_id")).first().getLong(0)
    // L2: frequent contiguous bigrams by distinct-user support
    val big = tri.select(col("user_id"), col("a"), col("b"))
      .union(tri.select(col("user_id"), col("b"), col("c")))
      .distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("s2"))
      .filter(col("s2") * 20 >= nUsers)
      .select(col("a").as("fa"), col("b").as("fb"))
    // candidate trigrams: both constituent bigrams frequent (A-Priori
    // gate) — broadcast semi-joins, then the distinct-user count
    tri
      .join(broadcast(big),
        col("a") === col("fa") && col("b") === col("fb"), "left_semi")
      .join(broadcast(big.select(col("fa").as("ga"), col("fb").as("gb"))),
        col("b") === col("ga") && col("c") === col("gb"), "left_semi")
      .select("user_id", "a", "b", "c").distinct()
      .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
      .filter(col("support") * 20 >= nUsers)
      .select(
        concat_ws(">", col("a"), col("b"), col("c")).as("seq"),
        col("support"),
        expr(s"support * 1000000 div ${nUsers}L").as("support_ppm"))
      .orderBy(col("support").desc, col("seq"))
  }

  val seqPatternsSql: String =
    """WITH n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
      |o AS (SELECT user_id, event_type AS a,
      |        lead(event_type, 1) OVER w AS b,
      |        lead(event_type, 2) OVER w AS c
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |t AS (SELECT DISTINCT user_id, a, b, c
      |      FROM o WHERE b IS NOT NULL AND c IS NOT NULL),
      |s AS (SELECT a, b, c, COUNT(*) AS support FROM t GROUP BY 1, 2, 3)
      |SELECT a || '>' || b || '>' || c AS seq,
      |       CAST(support AS BIGINT) AS support,
      |       CAST(support * 1000000 // nu AS BIGINT) AS support_ppm
      |FROM s, n WHERE support * 20 >= nu
      |ORDER BY support DESC, seq""".stripMargin

  // ---- q233: first-occurrence n-gram novelty per source --------------
  // Data-pruning's complement to q163's decontamination: for each
  // document, what fraction of its distinct 8-token windows occurs
  // FIRST in this document (global min doc_id over the gram), i.e. how
  // much text the doc contributes that the corpus (in doc_id order)
  // has not already seen. Sources full of boilerplate/syndication
  // score low; sources of fresh text score high — the per-source
  // aggregate is a mixture-planning input (keep high-novelty sources,
  // down-weight templated ones). Same tokenizer + md5 window key as
  // q162/q163 so all three gram operators share one spine.
  //
  // Shape at scale: gram explosion is embarrassingly parallel; the
  // first-occurrence attribution is ONE window min over the gram key
  // (a single shuffle on wk — no self-join), then a doc-sized
  // aggregate and a source-sized rollup, both map-side combinable.
  // Integer ppm via div; no floats anywhere.
  private val NovW = 8

  /** Per-doc (n_grams, n_novel) core — also the ScaleVerify law unit:
    * under replica construction the per-doc stats are a re-keyed copy. */
  private[graft] def noveltyPerDoc(docs: DataFrame): DataFrame = {
    val wins = Curation.windowTable(docs.select("doc_id", "text"), NovW)
    val wk = Window.partitionBy("wk")
    wins
      .withColumn("first_doc", min("doc_id").over(wk))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
  }

  private[graft] def noveltyBySource(docs: DataFrame): DataFrame = {
    noveltyPerDoc(docs).join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").as("n_grams"),
        sum("n_novel").as("n_novel"))
      .select(col("source"), col("n_docs"), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000 div n_grams").as("novelty_ppm"))
      .orderBy("source")
  }

  def novelty(spark: SparkSession, dir: String): DataFrame =
    noveltyBySource(Tables.documents(spark, dir))

  val noveltySql: String =
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |           FROM documents),
       |f AS (SELECT doc_id, toks, len(toks) - ${NovW - 1} AS nw
       |      FROM t WHERE len(toks) >= $NovW),
       |w AS (SELECT DISTINCT doc_id,
       |        md5(array_to_string(toks[i:i+${NovW - 1}], ' ')) AS wk
       |      FROM f, UNNEST(generate_series(1, nw)) AS g(i)),
       |m AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY wk) AS first_doc
       |      FROM w),
       |d AS (SELECT doc_id, COUNT(*) AS n_grams,
       |        SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel
       |      FROM m GROUP BY 1)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       |       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       |       CAST(SUM(n_novel) * 1000000 // SUM(n_grams) AS BIGINT)
       |         AS novelty_ppm
       |FROM d JOIN documents USING (doc_id)
       |GROUP BY 1 ORDER BY source""".stripMargin

  // ---- q234: bipartite HITS authority scoring (purchase graph) -------
  // Kleinberg's HITS (hubs-and-authorities, public literature) on the
  // customer-part bipartite purchase graph, two unrolled unnormalized
  // rounds: auth1(p) = distinct-customer indegree, hub1(c) =
  // sum of auth1 over the customer's parts, auth2(p) = sum of hub1
  // over the part's customers. Unnormalized integer rounds keep every
  // value exact (the q146 PageRank lesson — normalize at READ time,
  // not per round); two rounds already separate "popular part" from
  // "part bought by heavy multi-part buyers", which is the curation
  // signal (an authority bought by hub customers != a one-hit spike).
  //
  // Shape at scale: edge build is one distinct over the fact join;
  // each round is one join + one map-side-combinable sum where the
  // score side is KEY-DOMAIN sized (|parts| or |customers|, broadcast
  // under AQE) and only the edge table is big — per-round shuffle
  // O(V) not O(E), the same layout argument as q179. Products ride
  // the DECIMAL(38,0) channel with the q230 guarded int64 emit.
  def hitsAuthority(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    hitsFromEdges(e)
  }

  /** Two unrolled HITS rounds over (c, p) edge pairs (need not be
    * pre-deduplicated); top-20 authorities. Factored so the spec can
    * drive a planted bipartite graph with a closed-form answer. */
  private[graft] def hitsFromEdges(edges: DataFrame): DataFrame = {
    val e = edges.distinct()
      .localCheckpoint(true) // consumed by all three rounds
    val a1 = e.groupBy("p")
      .agg(count(lit(1)).cast("decimal(38,0)").as("a1"))
    val h1 = e.join(a1, "p").groupBy("c").agg(sum("a1").as("h1"))
    val a2 = e.join(h1, "c").groupBy("p").agg(sum("h1").as("a2"))
    def guarded(cn: org.apache.spark.sql.Column, label: String) =
      when(cn > lit(Long.MaxValue).cast("decimal(38,0)"),
        raise_error(concat(lit(s"q234 $label exceeds int64: "),
          cn.cast("string"))).cast("long"))
        .otherwise(cn.cast("long"))
    a2.join(a1, "p")
      .select(col("p").as("p_partkey"),
        guarded(col("a1"), "auth1").as("auth1"),
        guarded(col("a2"), "auth2").as("auth2"))
      .orderBy(col("auth2").desc, col("p_partkey"))
      .limit(20)
  }

  val hitsAuthoritySql: String =
    """WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |a1 AS (SELECT p, CAST(COUNT(*) AS HUGEINT) AS a1 FROM e GROUP BY 1),
      |h1 AS (SELECT c, SUM(a1) AS h1 FROM e JOIN a1 USING (p) GROUP BY 1),
      |a2 AS (SELECT p, SUM(h1) AS a2 FROM e JOIN h1 USING (c) GROUP BY 1)
      |SELECT p AS p_partkey, CAST(a1 AS BIGINT) AS auth1,
      |       CAST(a2 AS BIGINT) AS auth2
      |FROM a2 JOIN a1 USING (p)
      |ORDER BY a2 DESC, p LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q232_seq_patterns" -> (seqPatterns _),
    "q233_novelty"      -> (novelty _),
    "q234_hits"         -> (hitsAuthority _))

  val oracles: Map[String, String] = Map(
    "q232_seq_patterns" -> seqPatternsSql,
    "q233_novelty"      -> noveltySql,
    "q234_hits"         -> hitsAuthoritySql)
}
