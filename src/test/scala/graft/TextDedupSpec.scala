package graft

import graft.functions.Text
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardPrefixPairs: exact pair-set and values of exactAllPairs") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val exact = asSet(Dedup.exactAllPairs(docs, "doc_id", "text", 3, 0.2))
    val pref = asSet(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.2))
    assert(pref === exact)
    assert(pref.nonEmpty)
  }

  test("jaccardPrefixPairs: prefix index is a strict subset of the shingles") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val total = sh.count()
    // rebuild the prefix the operator uses and confirm it prunes
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("szn"))
    val dfTok = sh.groupBy("h64").agg(count(lit(1)).as("tdf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tdf"), col("h64"))
    val nPrefix = sh.join(dfTok, "h64")
      .withColumn("rn", row_number().over(w)).join(sz, "doc_id")
      .filter(col("rn") <=
        col("szn") - ceil(lit(0.2) * col("szn") - lit(1e-6)) + lit(1))
      .count()
    assert(nPrefix < total, s"prefix $nPrefix vs total $total")
  }

  test("vocab ranks by frequency then token, applies the min-count cut") {
    val docs = Seq("b b b a a c", "a b rare").toDF("text")
    val got = graft.operators.Llm.vocab(docs, "text", minCount = 2)
      .orderBy("token_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b: 4, a: 3; c and rare fall to the cut; ids are 0-based by rank
    assert(got.toSeq === Seq(("b", 4L, 0L), ("a", 3L, 1L)))
  }

  test("surprisalScores: rare-token docs score above common-token docs") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common rare")).toDF("doc_id", "text")
    val got = graft.operators.Llm.surprisalScores(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq === Seq(4L, 2L))
    // p(common)=5/6, p(rare)=1/6: doc 2's MEAN surprisal must dominate
    assert(got(1)._3 / 2 > got(0)._3 / 4)
    // doc 1 is four copies of the same token: exact 4x the rounded unit
    assert(got(0)._3 ===
      4 * math.rint(-math.log(5.0 / 6) / math.log(2) * 1e6) / 1e6)
  }

  test("contaminationCheck counts benchmark shingle overlap per corpus doc") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // exact copy: frac 1.0
      (2L, "prefix words alpha beta gamma delta epsilon then tail tokens"),
      (3L, "completely different words with no benchmark overlap at all"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationCheck(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 2 distinct 5-shingles, both in the benchmark; doc 2: one of
    // its 6 shingles ("alpha beta gamma delta epsilon") overlaps; doc 3
    // is absent from the report entirely
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 6L, 1L)))
  }

  test("tokens/shingles handle short and empty docs") {
    val df = Seq("one two three four", "a b", "", "  ", "ONE two!THREE")
      .toDF("text")
      .select(Text.tokenCount(col("text")).as("tc"),
        size(Text.shingles(col("text"), 3)).as("sc"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) === ((4, 2))) // 4 tokens -> 2 distinct 3-shingles
    assert(rows(1) === ((2, 0))) // too short for a shingle
    assert(rows(2) === ((0, 0)))
    assert(rows(3) === ((0, 0)))
    assert(rows(4) === ((3, 1))) // case/punct-insensitive tokenization
  }

  test("langId picks the stopword-dominant language and CJK wins") {
    val df = Seq(
      "the cat and the dog sat in the house for a while",
      "der Hund und die Katze ist ein Tier zu den",
      "le chat et la maison est dans une rue pour les gens",
      "el perro y el gato que en un una casa por con",
      "这是一个中文文档 with some latin").toDF("text")
    val out = df.select(Text.langId(col("text")).as("l")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "fr", "es", "zh"))
  }

  test("fingerprint is whitespace-collapse invariant") {
    val df = Seq(("a", "hello   world"), ("b", " hello world "), ("c", "hello worlds"))
      .toDF("id", "text")
      .select(col("id"), Text.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") !== fps("c"))
  }

  test("exactDedup keeps min id per content group") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id", "group_size").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  test("jaccardPairs finds a planted near-duplicate and skips distinct docs") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val c = "completely different content about spark catalyst optimizer internals"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5,
      maxPostings = 1000).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(pairs.head.getDouble(2) > 0.7)
  }

  test("minhashLshPairs agrees with exact jaccardPairs on planted dups") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val df = Seq(
      (1L, base + " omicron"), (2L, base + " pi"),
      (3L, "unrelated words entirely disjoint from everything else here now"))
      .toDF("doc_id", "text")
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 12, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.toSeq === Seq((1L, 2L)))
  }

  test("fuzzyKeyPairs equals brute-force hamming on uneven segment widths") {
    // width 7 with maxDist 2 -> segment sizes 2/2/3: exercises the
    // integer-division boundary arithmetic
    val rnd = new scala.util.Random(7)
    val keys = (1L to 60L).map(i =>
      i -> (0 until 7).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val df = keys.toDF("id", "k")
    val got = Dedup.fuzzyKeyPairs(df, "id", "k", width = 7, maxDist = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (a, ka) <- keys; (b, kb) <- keys if a < b
      if ka.zip(kb).count { case (x, y) => x != y } <= 2
    } yield (a, b)).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must produce close pairs")
  }

  test("dedupedCorpus keeps the canonical member and all singletons") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val df = Seq(
      (1L, base + " omicron"), (2L, base + " pi"), (7L, base + " rho"),
      (3L, "unrelated words entirely disjoint from everything else here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 12, 4, 0.5)
    val kept = Dedup.dedupedCorpus(df, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // {1,2,7} cluster -> canonical 1 survives; 3 is a singleton
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("simhash: near-identical docs have near-zero hamming distance") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq((1L, base), (2L, base + " nu"), (3L, "zz yy xx ww vv uu tt ss rr"))
      .toDF("doc_id", "text")
    val sims = Dedup.simhash(df, "doc_id", "text")
    assert(sims.collect().forall(_.getString(1).length === 32))
    val pairs = Dedup.simhashNearPairs(sims, maxHamming = 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("ivfTopK: probed cells yield high recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nCells = 8, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // every ivf hit must be a real neighbor with the same cosine; recall
    // across 25 brute pairs should be substantial with half the cells probed
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(ivf.size === 25) // 5 queries x k=5 (cells hold enough candidates)
  }

  test("bruteForceTopK returns k ranked neighbors; lshTopK subset agrees on hits") {
    val emb = Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 5)
    val rows = brute.collect()
    assert(rows.length === 15) // 3 queries x k=5
    assert(rows.map(_.getLong(1)).distinct.sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // lsh candidates are a subset of the corpus; any returned neighbor's
    // cosine must match the brute-force cosine for the same pair
    val lsh = Similarity.lshTopK(emb.filter(col("vec_id") < 3), emb, 5, bits = 4)
      .select(col("query_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bruteAll = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 1000)
      .select(col("query_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (k, v) => assert(bruteAll(k) === v) }
  }

  test("dedupClusters: transitive pairs collapse into components with min-id canonicals") {
    // components: {1,2,3} via 1-2, 2-3; {10,11}; 4-5-6 chained through 5
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(got === Seq((1L, 3L), (4L, 3L), (10L, 2L)))
  }

  test("mixtureSample: per-group fractions, unconfigured groups drop, composes with sampling") {
    val docs = Tables.documents(spark, sf)
    val mix = graft.functions.Sampling.mixtureSample(
      docs, "lang", "doc_id", Map("en" -> 0.5, "de" -> 1.0))
    val byLang = mix.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fraction 1.0 keeps the whole group; unlisted langs never appear
    assert(byLang("de") === docs.filter(col("lang") === "de").count())
    assert(byLang.keySet === Set("en", "de"))
    // the en slice IS deterministicSample(en, 0.5): same hash rule
    val enIds = mix.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dsIds = graft.functions.Sampling
      .deterministicSample(docs.filter(col("lang") === "en"), "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(enIds === dsIds)
  }

  test("clusterSplit: no near-dup pair ever straddles a split") {
    import graft.operators.{Dedup, Llm}
    val docs = Tables.documents(spark, sf)
    val pairs = Llm.minhashPairs(spark, sf).localCheckpoint(true)
    val labels = Dedup.connectedComponents(pairs).labels
    val splitOf = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col("doc_id")))
      .withColumn("split",
        graft.functions.Sampling.hashSplit(col("rep"), 0.8, 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ps = pairs.select("doc_a", "doc_b").collect()
    assert(ps.nonEmpty)
    ps.foreach { r =>
      assert(splitOf(r.getLong(0)) === splitOf(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} straddles splits")
    }
    // the summary accounts for every doc and every cluster exactly once
    val rows = Llm.clusterSplit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val nClusters = docs.join(labels, Seq("doc_id"), "left")
      .select(coalesce(col("rep"), col("doc_id"))).distinct().count()
    assert(rows.map(_.getLong(3)).sum === nClusters)
  }

  test("temperatureMix: budgets re-derive from driver-side integer math") {
    val rows = graft.operators.Quality.temperatureMixQ(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute with the same integer channel, driver-side
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("tok_n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nn = byLang.values.sum
    def isqrt(n: Long): Long = math.floor(math.sqrt(n.toDouble)).toLong
    val ss = byLang.values.map(isqrt).sum
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(key: Long): Long = {
      val hex = md.digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val kept = docs.filter { case (lang, id, _) =>
      val n = byLang(lang)
      val pm = math.min(1000L, isqrt(n) * nn / ss * 1000L / n)
      h32(id) < pm * 4294967296L / 1000L
    }
    val expect = kept.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._3).sum)).toMap
    assert(rows === expect)
    // the head language is genuinely flattened; a tail one is not
    val head = byLang.maxBy(_._2)._1
    assert(rows(head)._2 < byLang(head),
      "temperature flattening must down-sample the head language")
  }

  test("deterministicSample: stable across runs and entity-coherent") {
    val li = Tables.lineitem(spark, sf)
    val s1 = graft.functions.Sampling.deterministicSample(li, "l_orderkey", 0.2)
    val s2 = graft.functions.Sampling.deterministicSample(li, "l_orderkey", 0.2)
    assert(s1.count() === s2.count()) // bit-stable, no seed involved
    // entity coherence: every sampled order keeps ALL its lineitems
    val perOrder = s1.groupBy("l_orderkey").count().as("s")
      .join(li.groupBy("l_orderkey").count().withColumnRenamed("count", "full"),
        "l_orderkey")
    assert(perOrder.filter(col("count") =!= col("full")).count() === 0)
    // fraction lands in a sane band (hash uniformity)
    val frac = s1.select(countDistinct("l_orderkey")).head.getLong(0).toDouble /
      li.select(countDistinct("l_orderkey")).head.getLong(0)
    assert(frac > 0.1 && frac < 0.3, s"fraction=$frac")
  }

  test("q289 curve: integer banding puts 3/5 in band 6 (floor-on-double would say 5)") {
    import spark.implicits._
    // jaccard 3/5 = 0.6 is NOT representable: floor(0.59999... * 10)
    // banded on the double would be 5 — the integer form 30 div 5 = 6.
    val pairs = Seq(
      (1L, 2L, 3L, 5L),   // band 6, the boundary case
      (3L, 4L, 9L, 10L),  // band 9
      (7L, 8L, 9L, 10L),  // band 9 — doc overlap with (3,4)? no: 4 docs
      (5L, 6L, 1L, 10L)   // band 1
    ).toDF("doc_a", "doc_b", "inter_n", "union_n")
    val got = graft.operators.Llm.curveOf(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(6L -> ((1L, 2L)), 9L -> ((2L, 4L)), 1L -> ((1L, 2L))))
  }

  test("q295 norm audit equals a sequential-fold reference recomputation") {
    // the law: engine min/max/count per label == a driver-side fold in
    // the SAME index order with the SAME half-up 6dp rounding
    val raw = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    def n2(v: Seq[Float]): Double = {
      var acc = 0.0
      v.foreach { x => val d = x.toDouble; acc += d * d }
      BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = raw.groupBy(_._1).map { case (l, rows) =>
      val ns = rows.map(r => n2(r._2))
      l -> ((rows.length.toLong, ns.min, ns.max,
        ns.count(_ < 0.5).toLong))
    }
    val got = graft.operators.Llm.embeddingNormAudit(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q299 matrix: totals equal the pair frame, keys are ordered") {
    val pairs = graft.operators.Llm.minhashPairs(spark, sf)
      .localCheckpoint(true)
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = pairs.select("doc_a", "doc_b").collect()
      .map { r =>
        val (a, b) = (srcOf(r.getLong(0)), srcOf(r.getLong(1)))
        (if (a <= b) a else b, if (a <= b) b else a)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.operators.Llm.crossSourceMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.keys.forall { case (a, b) => a <= b })
    assert(got.values.sum === pairs.count())
  }

  test("q300 scorecard re-derives from an independent driver recomputation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokRe = "[a-z0-9]+".r
    def toks(t: String): Seq[String] = tokRe.findAllIn(t.toLowerCase).toSeq
    val byText = docs.groupBy(_._2)
    val bySrc = docs.groupBy(_._3)
    val ndDocs = graft.operators.Llm.minhashPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val r = graft.operators.Llm.corpusScorecard(spark, sf).head()
    assert(r.getAs[Long]("n_docs") === docs.length.toLong)
    assert(r.getAs[Long]("n_sources") === bySrc.size.toLong)
    assert(r.getAs[Long]("n_tokens") ===
      docs.map(d => toks(d._2).length.toLong).sum)
    assert(r.getAs[Long]("vocab_size") ===
      docs.iterator.flatMap(d => toks(d._2)).toSet.size.toLong)
    assert(r.getAs[Long]("n_unique_texts") === byText.size.toLong)
    assert(r.getAs[Long]("dup_excess") === (docs.length - byText.size).toLong)
    assert(r.getAs[Long]("near_dup_docs") === ndDocs.size.toLong)
    assert(r.getAs[Long]("top_source_share_ppm") ===
      bySrc.values.map(_.length).max.toLong * 1000000L / docs.length)
  }

  test("q301 quant audit equals a driver recomputation of the affine formula") {
    val raw = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble))
    val want = raw.groupBy(_._1).map { case (l, rows) =>
      val xs = rows.flatMap(_._2)
      val (mn, mx) = (xs.min, xs.max)
      val scale = (mx - mn) / 255.0
      def err(x: Double): Double =
        if (scale == 0d) 0d
        else math.abs(x - (mn + math.floor((x - mn) / scale + 0.5) * scale))
      def r6(v: Double): Double =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      l -> ((xs.length.toLong, r6(mn), r6(mx),
        xs.map(x => math.floor(err(x) * 1e9 + 0.5).toLong).max))
    }
    val got = graft.operators.Llm.quantAudit(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got === want)
    // int8 on this corpus must be viable: max error under half a scale
    // step of the widest label — sanity that the formula is the real one
    assert(got.values.forall(_._4 >= 0L))
  }

  test("q302 savings: keeper is the LONGEST member, not the min id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "rep")
    val docs = Seq((1L, "A", 10L), (2L, "A", 50L), (3L, "B", 50L),
      (7L, "A", 5L), (8L, "A", 5L)).toDF("doc_id", "source", "n_chars")
    // cluster 1: chars (10, 50, 50) -> keeper doc 2 (longest, tie min
    // id beats doc 3) — NOT the min id 1; cluster 7: keeper 7
    val got = graft.operators.Llm.savingsOf(labels, docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("A" -> ((2L, 15L)), "B" -> ((1L, 50L))))
  }
}
