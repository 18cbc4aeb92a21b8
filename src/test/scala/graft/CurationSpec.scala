package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Brute-force re-derivations of the round-8 Curation operators on the
  * sf0.001 corpus: every assertion recomputes the expected answer with
  * plain Scala collections from the raw text, so a regression in the
  * window/rank/batch plumbing cannot hide behind a matching oracle
  * (the oracle shares SQL-ish structure; this path shares nothing). */
class CurationSpec extends SparkSpec {

  private def toks(text: String): Vector[String] =
    raw"[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector

  private lazy val corpus: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq

  private def windows(text: String, w: Int): Set[String] =
    toks(text).sliding(w).filter(_.length == w).map(_.mkString(" ")).toSet

  test("q162 sharedSubstring: re-derives from brute-force window sets") {
    val perDoc = corpus.map { case (id, t) => id -> windows(t, 20) }
    val docFreq = perDoc.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val want = perDoc.filter(_._2.nonEmpty).flatMap { case (id, ws) =>
      val shared = ws.count(docFreq(_) >= 2)
      if (shared > 0) Some((id, ws.size.toLong, shared.toLong)) else None
    }.toSet
    val got = Curation.sharedSubstring(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "seeded corpus must contain shared 20-token spans")
    assert(got === want)
  }

  test("q162 xxhash64 and rolling-hash lanes agree with the md5 gate lane") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val md5Res = Curation.sharedSubstring(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val xxRes = Curation.sharedSubstringOn(docs, key = s => xxhash64(s))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(xxRes === md5Res)
    // production lane: TokenWindowHash (rolling polynomial, no window
    // strings) — identical doc-level stats, 64-bit-collision odds aside
    val fastRes = Curation.sharedSubstringFastOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fastRes === md5Res)
  }

  test("TokenWindowHash: rolling update equals direct polynomial on random arrays") {
    // law: for random token arrays, the distinct-key SET from the
    // rolling path must equal hashing each window independently (the
    // subtract-multiply-add eviction is exactly invertible because the
    // base is odd). Distinctness and first-occurrence order also match
    // array_distinct semantics.
    val rnd = new scala.util.Random(7)
    (1 to 30).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val w = 1 + rnd.nextInt(8)
      val toksArr = Array.fill(n)("t" + rnd.nextInt(6)) // forced repeats
      val data = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toksArr.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)
          .asInstanceOf[Any]))
      val got = graft.plans.TokenWindowHash.compute(data, w)
        .toLongArray().toSeq
      if (n < w) assert(got.isEmpty)
      else {
        val direct = toksArr.toSeq.sliding(w).filter(_.length == w).map { win =>
          win.foldLeft(0L)((h, t) => h * 0x100000001B3L +
            graft.plans.TokenWindowHash.mixForTest(
              graft.plans.RollingHash.hash(
                org.apache.spark.unsafe.types.UTF8String.fromString(t))))
        }.toSeq.distinct
        assert(got === direct)
      }
    }
  }

  test("q163 ngramOverlap: re-derives from brute-force 8-gram sets") {
    val perDoc = corpus.map { case (id, t) => id -> windows(t, 8) }
    val bench = perDoc.filter(_._1 % 10 == 0).flatMap(_._2).toSet
    val want = perDoc.filter { case (id, ws) => id % 10 != 0 && ws.nonEmpty }
      .flatMap { case (id, ws) =>
        val hit = ws.count(bench.contains)
        if (hit > 0)
          Some((id, ws.size.toLong, hit.toLong, hit.toLong * 1000 / ws.size))
        else None
      }.toSet
    val got = Curation.ngramOverlap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.nonEmpty, "benchmark split must contaminate some training docs")
    assert(got === want)
  }

  test("q164 exactQuantiles: re-derives from a driver-side sort") {
    val tcs = corpus.map { case (id, t) => (toks(t).length.toLong, id) }
      .sortBy(identity).map(_._1).toVector
    val n = tcs.length.toLong
    val want = Seq(25L, 50L, 75L, 90L, 99L).map { p =>
      s"p$p" -> tcs((math.max(1L, (p * n + 99) / 100) - 1).toInt)
    }.toSet
    val got = Curation.exactQuantiles(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("q165 paddingWaste: re-derives both strategies; sorted beats hash order") {
    def hex32(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val withTc = corpus.map { case (id, t) => (id, toks(t).length.toLong) }
    def wasteOf(ordered: Seq[Long]): (Long, Long, Long) = {
      val batches = ordered.grouped(32).toSeq
      val pad = batches.map(b => b.max * b.length - b.sum).sum
      val tok = ordered.sum
      (batches.length.toLong, tok, pad)
    }
    val sorted = wasteOf(withTc.sortBy { case (id, tc) => (-tc, id) }.map(_._2))
    val hashed = wasteOf(withTc.sortBy { case (id, _) => (hex32(id), id) }.map(_._2))
    val want = Set(
      ("sorted", sorted._1, sorted._2, sorted._3,
        sorted._3 * 1000 / (sorted._3 + sorted._2)),
      ("hash", hashed._1, hashed._2, hashed._3,
        hashed._3 * 1000 / (hashed._3 + hashed._2)))
    val got = Curation.paddingWaste(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want)
    assert(sorted._3 < hashed._3,
      "length-sorted batching must waste less padding than hash order")
  }

  test("q166 lshHistogram law: mass at band >= 5 equals the q22 pair count") {
    // floor(10c/u) >= 5 iff c/u >= 0.5 exactly (integer arithmetic),
    // so the histogram's upper mass must equal the thresholded pairs
    // lane — same candidates, same verify join, different tail.
    val hist = graft.operators.Llm.lshHistogram(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nPairs = graft.operators.Llm.minhashPairs(spark, sf).count()
    assert(hist.nonEmpty)
    assert(hist.filter(_._1 >= 5).values.sum === nPairs)
  }

  test("q167 sourceLengthProfile: re-derives from driver-side per-source sorts") {
    val bySrc = Tables.documents(spark, sf).select("source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val want = bySrc.flatMap { case (src, rows) =>
      val tcs = rows.map { case (_, id, t) => (toks(t).length.toLong, id) }
        .sortBy(identity).map(_._1).toVector
      val n = tcs.length.toLong
      Seq(50L, 90L).map(p =>
        (src, s"p$p", tcs((math.max(1L, (p * n + 99) / 100) - 1).toInt)))
    }.toSet
    val got = graft.operators.Curation.sourceLengthProfile(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("q162 planted: verbatim span in otherwise-different docs is caught") {
    import spark.implicits._
    val span = (1 to 25).map(i => s"w$i").mkString(" ") // 25 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta " + (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" ") + s" $span"),
      (3L, (1 to 60).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val got = Curation.sharedSubstringOn(docs)
      .collect().map(r => r.getLong(0)).toSet
    assert(got === Set(1L, 2L),
      "exactly the two docs embedding the verbatim 25-token span share windows")
  }

  test("q172 curatedWrite: re-run is idempotent (epoch-sink rule)") {
    val root = s"/tmp/graft_curated_spec_${spark.sparkContext.applicationId}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    try {
      val packed = Curation.packedCurated(Tables.documents(spark, sf))
        .localCheckpoint(true)
      val v1 = Curation.writeCuratedVersion(packed, root)
      val fp1 = Curation.curatedFingerprint(
        Curation.readCuratedSnapshot(spark, root)).collect().toSeq
      val v2 = Curation.writeCuratedVersion(packed, root)
      val fp2 = Curation.curatedFingerprint(
        Curation.readCuratedSnapshot(spark, root)).collect().toSeq
      assert(v1 === 1 && v2 === 2, "each write lands a new manifest version")
      assert(fp1.map(_.toSeq) === fp2.map(_.toSeq),
        "re-running the write must reproduce the identical corpus fingerprint")
      assert(fp1.nonEmpty && fp1.map(_.getLong(1)).sum > 0,
        "the curated corpus is non-empty")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("q267 PSI: a shifted source scores far above a matched one") {
    import spark.implicits._
    // 200 docs in two sources; U mirrors the global length profile's
    // lower half, S the upper half -> both are fully shifted vs the
    // corpus mixture; then a third source M that SAMPLES the whole
    // range uniformly must sit near zero
    val rows =
      (1 to 100).map(i => (i.toLong, "U", i.toLong)) ++
      (1 to 100).map(i => (100L + i, "S", 900L + i)) ++
      (1 to 100).map(i => (200L + i, "M",
        if (i % 2 == 0) i.toLong else 900L + i))
    val psi = graft.operators.Curation.psiDriftOf(
      rows.toDF("doc_id", "source", "n_chars")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi")).toMap
    assert(psi.keySet === Set("U", "S", "M"))
    assert(psi("M") < 0.3, s"mixed source should be near zero, got ${psi("M")}")
    assert(psi("U") > 2 * psi("M") && psi("S") > 2 * psi("M"),
      s"shifted sources must dominate: $psi")
    psi.values.foreach(v => assert(!v.isNaN && !v.isInfinite))
  }
}
