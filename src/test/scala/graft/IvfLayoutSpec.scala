package graft

import graft.operators.Similarity
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** The persisted IVF layout must (a) return exactly what the in-memory
  * IVF path returns and (b) physically read only the probed cells'
  * files — partition pruning is the point of the layout. */
class IvfLayoutSpec extends SparkSpec {

  test("ivfTopKFromLayout equals ivfTopKWith and reads only probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val c = emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("cv"))
    // deterministic sampled centroids (the q34 oracle's construction)
    val centroids = c.orderBy("vec_id").limit(16)
      .select(col("vec_id").cast("int").as("cell"), col("cv").as("centroid"))
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 8)

    val path = "/tmp/graft_ivf_layout"
    Warehouse.writeIvfLayout(Similarity.ivfAssign(c, centroids), path)

    val fromLayout = Similarity
      .ivfTopKFromLayout(spark, path, queries, centroids, k = 5, nProbe = 3)
    val inMemory = Similarity.ivfTopKWith(queries, c, centroids, k = 5, nProbe = 3)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "vec_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(rows(fromLayout) === rows(inMemory))

    // physical read only touches cell=<probed> directories
    val probed = Similarity.ivfProbes(queries, centroids, nProbe = 3)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(probed.size < 16, "fixture must actually prune")
    val filesRead = spark.read.parquet(path)
      .filter(col("cell").isin(probed.toSeq.map(Int.box): _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty)
    val cellOfFile = "cell=(\\d+)".r
    val cellsTouched = filesRead.flatMap(f =>
      cellOfFile.findFirstMatchIn(f).map(_.group(1).toInt)).toSet
    assert(cellsTouched === probed,
      s"scan touched $cellsTouched but probes were $probed")
  }

  test("ivfBuildKMeans end-to-end: sampled training, hierarchical assign, layout probe recall") {
    val emb = Tables.embeddings(spark, sf)
    // targetCellSize 4 on the 500-vector corpus -> 125 cells: exercises
    // the hierarchical (>64 cells) assignment path end to end
    val (assigned, centroids) = Similarity.ivfBuildKMeans(
      emb, targetCellSize = 4, trainPerCell = 8)
    assert(centroids.count() === 125)
    // every vector lands in exactly one existing cell
    assert(assigned.count() === emb.count())
    assert(assigned.select("cell").distinct()
      .join(centroids.select("cell"), Seq("cell"), "left_anti").count() === 0)

    val path = "/tmp/graft_ivf_kmeans_layout"
    Warehouse.writeIvfLayout(assigned, path)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.ivfTopKFromLayout(spark, path, queries, centroids,
      k = 5, nProbe = 25)
    val brute = Similarity.bruteForceTopK(queries, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect hits).size.toDouble / brute.size
    // 25 of 125 cells probed (20% of the corpus scanned): clustered
    // cells must beat the random-scan baseline by a wide margin
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("appendIvfLayout: standing files untouched; probe == full rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0)
    def cv(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("cv"))
    val cBase = cv(base).localCheckpoint(true)
    val centroids = cBase.orderBy("vec_id").limit(16)
      .select(col("vec_id").cast("int").as("cell"), col("cv").as("centroid"))
      .localCheckpoint(true)

    val aPath = "/tmp/graft_ivf_append_spec"
    Warehouse.writeIvfLayout(Similarity.ivfAssign(cBase, centroids), aPath)
    def files(p: String): Map[String, Long] = {
      val root = new java.io.File(p)
      org.apache.commons.io.FileUtils
        .listFiles(root, Array("parquet"), true).toArray
        .map(_.asInstanceOf[java.io.File])
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = files(aPath)
    Warehouse.appendIvfLayout(Similarity.ivfAssign(cv(fresh), centroids), aPath)
    val after = files(aPath)
    // append-only: every standing file survives byte-stable, new files add
    assert(before.keySet.subsetOf(after.keySet))
    before.foreach { case (f, m) => assert(after(f) === m, s"rewrote $f") }
    assert(after.size > before.size)

    val rPath = "/tmp/graft_ivf_rebuild_spec"
    Warehouse.writeIvfLayout(
      Similarity.ivfAssign(cv(emb), centroids), rPath)
    val queries = emb.filter(col("vec_id") < 8)
    def topk(p: String) = Similarity
      .ivfTopKFromLayout(spark, p, queries, centroids, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(topk(aPath) === topk(rPath),
      "frozen-quantizer append must equal the full rebuild")
  }
}
