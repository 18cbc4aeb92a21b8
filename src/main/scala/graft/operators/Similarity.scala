package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]), pure Column expressions end to end.
  *
  * Two paths, same results contract:
  *  - bruteForceTopK: exact. Queries are broadcast (small side), the
  *    corpus streams once — per-partition local top-k via the rank
  *    window after AQE; O(|Q| * |corpus| * dim) FLOPs but zero corpus
  *    shuffle. The correct baseline and the verifier for the ANN path.
  *  - lshTopK: the scale path. Sign-random-projection signatures bucket
  *    the corpus; each query only scores its own bucket's candidates
  *    (probing neighbor buckets via reduced-prefix keys). Recall is
  *    tunable by (bits, probes); at 100 TB this is an equality join on
  *    int keys instead of a cross join.
  *
  * Doubles everywhere (floats cast up before any arithmetic) so results
  * are reproducible across engines; cosine is rounded to 6 places in
  * ranking to absorb last-ulp accumulation differences.
  */
object Similarity {

  /** Float array -> double array. */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Sequential dot product via the codegen'd graft_dot expression (the
    * aggregate/zip_with lambda form runs interpreted per element — see
    * graft.plans.DotProduct). Same index-order accumulation, so values
    * are unchanged. Callers must have registered GraftFunctions (every
    * public method here does). */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.graft_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** Sign-random-projection signature: bit i = sign(v . h_i) where
    * hyperplane h_i has deterministic pseudo-random +-1 entries from
    * xxhash64(i, dim). Cheap (integer hash per (bit, dim)), seedable,
    * and identical on every executor. */
  def srpSignature(vec: Column, bits: Int): Column = {
    val planes = (0 until bits).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, d) =>
          x * when(xxhash64(lit(i), d) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1L << (bits - 1 - i))
    }
    planes.reduce(_ + _)
  }

  /** ANN top-k: candidates share the query's SRP bucket; exact cosine
    * rerank inside the bucket. Smaller `bits` => bigger buckets =>
    * higher recall & cost. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = 8): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket", srpSignature(col("qv"), bits))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", srpSignature(col("cv"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus
    * into cells; each query exactly scores only the `nProbe` cells
    * whose centroids are nearest. The classic FAISS-style recall/cost
    * dial, built from spark.ml KMeans (seeded => deterministic) and the
    * same exact rerank as the brute-force path. At 100 TB the corpus
    * would be written bucketed by cell id so a probe reads only its
    * buckets. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("features", array_to_vector(col("cv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .fit(c.select("features"))
    val assigned = model.transform(c)
      .select(col("vec_id"), col("cv"), col("cn"), col("prediction").as("cell"))

    // centroid table (tiny) -> per-query probe list of nProbe nearest cells
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("cell", "centroid")
    val q = queries.select(col("vec_id").as("query_id"),
        asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", dot(col("qv"), col("centroid")) /
        (col("qn") * norm(col("centroid"))))
      .withColumn("prank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cdist"), asc("cell"))))
      .filter(col("prank") <= nProbe)
      .select("query_id", "qv", "qn", "cell")

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs: all pairs within a subset with
    * cosine >= threshold. The library scale path buckets via
    * srpSignature first; this exact form is the verifier. */
  def nearDupPairs(emb: DataFrame, threshold: Double, maxId: Long): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosine(col("a.v"), col("b.v"), col("a.n"), col("b.n")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
