package graft

import graft.operators.Dedup

/** Production-lane equivalence: the seeded-xxhash64 MinHash family must
  * find the same near-dup pairs as the md5 oracle lane. Both lanes
  * verify candidates with exact Jaccard, so they can only differ by
  * MISSING pairs (candidate recall), never by inventing them — equality
  * here means the cheaper family loses nothing on this corpus. */
class MinhashXxLaneSpec extends SparkSpec {

  private def pairs(family: Dedup.HashFamily): Set[(Long, Long, Double)] =
    Dedup.minhashLshPairs(Tables.documents(spark, sf), "doc_id", "text",
        n = 3, numHashes = 12, bands = 4, threshold = 0.5, family = family)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("xxhash64 lane finds the same pairs (and exact Jaccards) as the md5 lane") {
    val md5Pairs = pairs(Dedup.Md5Minhash)
    val xxPairs = pairs(Dedup.XxMinhash)
    assert(md5Pairs.nonEmpty, "seeded corpus must contain near-dup pairs")
    info(s"md5 lane: ${md5Pairs.size} pairs; xx lane: ${xxPairs.size} pairs")
    assert(xxPairs === md5Pairs)
  }
}
