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

  test("gate-data margin: every true near-dup pair sits clear of the band-miss zone") {
    // The q22x gate reuses q22's EXACT oracle (all true-Jaccard>=0.5
    // pairs), so it asserts the seeded-xxhash64 band family's recall is
    // exactly 1.0 on the gate corpus. That is only family-independent
    // while no pair is BORDERLINE: at j=0.5 a 12-hash/4-band LSH misses
    // a pair with probability (1-j^3)^4 ~ 0.59 per family, so a future
    // gate-data change introducing a just-above-threshold pair could
    // fail the driver gate spuriously even though both lanes are
    // correct. This selfcheck is the PRIMARY guard: it fails first,
    // with guidance, while the margin holds the gate is deterministic.
    val truePairs = Dedup.jaccardPrefixPairs(
        Tables.documents(spark, sf), "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => r.getDouble(2))
    assert(truePairs.nonEmpty, "seeded corpus must contain near-dup pairs")
    val minJ = truePairs.min
    info(f"true pairs: ${truePairs.length}; min exact jaccard = $minJ%.3f")
    assert(minJ >= 0.6,
      f"borderline near-dup pair (exact jaccard $minJ%.3f < 0.6) in the " +
        "gate corpus: pin the pair in the oracle or decouple q22x from " +
        "the exact-recall oracle (assert recall >= bound instead)")
  }
}
