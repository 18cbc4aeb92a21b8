package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Connected-components convergence semantics: label propagation must
  * SURFACE non-convergence on deep chains (iterations = diameter), and
  * the star-contraction variant must converge where propagation cannot
  * (O(log^2 n) rounds regardless of diameter). */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def chainPairs(n: Int) =
    (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")

  test("label propagation reports converged=true on shallow components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
    assert(cc.converged)
    assert(cc.iterations <= 5)
  }

  test("label propagation detects maxIter truncation on a deep chain") {
    // a 60-edge path has diameter 60: 20 iterations CANNOT finish, and
    // the caller must be able to see that instead of trusting the labels
    val cc = Dedup.connectedComponents(chainPairs(60), maxIter = 20)
    assert(!cc.converged, "expected propagation to hit maxIter on a 60-chain")
    assert(cc.iterations === 20)
    // and the returned labels are indeed NOT fully merged
    val reps = cc.labels.select("rep").distinct().count()
    assert(reps > 1, "labels should be partially merged at truncation")
  }

  test("star contraction converges on the same deep chain in O(log n) rounds") {
    val cc = Dedup.starContractComponents(chainPairs(60), maxIter = 15)
    assert(cc.converged, s"star contraction did not converge in ${cc.iterations}")
    info(s"star contraction rounds on a 60-chain: ${cc.iterations}")
    val labels = cc.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 61)
    assert(labels.values.toSet === Set(0L), "all chain nodes must label to 0")
    val clusters = Dedup.clustersFromLabels(cc.labels).collect()
    assert(clusters.length === 1)
    assert(clusters.head.getLong(0) === 0L && clusters.head.getLong(1) === 61L)
  }

  test("adaptive CC stays on propagation for shallow graphs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.componentsAdaptive(pairs)
    assert(cc.converged)
    // shallow input never pays the star-contraction escalation
    assert(cc.iterations <= 6, s"expected pure propagation, got ${cc.iterations}")
  }

  test("adaptive CC escalates on a deep chain and converges in log rounds") {
    // diameter 400 — propagation alone would need 400 rounds; the
    // adaptive default must escalate and land the full merge in
    // propBudget + O(log 400) rounds
    val n = 400
    val cc = Dedup.componentsAdaptive(chainPairs(n))
    assert(cc.converged, s"adaptive CC truncated at ${cc.iterations} rounds")
    assert(cc.iterations < 30,
      s"round count must drop from $n (diameter) to O(log n); got ${cc.iterations}")
    info(s"adaptive rounds on a $n-chain: ${cc.iterations} (propagation would need $n)")
    val labels = cc.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n + 1)
    assert(labels.values.toSet === Set(0L), "all chain nodes must label to 0")
  }

  test("adaptive CC is label-identical to exhaustive propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nNodes = 60 + trial * 20
      val edges = (0 until nNodes).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      val pairs = edges.toDF("doc_a", "doc_b")
      val adaptive = Dedup.componentsAdaptive(pairs).labels
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = Dedup.connectedComponents(pairs, maxIter = 1000)
      assert(prop.converged)
      val exhaustive = prop.labels
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(adaptive === exhaustive,
        s"trial $trial: adaptive labels diverge from exhaustive propagation")
    }
  }

  test("star contraction matches propagation on a multi-component graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (4L, 5L), (5L, 6L), (7L, 7L))
      .toDF("doc_a", "doc_b")
    val star = Dedup.clustersFromLabels(
        Dedup.starContractComponents(pairs).labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prop = Dedup.dedupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star === prop)
    assert(star === Set((1L, 3L), (4L, 3L), (10L, 2L)))
  }
}
