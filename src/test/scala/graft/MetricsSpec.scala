package graft

import org.apache.spark.sql.functions._

/** The broadcast-vs-shuffle claim, measured: the same fact-dim join
  * moves orders of magnitude less shuffle data when the dim broadcasts
  * than when it is forced to shuffle-merge. This is the number a 100 TB
  * plan lives or dies on, so it gets a test, not just a plan read. */
class MetricsSpec extends SparkSpec {

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  test("broadcast dim join shuffles far less than forced shuffle-merge") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_quantity")
    val part = Tables.part(spark, sf).select("p_partkey", "p_retailprice")
    def agg(j: org.apache.spark.sql.DataFrame) = j
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity") * col("p_retailprice")).as("v"))

    val broadcastIo = Metrics.measure(spark) {
      noop(agg(li.join(broadcast(part), col("l_partkey") === col("p_partkey"))))
    }
    val shuffledIo = Metrics.measure(spark) {
      noop(agg(li.hint("merge")
        .join(part.hint("merge"), col("l_partkey") === col("p_partkey"))))
    }
    // the broadcast plan's only shuffle is the final aggregate's; the
    // merge plan additionally range/hash-shuffles BOTH join inputs
    assert(shuffledIo.shuffleWriteBytes > 0)
    assert(broadcastIo.shuffleWriteBytes < shuffledIo.shuffleWriteBytes / 2,
      s"broadcast=${broadcastIo.shuffleWriteBytes}B " +
        s"shuffled=${shuffledIo.shuffleWriteBytes}B")
  }

  test("measure sums input bytes for a plain scan") {
    val io = Metrics.measure(spark) {
      noop(Tables.lineitem(spark, sf).select("l_orderkey"))
    }
    assert(io.inputBytes > 0)
    assert(io.shuffleWriteBytes === 0, "a projection scan must not shuffle")
  }
}
