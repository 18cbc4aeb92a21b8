package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join on a skewed key") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 2000).map { i =>
      (if (i % 10 == 0) (i % 5) + 1L else 1L, i.toLong)
    }.toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Skew.saltedJoin(fact, dim, "k", saltSource = col("payload"), buckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val p = plain.orderBy("k").collect().map(_.toSeq)
    val q = salted.orderBy("k").collect().map(_.toSeq)
    assert(p.toSeq === q.toSeq)
  }

  test("salt spreads a hot key over many buckets") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "v")
    val spread = hot.select(Skew.salt(col("v"), 16).as("s"))
      .distinct().count()
    assert(spread === 16L) // all buckets hit
  }
}
