package graft

import graft.functions.Text
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Equivalence contracts for the codegen'd custom expressions: each must
  * be byte-identical to its composable (lambda) form — they exist purely
  * to move the same computation inside whole-stage codegen. */
class CustomExprSpec extends SparkSpec {
  import spark.implicits._

  test("word_shingles equals array_distinct(transform(...)) on real docs") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf)
    val lambda = docs.select(col("doc_id"),
      Text.shinglesFromTokens(Text.tokens(col("text")), 3).as("s"))
    val fast = docs.select(col("doc_id"),
      GraftFunctions.word_shingles(Text.tokens(col("text")), 3).as("s"))
    assert(lambda.exceptAll(fast).count() === 0)
    assert(fast.exceptAll(lambda).count() === 0)
  }

  test("word_shingles edge cases: short docs, duplicates, empty") {
    GraftFunctions.register(spark)
    val out = Seq("a b c a b c a b", "a b", "")
      .toDF("t")
      .select(GraftFunctions.word_shingles(Text.tokens(col("t")), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b c", "b c a", "c a b")) // distinct, first-occurrence order
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("graft_dot equals the sequential lambda fold, including order") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val lambda = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).collect().head.getDouble(0)
    val fast = df.select(GraftFunctions.graft_dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(fast === lambda)
    assert(fast === 32.0)
    // on real embeddings: bit-identical across all pairs of first 20
    val e = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
    val diffs = pairs.select(
      (GraftFunctions.graft_dot(col("x.v"), col("y.v")) -
        aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs === 0)
  }

  test("graft_srp_sig equals the composed round/when/shift formula") {
    import graft.operators.Similarity
    val (band, bits, dim) = (3, 6, 64)
    val planes = Similarity.srpPlanes(band, bits, dim)
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    // the exact pre-round-4 expression tree, rebuilt inline
    val composed = (0 until bits).map { i =>
      when(round(GraftFunctions.graft_dot(col("v"), typedLit(planes(i))), 6) >= 0,
        lit(1L << (bits - 1 - i))).otherwise(lit(0L))
    }.reduce(_ + _)
    val diffs = e.select(
        (GraftFunctions.srp_sig(col("v"), band, bits, dim) - composed).as("d"))
      .filter(col("d") =!= 0L).count()
    assert(diffs === 0)
    // and from SQL
    GraftFunctions.register(spark)
    val one = spark.sql(
      "SELECT graft_srp_sig(array(1.0d, -2.0d), 0, 4, 2) AS s").collect().head
    assert(one.getLong(0) >= 0L && one.getLong(0) < 16L)
  }

  test("custom expressions work from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       word_shingles(array('x','y','z'), 2) AS s""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getSeq[String](1) === Seq("x y", "y z"))
  }
}
