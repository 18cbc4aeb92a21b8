package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.functions._

class JsonlSourceSpec extends SparkSpec {

  test("fixture is deterministic and covers the edge cases") {
    val d1 = JsonlSource.generate("/tmp/graft_jsonl_a")
    val d2 = JsonlSource.generate("/tmp/graft_jsonl_b")
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d1)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d2))),
      "two generations must be byte-identical")
    val df = JsonlSource.read(spark, d1)
    assert(df.count() === 240)
    // missing score key AND explicit null both land as null
    assert(df.filter(col("score").isNull).count() >= 240 / 7)
    // missing meta object -> null struct
    assert(df.filter(col("meta").isNull).count() >= 240 / 13 - 1)
    // escaped quotes/backslashes survive the round trip
    assert(df.filter(col("text").contains("say \"hi\"")).count() > 0)
    assert(df.filter(col("text").contains("a\\b")).count() > 0)
    // non-ASCII text parses
    assert(df.filter(col("text").contains("déjà")).count() > 0)
    // no row was shunted to a corrupt-record fallback
    assert(df.filter(col("id").isNull).count() === 0)
  }
}
