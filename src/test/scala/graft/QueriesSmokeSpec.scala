package graft

import org.apache.spark.sql.functions._

/** Smoke: every declared query runs at sf0.001 and produces rows with
  * the declared column names (value-level correctness is the DuckDB
  * oracle's job — see tools/oracle_check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle — no rows-only exceptions left") {
    // since round 2 even q15 (schema presence) is oracle-checked, via
    // DuckDB DESCRIBE introspection. As of round 7 the last exception
    // (q22x, the production-hash minhash lane) is gone too: its verify
    // join emits the exact h64-set Jaccard, which is hash-family-
    // independent, so the md5-lane oracle applies verbatim.
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      === Set.empty[String])
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // materializes; q21/q22 may be empty at tiny sf
    }
  }
}
