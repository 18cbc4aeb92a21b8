package graft

import org.apache.spark.sql.functions._

/** Smoke: every declared query runs at sf0.001 and produces rows with
  * the declared column names (value-level correctness is the DuckDB
  * oracle's job — see tools/oracle_check.py). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle (minus the declared rows-only set)") {
    // since round 2 even q15 (schema presence) is oracle-checked, via
    // DuckDB DESCRIBE introspection. The ONE deliberate exception:
    // q22x is the production-hash minhash lane (seeded xxhash64), which
    // no other engine reproduces — its correctness evidence is
    // MinhashXxLaneSpec's pair-set equality with the oracle'd md5 lane,
    // and the driver records it as a rows-only check.
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      === Set("q22x_minhash_xxhash"))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0) // materializes; q21/q22 may be empty at tiny sf
    }
  }
}
