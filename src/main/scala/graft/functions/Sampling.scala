package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `sample()`/TABLESAMPLE are seed-dependent and partitioner-dependent —
  * useless when a 100 TB pipeline must be re-runnable bit-for-bit and
  * when two engines must agree on the sample. Hash-threshold sampling
  * fixes both: a row is kept iff the first 8 hex chars of md5(key) —
  * a uniform 32-bit integer — fall under fraction * 2^32. The same rule
  * is one expression in any md5-capable engine, the decision is a pure
  * function of the KEY (stable under repartitioning, joins, reruns),
  * and sampling by a foreign key keeps entity groups intact
  * (all-or-nothing per order/user/document).
  */
object Sampling {

  /** Keep-predicate: md5-hash of `key` under `fraction` of 2^32. */
  def hashKeep(key: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    graft.plans.GraftFunctions.hex_window(md5(key.cast("string").cast("binary")), 0, 8) <
      lit((fraction * 4294967296.0).toLong)
  }

  /** Deterministic sample of `df` by hashing `keyCol`. Rows sharing a
    * key are kept or dropped together. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.filter(hashKeep(col(keyCol), fraction))
  }
}
