package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation. For a hot grouping key
  * (one key holding a large fraction of all rows), a plain groupBy sends
  * the whole hot key to one reducer; salting splits each key into
  * `buckets` sub-keys for the wide partial aggregation, then combines
  * the per-salt partials in a second (tiny) aggregation.
  *
  * AQE's skew-join handling covers *joins*; salting is the aggregation-
  * side tool. Results are exactly those of the unsalted aggregation for
  * decomposable aggregates (sum/count/min/max).
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from a row expression
    * (use a high-cardinality column; falls back to the key itself). */
  def salt(e: Column, buckets: Int): Column = pmod(xxhash64(e), lit(buckets))

  /** Salted count+sum per key: phase 1 groups by (key, salt) — the wide
    * shuffle now spreads hot keys over `buckets` reducers — phase 2
    * combines partials per key. */
  def saltedAgg(df: DataFrame, key: String, valueCol: Column,
                saltSource: Column, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(saltSource, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))
}
