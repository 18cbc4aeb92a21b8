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

  /** Salted skewed join: when one fact key dominates and the dim side is
    * too big to broadcast, a sort-merge join sends the whole hot key to
    * one task. Salting spreads it: the fact side gets a deterministic
    * salt in [0, buckets) from a high-cardinality column, the dim side
    * replicates each row across ALL salt values (explode of a literal
    * range — dim grows x buckets, fact does not), and the join runs on
    * (key, salt). Result set is EXACTLY the plain inner join's.
    * AQE's skew-join split handles many cases adaptively; this is the
    * deterministic form for when the planner can't (e.g. pre-AQE
    * stages, or salting into a bucketed write). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltSource, buckets))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
