package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Advanced, Curation, Golden, Graph, Integrity, Lexical, Llm, Mining, Patterns, Pipeline, Quality, Retail, Retrieval, Robust, Temporal, TextQuality}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Session.tune(spark)
    Retail.totalMarginLast2Months(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Retail.queries ++ Quality.queries ++ Llm.queries ++ Advanced.queries ++
      Golden.queries ++ TextQuality.queries ++ Temporal.queries ++
      Pipeline.queries ++ Graph.queries ++ Retrieval.queries ++
      Lexical.queries ++ Integrity.queries ++ Curation.queries ++
      Mining.queries ++ Patterns.queries ++ Robust.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Retail.oracles ++ Quality.oracles ++ Llm.oracles ++ Advanced.oracles ++
      Golden.oracles ++ TextQuality.oracles ++ Temporal.oracles ++
      Pipeline.oracles ++ Graph.oracles ++ Retrieval.oracles ++
      Lexical.oracles ++ Integrity.oracles ++ Curation.oracles ++
      Mining.oracles ++ Patterns.oracles ++ Robust.oracles
}
