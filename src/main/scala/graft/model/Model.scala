package graft.model

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` surface (SURVEY §1.1: Dataset with case-class
  * Encoders where type safety helps). DataFrames remain the default —
  * schema-dynamic ops (alignment, profiling) need them — but pipeline
  * code that hardcodes a table's shape gets compile-time field checks
  * here. Encoders are Catalyst ExpressionEncoders: typed plans still
  * codegen and prune columns (only fields actually used are read).
  */
final case class LineItem(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String,
    l_shipdate: java.time.LocalDateTime)

final case class Part(
    p_partkey: Long, p_name: String, p_brand: String, p_type: String,
    p_size: Int, p_retailprice: Double)

final case class Doc(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

object Typed {
  def lineitem(spark: SparkSession, dir: String): Dataset[LineItem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[LineItem]
  }

  def part(spark: SparkSession, dir: String): Dataset[Part] = {
    import spark.implicits._
    Tables.part(spark, dir).as[Part]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Doc]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }

  /** Example typed pipeline: net revenue per return flag, with field
    * access checked at compile time. */
  def revenueByFlag(spark: SparkSession, dir: String): Dataset[(String, Double)] = {
    import spark.implicits._
    lineitem(spark, dir)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        // decimal accumulation for order-independence, like the SQL path
        var acc = BigDecimal(0)
        rows.foreach { r =>
          acc += BigDecimal(r.l_extendedprice * (1.0 - r.l_discount))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        }
        (flag, acc.toDouble)
      }
  }
}
