package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC sink/source parity with the reference's real sink.
  *
  * The reference's pipeline lands every table in PostgreSQL via
  * psycopg2 COPY (reference `src/db/pipeline.py:165-195`); the
  * engine's primary analog is the partitioned parquet warehouse
  * (SURVEY §2.1 S7 — at 100 TB a lakehouse table IS the warehouse),
  * but a user migrating off the reference may still need to land
  * results in an actual RDBMS. This is Spark's native path for that:
  * `df.write.jdbc` — executor-parallel batched INSERTs, one connection
  * per partition — and `spark.read.jdbc` back.
  *
  * Proven against embedded Apache Derby (the one RDBMS on the
  * classpath in this zero-egress environment; the same code targets
  * PostgreSQL by swapping url/driver). Scale note: batched INSERT is
  * the portable JDBC contract but NOT the 100 TB bulk path — at scale
  * the warehouse write + the database's native bulk loader (COPY FROM
  * / LOAD) is the right split, which is exactly the reference's own
  * COPY design; `batchsize` below is the dial that makes the JDBC
  * path acceptable for dimension/result tables (the reference's
  * product table and query outputs), not fact loads.
  *
  * Embedded Derby holds an exclusive JVM lock per database directory,
  * so database paths must be per-JVM ([[graft.Scratch]]'s pid-keyed
  * dirs) — the same isolation contract the concurrency proof
  * (tools/concurrent_verify.sh) enforces for every other writer.
  */
object JdbcSink {
  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  // keep derby.log out of the repo root
  private lazy val home: Unit = {
    val _ = System.setProperty("derby.system.home",
      s"${sys.props("user.dir")}/target")
  }

  def url(dbDir: String): String = { home; s"jdbc:derby:$dbDir;create=true" }

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", Driver)
    p
  }

  /** S7 (JDBC lane): land `df` as `table`, overwriting. Partition-
    * parallel batched INSERTs; `batchsize` bounds round-trips. */
  def write(df: DataFrame, dbDir: String, table: String,
            batchSize: Int = 1000): Unit =
    df.write.mode("overwrite")
      .option("batchsize", batchSize)
      .jdbc(url(dbDir), table, props)

  def read(spark: SparkSession, dbDir: String, table: String): DataFrame =
    spark.read.jdbc(url(dbDir), table, props)
}
