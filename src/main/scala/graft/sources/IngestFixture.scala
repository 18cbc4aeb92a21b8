package graft.sources

import graft.model.ReferenceSchemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-size reference-shaped CSV fixture for the baseline ingest bench:
  * the reference's ONLY published performance numbers are load/ingest
  * times over its real 18,787,904-row transaction corpus (BASELINE.md:
  * Polars reads the largest 7.79 M-row file in 10.42 s; the full
  * CSV -> PostgreSQL ingest takes 20-30 min), so a like-for-like
  * comparison needs files of the SAME row counts and shape — pipe
  * delimiter, decimal-comma money, `#NO VALUE`/empty null tokens, the
  * drifting 21-column second file, ~2.02 M `#NO VALUE` CA_Net_TTC
  * tokens in the third (reference profiling.ipynb:747).
  *
  * Unlike [[GoldenFixture]] (a driver-built 4.5k-row slice with planted
  * golden constants), this one is Spark-GENERATED — 19 M driver-side
  * case classes would take minutes and gigabytes of heap — with every
  * column a deterministic expression of the row id (xxhash64-derived,
  * so bytes are identical on every build). Each file is written as ONE
  * csv file (the reference loaded single files; Spark still splits a
  * single CSV by byte range on read, so read parallelism is unharmed).
  *
  * Built once and cached on disk behind a completion marker: ~2.5 GB
  * of CSV that every later bench run reuses.
  */
object IngestFixture {

  /** Test-only shrink knob: divides every row count (default 1 = the
    * reference's real sizes). A non-1 divisor gets its own fixture dir
    * so a smoke run can never poison the full-size cache. */
  private def div: Long = math.max(1L,
    sys.env.get("GRAFT_INGEST_DIV").flatMap(_.toLongOption).getOrElse(1L))

  /** Reference row counts (BASELINE.md / transactions_profile_report). */
  def Data1Rows: Long = 7787920L / div
  def Data2Rows: Long = 5520650L / div
  def Data3Rows: Long = 5479334L / div
  def Data3NoValue: Long = 2019845L / div // '#NO VALUE' CA_Net_TTC in data3

  def defaultDir: String = sys.env.getOrElse("GRAFT_INGEST_FIXTURE_DIR",
    s"${sys.props("user.dir")}/target/ingest_fixture") +
    (if (div == 1L) "" else s"_div$div")

  /** File paths, generating the fixture if the marker is absent.
    * Returns (largestFile, allThreeFiles). */
  def ensure(spark: SparkSession, dir: String = defaultDir): (String, Seq[String]) = synchronized {
    val marker = java.nio.file.Paths.get(dir, "_COMPLETE")
    val files = Seq(s"$dir/data1.csv", s"$dir/data2.csv", s"$dir/data3.csv")
    if (!java.nio.file.Files.exists(marker)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      write(spark, s"$dir/data1.csv", Data1Rows, fileNo = 1)
      write(spark, s"$dir/data2.csv", Data2Rows, fileNo = 2)
      write(spark, s"$dir/data3.csv", Data3Rows, fileNo = 3)
      java.nio.file.Files.createFile(marker)
    }
    (files.head, files)
  }

  /** Deterministic pseudo-random long in [0, mod) derived from the row
    * id and a per-column salt. */
  private def h(salt: Int, mod: Long): Column =
    pmod(xxhash64(col("id"), lit(salt)), lit(mod))

  /** Decimal-comma money text: units in [-lo, hi) with 6 fractional
    * digits — the byte shape `alignTo`'s decimal-comma repair parses. */
  private def money(salt: Int, lo: Long, hi: Long): Column =
    concat((h(salt, hi + lo) - lo).cast("string"), lit(","),
      lpad(h(salt + 1, 1000000L).cast("string"), 6, "0"))

  private def opt(salt: Int, prefix: String, mod: Long): Column =
    when(h(salt + 500, 10L) === 0, lit(""))
      .otherwise(concat(lit(prefix + "_"), h(salt, mod).cast("string")))

  private def write(spark: SparkSession, path: String, rows: Long,
                    fileNo: Int): Unit = {
    val base = spark.range(0, rows, 1,
      spark.sparkContext.defaultParallelism)
    val ttc =
      if (fileNo == 3)
        when(col("id") < Data3NoValue, lit("#NO VALUE"))
          .otherwise(money(21, 500000, 5500000))
      else money(21, 500000, 5500000)
    val cols0 = Seq[(String, Column)](
      "Point_de_Vente" -> concat(lit("PDV-id-"), lpad(h(1, 40L).cast("string"), 4, "0")),
      "Numero_TPV" -> concat(lit("TPV_"), h(2, 200L).cast("string")),
      "Numero_Transaction" -> concat(lit("TID"), lpad(h(3, 4000000L).cast("string"), 12, "0")),
      "Date_Transaction" -> date_format(date_add(lit("2022-01-10"), h(4, 80L).cast("int")), "yyyy-MM-dd"),
      "Heure" -> date_format(
        timestamp_seconds(h(5, 86400L)), "HH:mm:ss"),
      "Typologie_Magasin" -> concat(lit("Typologie_Magasin_"), (h(6, 6L) + 1).cast("string")),
      "Numero_Fidelite" -> when(h(7, 4L) === 0, lit(""))
        .otherwise(concat(lit("N_"), h(7, 4000000L).cast("string"))),
      "Type_de_Vente" -> concat(lit("TV"), (h(8, 5L) + 1).cast("string")),
      "Univers_Produit" -> opt(9, "CL1", 50L),
      "Segment_Produit" -> opt(10, "CL2", 50L),
      "Famille_Produit" -> opt(11, "CL3", 50L),
      "Sous_Famille_Produit" -> opt(12, "CL4", 50L),
      "Fedas_Numero" -> concat(lit("FedasNum"), (h(13, 900L) + 100).cast("string")),
      "Fedas_Libelle" -> concat(lit("FedasLib"), (h(14, 900L) + 100).cast("string")),
      "Cible_Genre_Age" -> concat(lit("CGA"), (h(15, 9L) + 1).cast("string")),
      "Modele_Couleur_Ref" -> concat(lit("MCR"), (h(16, 210000L) + 1).cast("string")),
      "Modele_Couleur_Libelle" -> concat(lit("MCL"), (h(17, 9000L) + 1000).cast("string")),
      "Type_de_vente_NPS" -> concat(lit("NPS"), (h(18, 4L) + 1).cast("string")),
      "Quantite_Vendue" -> when(h(19, 20L) === 0, (-(h(19, 3L) + 1)).cast("string"))
        .otherwise((h(19, 5L) + 1).cast("string")),
      "CA_Net_HT" -> money(20, 500000, 4500000),
      "CA_Net_TTC" -> ttc,
      "Marge_Nette_Magasin" -> money(23, 600000, 1400000))
    // file 2 drifts: no Numero_TPV column (the reference's second export)
    val cols = if (fileNo == 2) cols0.filterNot(_._1 == "Numero_TPV") else cols0
    val tmp = s"$path.tmp"
    base.select(cols.map { case (n, c) => c.as(n) }: _*)
      .coalesce(1)
      .write.mode("overwrite")
      .option("sep", "|").option("header", "true")
      .option("emptyValue", "") // bare empty token, not quoted
      .csv(tmp)
    // single part file -> the final single-file path, like the reference's
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no csv part under $tmp"))
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  /** The timed FULL-INGEST body (read -> placeholder-normalize -> type
    * -> align -> diagonal union -> month-partitioned warehouse write) —
    * the Spark analog of the reference's Polars-read + psycopg2-COPY
    * PostgreSQL load (reference README.md:155: "20-30 min minimum"). */
  def fullIngest(spark: SparkSession, files: Seq[String], outPath: String): Unit = {
    val tx = CsvSource.readAligned(spark, files, ReferenceSchemas.transactions)
      .withColumn("sale_month", date_format(col("date_transaction"), "yyyy-MM"))
    Warehouse.writePartitioned(tx, outPath, Seq("sale_month"))
  }
}
