package graft.model

import org.apache.spark.sql.types._

/** The reference engine's own data contract, verbatim: the 22-column
  * `transactions` table and 2-column `product` table (reference
  * `src/db/sql/schema.sql:4-39`, CSV shapes per
  * `src/etl/tables/schemas_regex.py:29-57`). Column names are the
  * lowercased DB names; the raw CSV headers (`Point_de_Vente`, ...)
  * lowercase onto them directly, so `CsvSource.alignTo` needs no rename
  * map.
  *
  * Type mapping notes:
  *  - `heure` (SQL TIME) is kept as an HH:mm:ss string — Spark has no
  *    time-of-day type; every reference query treats it opaquely.
  *  - money columns are DECIMAL(18,6) (schema.sql NUMERIC), parsed from
  *    decimal-comma CSV text; sums over them are exact and
  *    engine-portable.
  *  - `signature_product` parses from the CSV's 0/1/empty contract
  *    (schemas_regex.py:56).
  */
object ReferenceSchemas {

  val transactions: StructType = StructType(Seq(
    StructField("point_de_vente", StringType),
    StructField("numero_tpv", StringType),
    StructField("numero_transaction", StringType),
    StructField("date_transaction", DateType),
    StructField("heure", StringType),
    StructField("typologie_magasin", StringType),
    StructField("numero_fidelite", StringType),
    StructField("type_de_vente", StringType),
    StructField("univers_produit", StringType),
    StructField("segment_produit", StringType),
    StructField("famille_produit", StringType),
    StructField("sous_famille_produit", StringType),
    StructField("fedas_numero", StringType),
    StructField("fedas_libelle", StringType),
    StructField("cible_genre_age", StringType),
    StructField("modele_couleur_ref", StringType),
    StructField("modele_couleur_libelle", StringType),
    StructField("type_de_vente_nps", StringType),
    StructField("quantite_vendue", IntegerType),
    StructField("ca_net_ht", DecimalType(18, 6)),
    StructField("ca_net_ttc", DecimalType(18, 6)),
    StructField("marge_nette_magasin", DecimalType(18, 6))))

  val product: StructType = StructType(Seq(
    StructField("code_modele_couleur_actuel", StringType),
    StructField("signature_product", BooleanType)))

  /** Opt-in TYPED `heure` (round-16 verdict #5, probed 2026-08-16):
    * Spark 4.1 DOES ship `TimeType` (SPARK-51162), but gated behind
    * the experimental `spark.sql.timeType.enabled` flag, default
    * FALSE — with the flag on, `CAST(heure AS TIME)`, comparisons,
    * `HOUR()` extraction and the parquet round-trip all work
    * (verified on this build: `time(6)` typeof, values byte-stable
    * through parquet); with it off every TIME expression throws
    * UNSUPPORTED_TIME_TYPE. Decision: the DEFAULT representation
    * stays the validated HH:mm:ss string (+ derived timestamp) of
    * SURVEY §7.4 — an experimental default-off type must not sit
    * under the frozen 311-query oracle surface, no reference query
    * touches `heure`, and zero-padded HH:mm:ss strings already order
    * identically to the typed values (TimeTypeSpec pins that law).
    * Sessions that opt into the flag get a true time-of-day column
    * here; revisit the default when the flag graduates. */
  def withTypedHeure(df: org.apache.spark.sql.DataFrame,
                     timeCol: String = "heure",
                     out: String = "heure_time"): org.apache.spark.sql.DataFrame = {
    require(df.sparkSession.conf.getOption("spark.sql.timeType.enabled")
        .exists(_.toBoolean),
      "TIME is experimental in this Spark build: set " +
        "spark.sql.timeType.enabled=true to derive a typed heure " +
        "(the default string lane needs no flag)")
    df.withColumn(out,
      org.apache.spark.sql.functions.expr(s"CAST($timeCol AS TIME)"))
  }

  /** Raw CSV header order for a full transactions file (FIXTURES.md §1). */
  val transactionsCsvHeader: Seq[String] = Seq(
    "Point_de_Vente", "Numero_TPV", "Numero_Transaction", "Date_Transaction",
    "Heure", "Typologie_Magasin", "Numero_Fidelite", "Type_de_Vente",
    "Univers_Produit", "Segment_Produit", "Famille_Produit",
    "Sous_Famille_Produit", "Fedas_Numero", "Fedas_Libelle",
    "Cible_Genre_Age", "Modele_Couleur_Ref", "Modele_Couleur_Libelle",
    "Type_de_vente_NPS", "Quantite_Vendue", "CA_Net_HT", "CA_Net_TTC",
    "Marge_Nette_Magasin")
}
