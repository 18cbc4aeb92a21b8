package graft

import graft.functions.Validate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native placeholder matcher (graft.plans.PlaceholderNull) must be
  * value-equal to the composable form it replaced —
  * `when(length(trim(c)) <= maxLen && lower(trim(c)).isin(tokens...),
  * null).otherwise(c)` — including the Unicode corners the fast path
  * routes to its slow arm (lowercasings that land on ASCII, fullwidth
  * lookalikes, multi-byte values around the length gate). */
class PlaceholderParitySpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(c: Column, tokens: Seq[String]): Column = {
    val t = trim(c.cast("string"))
    val maxLen = tokens.map(_.length).max
    when(length(t) <= maxLen &&
      lower(t).isin(tokens.map(_.toLowerCase): _*), lit(null)).otherwise(c)
  }

  private def parity(values: Seq[String], tokens: Seq[String]): Unit = {
    val df = values.toDF("v").localCheckpoint(true)
    val got = df.select(Validate.normalizePlaceholders(col("v"), tokens).as("n"))
      .collect().map(r => Option(r.getString(0)))
    val want = df.select(oldForm(col("v"), tokens).as("n"))
      .collect().map(r => Option(r.getString(0)))
    val diffs = values.lazyZip(got).lazyZip(want).collect {
      case (v, g, w) if g != w => s"value=${Option(v)} native=$g old=$w"
    }
    assert(diffs.isEmpty, s"parity broken:\n${diffs.mkString("\n")}")
  }

  test("native matcher ≡ when/lower/isin form on adversarial inputs") {
    parity(Seq(
      null, "", " ", "   ", "#NO VALUE", "#no value", "#No Value",
      " #NO VALUE ", "#NO_VALUE", "#no_value2", "na", "NA", "Na ",
      "nan", "NaN", "nAn", "n/a", "N/A", "none", "None", "NONE",
      "null", "Null", "NULLS", "missing", "MISSING", "missin",
      "keep", "TV1", "CGA3", "TPV_12", "PDV-id-0042", "123456,789012",
      "éna", "nä", "ſ", "K", "ＮＡ", "ｎｕｌｌ", "Keep",
      "miſsing", "a" * 50, " nan", "nan ", "\tnan", "x#NO VALUE",
      "ααααααααα", "αααααααααα"), Validate.defaultNullTokens)
  }

  test("unicode lowercasings that land on ASCII take the slow arm (parity held)") {
    // Kelvin sign lowercases to 'k'; long s to 's' — the one class the
    // ASCII byte compare cannot see, routed through toLowerCase
    parity(Seq("K", "K", "k", "S", "ſ", "s", "ss", "ẞ", "ß"),
      Seq("k", "s", "ss"))
  }

  test("fuzzed parity over token-adjacent strings") {
    val rnd = new scala.util.Random(20260816L)
    val atoms = Validate.defaultNullTokens.filter(_.nonEmpty) ++
      Seq(" ", "x", "N", "#", "/", "_", "é", "K", "ſ", "0")
    val values = (1 to 2000).map { _ =>
      val n = rnd.nextInt(4)
      val s = (0 to n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      // random case flips
      s.map(ch => if (rnd.nextBoolean()) ch.toUpper else ch.toLower)
    }
    parity(values, Validate.defaultNullTokens)
  }
}
