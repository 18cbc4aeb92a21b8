package graft

import graft.sources.{CsvSource, XlsxSource}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.types._

class XlsxSourceSpec extends SparkSpec {

  /** Build a minimal spec-conformant xlsx (zip of XML parts). */
  private def writeXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>CODE_MODELE_COULEUR_ACTUEL</t></si>
        |<si><t>SIGNATURE_PRODUCT</t></si><si><t>CMC101</t></si>
        |<si><t>CMC102</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"/></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1</v></c><c r="C2"><v>9</v></c></row>
        |<row r="3"/>
        |<row r="4"><c r="A4" t="s"><v>3</v></c><c r="B4"><v>0</v></c></row>
        |<row r="5"><c r="A5" t="inlineStr"><is><t>CMC103</t></is></c><c r="B5"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("reads header + rows, drops empty rows and empty-header columns") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx").resolve("product.xlsx").toString
    writeXlsx(path)
    val df = XlsxSource.read(spark, path)
    assert(df.columns.toSeq ===
      Seq("CODE_MODELE_COULEUR_ACTUEL", "SIGNATURE_PRODUCT"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq ===
      Seq(("CMC101", "1"), ("CMC102", "0"), ("CMC103", "1")))
  }

  test("feeds alignTo for a typed product dimension (xlsx -> bool parse)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx2").resolve("product.xlsx").toString
    writeXlsx(path)
    val target = StructType(Seq(
      StructField("code_modele_couleur_actuel", StringType),
      StructField("signature_product", BooleanType)))
    val dim = CsvSource.alignTo(XlsxSource.read(spark, path), target)
    val out = dim.collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(out.toSeq === Seq(("CMC101", true), ("CMC102", false), ("CMC103", true)))
  }

  test("A1-style column references decode correctly") {
    assert(XlsxSource.colIndex("A1") === 0)
    assert(XlsxSource.colIndex("Z9") === 25)
    assert(XlsxSource.colIndex("AA3") === 26)
    assert(XlsxSource.colIndex("AB12") === 27)
  }

  /** Same workbook, but the sheet XML carries a raw unescaped `&` in an
    * inline string — a conformant XML parser MUST reject it; the
    * tolerant fallback decoder must still extract every cell. */
  private def writeMalformedXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>CODE_MODELE_COULEUR_ACTUEL</t></si>
        |<si><t>SIGNATURE_PRODUCT</t></si><si><t>CMC101</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>CMC102 & SONS</t></is></c><c r="B3"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("fallback decoder equals the conformant parse on well-formed files") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx4").resolve("product.xlsx").toString
    writeXlsx(path)
    val primary = XlsxSource.readRows(path).map(_.toSeq)
    val fallback = XlsxSource.readRowsFallback(path).map(_.toSeq)
    assert(fallback === primary,
      "the two xlsx engines must be row-identical on well-formed input")
  }

  test("malformed xlsx: conformant parse refuses, read() falls back") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_xlsx5").resolve("product.xlsx").toString
    writeMalformedXlsx(path)
    // the raw '&' must kill the conformant engine...
    intercept[Exception] { XlsxSource.readRows(path) }
    // ...and the public read() must land the file anyway, with the
    // malformed row's value intact (entities untouched, raw & kept)
    val rows = XlsxSource.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("CMC101", "1"), ("CMC102 & SONS", "0")))
  }

  test("refuses an over-limit file instead of parsing it on the driver") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx3")
    val path = dir.resolve("huge.xlsx")
    // sparse file: size() reports past the limit without writing 256 MiB
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.position(XlsxSource.MaxFileBytes) // 1 byte past the ceiling
      ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0)))
    } finally ch.close()
    val e = intercept[IllegalArgumentException] {
      XlsxSource.read(spark, path.toString)
    }
    assert(e.getMessage.contains("dimension-sized"))
    java.nio.file.Files.deleteIfExists(path)
  }
}
