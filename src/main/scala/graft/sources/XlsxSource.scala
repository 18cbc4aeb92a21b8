package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal dependency-free XLSX source (SURVEY §2.1 S4: the reference
  * reads the product dimension from .xlsx via calamine/xlsx2csv,
  * `src/utils/dataset_profiling.py:190-223`, with header row,
  * drop_empty_rows/cols semantics).
  *
  * An .xlsx file is a zip of XML parts; this reads `xl/sharedStrings.xml`
  * and the first worksheet with the JDK's StAX parser — no external
  * dependency. Parsing happens on the driver, which is the right
  * tradeoff for this format: xlsx is a hand-authored *dimension*
  * artifact (210k rows in the reference), never the 100 TB fact side —
  * big data arrives as CSV/parquet (S1/S3). The result enters the
  * distributed plan as an ordinary DataFrame (broadcastable dim).
  */
object XlsxSource {

  /** Hard ceiling on the compressed artifact this driver-side reader
    * accepts (256 MiB ≈ several million rows — far past any
    * hand-authored dimension). Above it the read REFUSES with a clear
    * remediation instead of silently OOM-ing the driver: fact-sized
    * data belongs in CSV/parquet (S1/S3), which read distributed. */
  val MaxFileBytes: Long = 256L * 1024 * 1024

  /** Read the first worksheet: first row = header; empty rows and
    * columns with empty headers are dropped (reference semantics);
    * every cell surfaces as a nullable string for CsvSource.alignTo
    * to type.
    *
    * Two-engine ladder, mirroring the reference's own (it tries
    * calamine, then falls back to xlsx2csv —
    * `src/utils/dataset_profiling.py:190-223`): the conformant StAX
    * parse first; if that REFUSES (malformed XML inside the zip —
    * stray unescaped entities, sloppy markup some spreadsheet
    * exporters emit), the tolerant regex decoder
    * ([[readRowsFallback]]) takes the file instead. XlsxSpec pins the
    * two engines row-identical on well-formed files, so the ladder
    * only widens acceptance, never changes values. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val sz = new java.io.File(path).length()
    require(sz <= MaxFileBytes,
      s"xlsx $path is $sz bytes (> $MaxFileBytes): this reader parses on " +
        "the driver and is for dimension-sized artifacts only — convert " +
        "fact-scale data to CSV/parquet and use the distributed sources")
    val rows =
      try readRows(path)
      catch { case t: Throwable =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"conformant xlsx parse of $path failed (${t.getMessage}); " +
            "retrying with the tolerant fallback decoder")
        readRowsFallback(path)
      }
    require(rows.nonEmpty, s"empty worksheet in $path")
    val width = rows.map(_.length).max
    val padded = rows.map(_.padTo(width, null: String))
    val header = padded.head.map(h => Option(h).map(_.trim).getOrElse(""))
    val keep = header.indices.filter(header(_).nonEmpty)
    val data = padded.tail
      .filter(_.exists(v => v != null && v.nonEmpty)) // drop_empty_rows
      .map(r => keep.map(r(_)))
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      keep.map(i => org.apache.spark.sql.types.StructField(
        header(i), org.apache.spark.sql.types.StringType, nullable = true)))
    spark.createDataFrame(
      data.map(org.apache.spark.sql.Row.fromSeq(_)).asJava, schema)
  }

  /** Raw cell grid of the first worksheet (driver-side StAX scan). */
  private[graft] def readRows(path: String): Seq[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = Iterator.from(1)
        .map(i => zip.getEntry(s"xl/worksheets/sheet$i.xml"))
        .next() match {
          case null => throw new IllegalArgumentException(s"no worksheet in $path")
          case e => e
        }
      parseSheet(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var current: StringBuilder = null
    var inText = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" if current != null => inText = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inText =>
          current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inText = false
            case "si" => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** Column index from an A1-style reference ("C7" -> 2). */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** The xlsx2csv-analog FALLBACK decoder: regex extraction over the
    * raw sheet/sharedStrings XML text, deliberately tolerant where the
    * conformant parse refuses (an unescaped `&` or stray markup kills
    * an XML parser; the regex pass just pulls `<row>`/`<c>`/`<v>`
    * spans). Same output contract as [[readRows]] — XlsxSpec pins the
    * two engines identical on well-formed input. */
  private[graft] def readRowsFallback(path: String): Seq[Array[String]] = {
    val zip = new ZipFile(path)
    try {
      def entryText(name: String): Option[String] =
        Option(zip.getEntry(name)).map(e =>
          new String(zip.getInputStream(e).readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
      val siRe = "(?s)<si[ >].*?</si>|<si/>".r
      val tRe = "(?s)<t[^>]*>(.*?)</t>".r
      def innerText(span: String): String =
        tRe.findAllMatchIn(span).map(m => unescape(m.group(1))).mkString
      val shared: IndexedSeq[String] = entryText("xl/sharedStrings.xml")
        .map(xml => siRe.findAllIn(xml).map(innerText).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)
      val sheet = entryText("xl/worksheets/sheet1.xml").getOrElse(
        throw new IllegalArgumentException(s"no worksheet in $path"))
      // self-closing <row/> still emits an (empty) row, and a cell with
      // NO value element writes nothing — both matching the conformant
      // engine's emission exactly (the engines-identical law in
      // XlsxSourceSpec covers these shapes)
      val rowRe = "(?s)<row[^>]*/>|<row[^>]*>(.*?)</row>".r
      val cellRe = "(?s)<c\\b([^>]*?)(?:/>|>(.*?)</c>)".r
      val refRe = "r=\"([A-Za-z]+)[0-9]+\"".r
      val typeRe = "t=\"(\\w+)\"".r
      val vRe = "(?s)<v[^>]*>(.*?)</v>".r
      rowRe.findAllMatchIn(sheet).map { rm =>
        val cells = mutable.ArrayBuffer.empty[String]
        val rowBody = Option(rm.group(1)).getOrElse("")
        cellRe.findAllMatchIn(rowBody).foreach { cm =>
          val attrs = cm.group(1)
          val idx = refRe.findFirstMatchIn(attrs)
            .map(m => colIndex(m.group(1))).getOrElse(cells.length)
          val t = typeRe.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("")
          val body = Option(cm.group(2)).getOrElse("")
          val vOpt: Option[String] = t match {
            case "inlineStr" =>
              if (tRe.findFirstIn(body).isDefined) Some(innerText(body)) else None
            case "s" => vRe.findFirstMatchIn(body)
              .map(m => shared.lift(unescape(m.group(1)).trim.toInt).orNull)
            case _ => vRe.findFirstMatchIn(body)
              .map(m => unescape(m.group(1)))
          }
          vOpt.foreach { v =>
            while (cells.length <= idx) cells += null
            cells(idx) = v
          }
        }
        cells.toArray
      }.toSeq
    } finally zip.close()
  }

  /** Minimal XML entity unescape; unknown entities pass through
    * verbatim (tolerance is the point of the fallback lane). */
  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")

  private def parseSheet(in: InputStream,
                         shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = mutable.ArrayBuffer.empty[Array[String]]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inValue = false
    val value = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" | "t" if row != null => inValue = true; value.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inValue =>
          value.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inValue =>
              inValue = false
              val v = cellType match {
                case "s" => shared.lift(value.toString.toInt).orNull
                case _ => value.toString
              }
              while (row.length <= cellCol) row += null
              row(cellCol) = v
            case "row" => rows += row.toArray; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }
}
