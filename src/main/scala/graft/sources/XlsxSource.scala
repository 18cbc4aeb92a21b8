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
    * to type. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val sz = new java.io.File(path).length()
    require(sz <= MaxFileBytes,
      s"xlsx $path is $sz bytes (> $MaxFileBytes): this reader parses on " +
        "the driver and is for dimension-sized artifacts only — convert " +
        "fact-scale data to CSV/parquet and use the distributed sources")
    val rows = readRows(path)
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
