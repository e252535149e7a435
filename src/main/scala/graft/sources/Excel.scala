package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal native .xlsx reader (S6, `etl_load_reference_data.py:22-34`) on
  * nothing but the JDK: an xlsx is a zip of XML parts, so `java.util.zip` +
  * StAX cover the read path without any external library.
  *
  * Supported surface — deliberately the slice the reference's
  * `pd.read_excel(...)` load uses: the FIRST worksheet, shared and inline
  * strings, numbers, booleans, formula results (`<v>` cached values). Dates
  * come out as Excel serial numbers (parse them with the schema, the same
  * contract as the CSV path). Rich-text runs concatenate.
  *
  * Scale shape: files land via Spark's `binaryFile` source, one task per
  * file, and parse ON THE EXECUTORS — a directory of workbooks parallelizes
  * per file, nothing routes through the driver. A single .xlsx must fit in a
  * task's memory (the format is a random-access zip, not splittable —
  * worksheets >~100 MB belong in CSV/parquet anyway).
  */
object Excel {

  /** Parse one workbook: rows of the first worksheet as string cells
    * (null = missing cell), padded/truncated to `width` columns. */
  def parseWorkbook(bytes: Array[Byte], width: Int): Seq[Array[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheets = mutable.SortedMap.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))
          sheets += name -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheets.nonEmpty, "not an xlsx workbook: no xl/worksheets/*.xml part")
    parseSheet(sheets.head._2, shared, width)
  }

  /** sharedStrings.xml: one entry per <si>, rich-text <r><t> runs concatenated. */
  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    val r = newReader(xml)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += sb.toString
            case _ => ()
          }
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  /** One worksheet: cells keyed by their `r="B3"` reference (position
    * fallback when absent); `t` attribute picks the decode — s = shared
    * string, inlineStr = <is><t>, b = boolean, else the literal <v>. */
  private def parseSheet(xml: Array[Byte], shared: IndexedSeq[String],
                         width: Int): Seq[Array[String]] = {
    val rows = mutable.ArrayBuffer.empty[Array[String]]
    var row: Array[String] = null
    var colIdx, nextCol = 0
    var cellType = ""
    var inV, inIs = false
    val sb = new StringBuilder
    val r = newReader(xml)
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = new Array[String](width); nextCol = 0
          case "c" =>
            colIdx = Option(r.getAttributeValue(null, "r"))
              .map(refToCol).getOrElse(nextCol)
            nextCol = colIdx + 1
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            sb.clear()
          case "is" => inIs = true
          case "v" => inV = true; sb.clear()
          case "t" if inIs => inV = true
          case _ => ()
        }
        case XMLStreamConstants.CHARACTERS if inV => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row; row = null
          case "is" => inIs = false
          case "v" | "t" if inV =>
            inV = false
            if (row != null && colIdx < width) row(colIdx) = decode(sb.toString, cellType, shared)
          case _ => ()
        }
        case _ => ()
      }
    }
    rows.toSeq
  }

  private def decode(v: String, t: String, shared: IndexedSeq[String]): String = t match {
    case "s" => shared(v.toInt) // shared-string table index
    case "b" => if (v == "1") "true" else "false"
    case _ => v // n/str/inlineStr: literal text
  }

  /** "BC23" → 0-based column index (base-26 letters prefix). */
  private[graft] def refToCol(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def newReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // no DTDs/entities inside workbook parts — and parsing untrusted files
    // must not resolve external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml))
  }

  /** Directory of .xlsx workbooks → DataFrame bound to `schema` positionally
    * (the `csvDir` contract): first worksheet per file, optional header row
    * dropped, string cells cast column-by-column to the schema types. */
  def readDir(spark: SparkSession, dir: String, schema: StructType,
              header: Boolean = true): DataFrame = {
    val width = schema.length
    val asStrings = StructType(schema.map(f => StructField(f.name, StringType, nullable = true)))
    val rows = spark.read.format("binaryFile").load(s"$dir/*.xlsx")
      .select("content").rdd
      .flatMap { r =>
        val parsed = Excel.parseWorkbook(r.getAs[Array[Byte]](0), width)
        (if (header) parsed.drop(1) else parsed).map(cells => Row(cells.toIndexedSeq: _*))
      }
    spark.createDataFrame(rows, asStrings)
      .select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}
