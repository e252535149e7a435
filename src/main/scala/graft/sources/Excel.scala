package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

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

  /** Parse one workbook: rows of the FIRST worksheet — first in the
    * workbook-defined tab order (xl/workbook.xml + its rels), which is what
    * pandas' `read_excel` reads; part names alone lie after tab reorders or
    * deletions (a workbook whose first tab is stored as sheet2.xml is
    * common). Cells come back as strings (null = missing), padded/truncated
    * to `width` columns. Falls back to the lexicographically first part
    * when the workbook/rels parts are absent (non-standard producers). */
  def parseWorkbook(bytes: Array[Byte], width: Int): Seq[Array[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheets = mutable.SortedMap.empty[String, Array[Byte]]
    var workbookXml: Array[Byte] = null
    var relsXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (name == "xl/workbook.xml") workbookXml = zin.readAllBytes()
        else if (name == "xl/_rels/workbook.xml.rels") relsXml = zin.readAllBytes()
        else if (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))
          sheets += name -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheets.nonEmpty, "not an xlsx workbook: no xl/worksheets/*.xml part")
    val first = firstSheetPart(workbookXml, relsXml).flatMap(sheets.get)
    parseSheet(first.getOrElse(sheets.head._2), shared, width)
  }

  /** Resolve the first tab's worksheet part: first <sheet> of
    * xl/workbook.xml → its r:id → the rels Target, normalized to the
    * package path. None when either part is missing or unresolvable. */
  private def firstSheetPart(workbookXml: Array[Byte],
                             relsXml: Array[Byte]): Option[String] = {
    if (workbookXml == null || relsXml == null) return None
    var firstRid: String = null
    val r = newReader(workbookXml)
    while (r.hasNext && firstRid == null) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var i = 0
        while (i < r.getAttributeCount && firstRid == null) {
          if (r.getAttributeLocalName(i) == "id") firstRid = r.getAttributeValue(i)
          i += 1
        }
      }
    }
    if (firstRid == null) return None
    val rels = newReader(relsXml)
    while (rels.hasNext) {
      if (rels.next() == XMLStreamConstants.START_ELEMENT &&
        rels.getLocalName == "Relationship") {
        var id: String = null; var target: String = null
        var i = 0
        while (i < rels.getAttributeCount) {
          rels.getAttributeLocalName(i) match {
            case "Id" => id = rels.getAttributeValue(i)
            case "Target" => target = rels.getAttributeValue(i)
            case _ => ()
          }
          i += 1
        }
        if (id == firstRid && target != null)
          return Some(if (target.startsWith("/")) target.drop(1)
          else "xl/" + target.stripPrefix("./"))
      }
    }
    None
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

  // ---------------------------------------------------------------- write

  /** One workbook (S7, the `df.to_excel(...)` twin) streamed to `file` on
    * the driver via `toLocalIterator` — one partition in memory at a time,
    * never the whole frame. Single-file Excel output is inherently a
    * single-writer format; this is the pandas-parity path for SMALL frames
    * (reference/config tables), which is exactly what the reference writes
    * to Excel. `maxRows` guards the contract: a million-row frame belongs
    * in [[writeDir]] or parquet, and xlsx itself caps sheets at 2^20 rows.
    */
  def writeWorkbook(df: DataFrame, file: String, header: Boolean = true,
                    maxRows: Long = 1 << 20): Unit = {
    val schema = df.schema
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(file)))
    try {
      val it = df.toLocalIterator()
      var n = 0L
      writeArchive(out, schema, header, new Iterator[Row] {
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          n += 1
          require(n <= maxRows,
            s"more than $maxRows rows: single-workbook Excel output is for " +
              "small reference frames — use writeDir or a columnar sink")
          it.next()
        }
      })
    } finally out.close()
  }

  /** Scale path: one workbook PER PARTITION under `dir` (`part-NNNNN.xlsx`),
    * written executor-side — the inverse of [[readDir]], which reads the
    * directory back with one task per file. No driver funnel; partition
    * sizing controls workbook sizes.
    *
    * `dir` must be on a filesystem every executor shares (local mode, NFS,
    * a fuse mount) — java.nio cannot target HDFS/S3; use the DSv2
    * `graft-sink` for object-store-scale output. Each task writes a
    * temp file and ATOMIC_MOVEs it into place, so a retried or speculative
    * duplicate attempt replaces the file whole rather than interleaving
    * with a half-written original; the directory is created task-side
    * (driver-side mkdir would not exist on other machines). */
  def writeDir(df: DataFrame, dir: String, header: Boolean = true): Unit = {
    val schema = df.schema
    df.toDF().foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val dirPath = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(dirPath)
        val tmp = dirPath.resolve(f".part-$pid%05d.xlsx.${tc.taskAttemptId()}%d.tmp")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(tmp))
        try writeArchive(out, schema, header, rows) finally out.close()
        java.nio.file.Files.move(tmp, dirPath.resolve(f"part-$pid%05d.xlsx"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }

  /** The OOXML package: content types, package + workbook rels, workbook,
    * one sheet. Inline strings (no sharedStrings part — one pass, no string
    * table in memory); numeric/boolean cells use native cell types, null
    * cells are omitted. Interoperates with [[parseWorkbook]] and any
    * spreadsheet app. */
  private def writeArchive(os: java.io.OutputStream, schema: StructType,
                           header: Boolean, rows: Iterator[Row]): Unit = {
    val z = new ZipOutputStream(os)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.OutputStreamWriter(z, "UTF-8")
    w.write("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    def xmlEsc(s: String): String = {
      val sb = new StringBuilder(s.length)
      s.foreach {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // illegal in XML 1.0
        case c => sb.append(c)
      }
      sb.toString
    }
    def strCell(s: String): String = s"""<c t="inlineStr"><is><t xml:space="preserve">${xmlEsc(s)}</t></is></c>"""
    def writeRow(cells: Seq[String]): Unit = {
      w.write("<row>")
      cells.foreach(w.write)
      w.write("</row>")
    }
    if (header) writeRow(schema.map(f => strCell(f.name)))
    val types = schema.fields.map(_.dataType)
    rows.foreach { row =>
      writeRow(types.indices.map { i =>
        if (row.isNullAt(i)) "<c/>"
        else types(i) match {
          case BooleanType => s"""<c t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>"""
          case _: NumericType => s"<c><v>${row.get(i)}</v></c>"
          case _ => strCell(String.valueOf(row.get(i)))
        }
      })
    }
    w.write("</sheetData></worksheet>")
    w.flush()
    z.closeEntry()
    z.finish()
  }
}
