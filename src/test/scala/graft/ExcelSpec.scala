package graft

import java.nio.file.{Files => JFiles}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.sources.{Excel, Files}

/** Native .xlsx read (S6): the fixture is a REAL workbook — complete OPC
  * part set (content types, rels, workbook, shared strings, worksheet) —
  * generated with java.util.zip, exactly what Excel itself would zip up. */
class ExcelSpec extends SparkSpec {

  private def part(name: String, body: String): (String, Array[Byte]) =
    name -> (s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + body)
      .getBytes("UTF-8")

  /** rows: Seq of cells; None = missing cell, Left = number/bool literal with
    * type attr, Right = shared string. */
  private def writeWorkbook(path: java.nio.file.Path,
                            sharedStrings: Seq[String],
                            sheetXml: String): Unit = {
    val parts = Seq(
      part("[Content_Types].xml",
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
          """</Types>"""),
      part("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      part("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      part("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      part("xl/sharedStrings.xml",
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedStrings.length}" uniqueCount="${sharedStrings.length}">""" +
          sharedStrings.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"),
      part("xl/worksheets/sheet1.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          sheetXml + "</sheetData></worksheet>"))
    val zos = new ZipOutputStream(JFiles.newOutputStream(path))
    parts.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
  }

  private val schema = new StructType()
    .add("sku", StringType).add("qty", LongType)
    .add("price", DoubleType).add("active", BooleanType)

  test("S6: reads a real .xlsx — shared/inline strings, numbers, booleans, gaps") {
    val dir = JFiles.createTempDirectory("xlsx")
    writeWorkbook(dir.resolve("ref1.xlsx"),
      sharedStrings = Seq("sku", "qty", "price", "active", "A-100", "B&amp;200"),
      sheetXml =
        // header via shared strings
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>""" +
          """<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>""" +
          // shared string + numbers + boolean
          """<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2"><v>7</v></c>""" +
          """<c r="C2"><v>19.99</v></c><c r="D2" t="b"><v>1</v></c></row>""" +
          // XML-escaped shared string, gap in C (missing cell), false bool
          """<row r="3"><c r="A3" t="s"><v>5</v></c><c r="B3"><v>12</v></c>""" +
          """<c r="D3" t="b"><v>0</v></c></row>""" +
          // inline string + formula cached value, out-of-order refs
          """<row r="4"><c r="D4" t="b"><v>1</v></c><c r="B4"><v>3</v></c>""" +
          """<c r="A4" t="inlineStr"><is><t>C-300</t></is></c><c r="C4"><v>5.5</v></c></row>""")

    val got = Files.excelDir(spark, dir.toString, schema)
      .orderBy("sku").collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3)))
    assert(got.toSeq === Seq(
      ("A-100", 7L, 19.99, true),
      ("B&200", 12L, null, false),
      ("C-300", 3L, 5.5, true)))
  }

  test("directory scan unions workbooks, one task per file") {
    val dir = JFiles.createTempDirectory("xlsx-multi")
    for (i <- 1 to 3)
      writeWorkbook(dir.resolve(s"ref$i.xlsx"),
        sharedStrings = Seq("sku", s"F$i"),
        sheetXml =
          """<row r="1"><c r="A1" t="s"><v>0</v></c></row>""" +
            s"""<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>$i</v></c>""" +
            s"""<c r="C2"><v>$i.5</v></c><c r="D2" t="b"><v>1</v></c></row>""")
    val got = Files.excelDir(spark, dir.toString, schema)
    assert(got.count() === 3)
    assert(got.select("sku").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq === Seq("F1", "F2", "F3"))
  }

  test("refToCol decodes base-26 column letters") {
    assert(Excel.refToCol("A1") === 0)
    assert(Excel.refToCol("Z9") === 25)
    assert(Excel.refToCol("AA12") === 26)
    assert(Excel.refToCol("BC23") === 54)
  }

  test("S7: single-workbook write round-trips through the reader") {
    import spark.implicits._
    val df = Seq(
      ("A-100", 7L, 19.99, true),
      ("B&<200>", 12L, 0.25, false), // XML metachars must escape
      ("C 300", 3L, 5.5, true))
      .toDF("sku", "qty", "price", "active")
    val dir = JFiles.createTempDirectory("xlsx-write")
    val file = dir.resolve("out.xlsx").toString
    Files.writeExcel(df, file)
    val back = Files.excelDir(spark, dir.toString, schema)
    assert(back.orderBy("sku").collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
      === Seq(("A-100", 7L, 19.99, true), ("B&<200>", 12L, 0.25, false), ("C 300", 3L, 5.5, true)))
  }

  test("S7: null cells and the maxRows guard") {
    import spark.implicits._
    val df = Seq(("x", Some(1L)), ("y", None)).toDF("sku", "qty")
    val dir = JFiles.createTempDirectory("xlsx-null")
    Files.writeExcel(df, dir.resolve("n.xlsx").toString)
    val s2 = new StructType().add("sku", StringType).add("qty", LongType)
    val back = Files.excelDir(spark, dir.toString, s2).orderBy("sku").collect()
    assert(back.map(r => (r.get(0), r.get(1))).toSeq === Seq(("x", 1L), ("y", null)))
    val e = intercept[IllegalArgumentException] {
      Excel.writeWorkbook(df, dir.resolve("cap.xlsx").toString, maxRows = 1)
    }
    assert(e.getMessage.contains("small reference frames"))
  }

  test("S7 scale path: one workbook per partition, read back as a union") {
    import spark.implicits._
    val df = (1 to 20).map(i => (f"P$i%02d", i.toLong)).toDF("sku", "qty")
      .repartition(4)
    val dir = JFiles.createTempDirectory("xlsx-dir")
    Excel.writeDir(df, dir.toString)
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length > 1 && files.length <= 4)
    val s2 = new StructType().add("sku", StringType).add("qty", LongType)
    assert(Files.excelDir(spark, dir.toString, s2).count() === 20)
  }
}
