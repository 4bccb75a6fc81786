package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Xlsx

/** The self-contained .xlsx source/sink (SURVEY §2 S3 — the reference's
  * `pd.read_excel` upload path). */
class XlsxSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("column ref arithmetic round-trips") {
    for ((s, i) <- Seq("A" -> 0, "Z" -> 25, "AA" -> 26, "AZ" -> 51, "BC" -> 54, "AAA" -> 702)) {
      assert(Xlsx.colLetters(i) == s, s"letters($i)")
      assert(Xlsx.colIndex(s + "17") == i, s"index($s)")
    }
  }

  test("write -> read round-trip: numbers, escaped strings, unicode, null cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val path = s"$dir/t.xlsx"
    Xlsx.write(path, Seq("id", "name", "score"), Iterator(
      Seq(1L, "plain", 1.5),
      Seq(2L, "a&b <c> \"d\"", -2.25),     // XML metacharacters must escape
      Seq(3L, "独角兽 ünïcödé", 0.1),       // multi-byte text
      Seq(4L, null, 1.0e300),              // null string cell -> absent
      Seq(5L, "nullnum", null)))           // null numeric cell -> absent
    val got = Xlsx.read(spark, path, schema).orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "plain", 1.5),
      (2L, "a&b <c> \"d\"", -2.25),
      (3L, "独角兽 ünïcödé", 0.1),
      (4L, null, 1.0e300),
      (5L, "nullnum", null)))
  }

  test("reader handles shared strings (plain and rich-text runs) from foreign writers") {
    // hand-build the xlsx our writer never produces: t="s" cells backed by
    // xl/sharedStrings.xml, one entry split into rich-text <r> runs — the
    // layout Excel itself and openpyxl emit
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_ss").toString
    val path = s"$dir/ss.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    val m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
      "</Types>")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      s"""<workbook xmlns="$m"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    part("xl/sharedStrings.xml",
      s"""<sst xmlns="$m" count="3" uniqueCount="3">""" +
      "<si><t>id</t></si>" +
      "<si><r><t>ri</t></r><r><t>ch</t></r></si>" + // rich runs concat to "rich"
      "<si><t xml:space=\"preserve\">sp ace</t></si></sst>")
    part("xl/worksheets/sheet1.xml",
      s"""<worksheet xmlns="$m"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>name</t></is></c></row>""" +
      """<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>1</v></c></row>""" +
      """<row r="3"><c r="A3"><v>8</v></c><c r="B3" t="s"><v>2</v></c></row>""" +
      "</sheetData></worksheet>")
    zos.close()
    val s2 = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val got = Xlsx.read(spark, path, s2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((7L, "rich"), (8L, "sp ace")))
  }

  test("foreign numeric/boolean cells: scientific notation and t=\"b\" flags") {
    // Excel writers emit large doubles in scientific notation and booleans
    // as t="b" 0/1 cells — neither shape our own writer produces
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_nb").toString
    val path = s"$dir/nb.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    val m = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      "</Types>")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      s"""<workbook xmlns="$m"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>""")
    part("xl/worksheets/sheet1.xml",
      s"""<worksheet xmlns="$m"><sheetData>""" +
      """<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c>""" +
      """<c r="B1" t="inlineStr"><is><t>ok</t></is></c></row>""" +
      """<row r="2"><c r="A2"><v>1.5E8</v></c><c r="B2" t="b"><v>1</v></c></row>""" +
      """<row r="3"><c r="A3"><v>-3.25e-2</v></c><c r="B3" t="b"><v>0</v></c></row>""" +
      "</sheetData></worksheet>")
    zos.close()
    val s2 = StructType(Seq(StructField("x", DoubleType), StructField("ok", BooleanType)))
    val got = Xlsx.read(spark, path, s2).orderBy(col("x").desc).collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1.5e8, true), (-0.0325, false)))
  }

  test("declared schema is enforced: missing header field fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_m").toString
    val path = s"$dir/m.xlsx"
    Xlsx.write(path, Seq("id"), Iterator(Seq(1L)))
    val e = intercept[IllegalArgumentException] { Xlsx.read(spark, path, schema) }
    assert(e.getMessage.contains("name"))
  }

  test("duplicated header naming a schema field fails loudly, never reads the wrong column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_d").toString
    val path = s"$dir/d.xlsx"
    // two 'id' columns with different data: last-wins binding would
    // silently read 99/98 — the corrupted-upload-fails contract says abort
    Xlsx.write(path, Seq("id", "name", "score", "id"), Iterator(
      Seq(1L, "a", 1.0, 99L), Seq(2L, "b", 2.0, 98L)))
    val e = intercept[IllegalArgumentException] { Xlsx.read(spark, path, schema) }
    assert(e.getMessage.contains("duplicated") && e.getMessage.contains("id"))
    // a duplicate the schema does NOT reference stays readable (extra
    // sheet columns are declared-ignored, duplicated or not)
    val path2 = s"$dir/d2.xlsx"
    Xlsx.write(path2, Seq("id", "name", "score", "extra", "extra"), Iterator(
      Seq(1L, "a", 1.0, "x", "y")))
    assert(Xlsx.read(spark, path2, schema).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("excelRoundtrip query equals the direct parquet aggregate") {
    val got = graft.ops.SourceOps.excelRoundtrip(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = graft.sources.Tables.load(spark, sf0001, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }
}
