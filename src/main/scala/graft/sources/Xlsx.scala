package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal self-contained XLSX source/sink — closes the reference's Excel
  * upload path (`pd.read_excel`, `app_test.py:264-265`), previously the one
  * declared SURVEY §2 gap (S3: "no Spark Excel source in the zero-egress
  * jar set"). An .xlsx file is a ZIP of SpreadsheetML XML parts, so the
  * JDK's own `java.util.zip` + StAX (`javax.xml.stream`) read it with ZERO
  * added dependencies; this module implements the subset a tabular upload
  * uses — sheet 1's `<sheetData>`, shared strings (plain `<t>` and
  * rich-text `<r>` runs), inline strings, and numeric cells. Styles,
  * formulas (cached values are read), merged cells, and multiple sheets
  * are out of scope, exactly as they are for `pd.read_excel`'s happy path.
  *
  * Scale posture: an .xlsx is the reference's single-file UPLOAD format
  * (hard-capped at 2^20 rows by the format itself), so it is parsed where
  * an upload lives — one bounded file, then `createDataFrame` hands the
  * rows to the engine; the 100 TB path is parquet, and this source exists
  * so a user of the reference can bring the same spreadsheet. The StAX
  * cursor parser is streaming (no DOM), so memory is row-sized + the
  * shared-string table, same as any spreadsheet reader.
  *
  * Type discipline mirrors [[Tables.loadCsv]]: the caller declares the
  * schema; text cells cast under ANSI mode, so a corrupted upload FAILS
  * instead of silently nulling into the scoring pipeline's imputers.
  * Missing/empty cells become NULL (pandas parity).
  */
object Xlsx {

  private val SheetMain =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  /** "BC" → 54 (0-based column index). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** 0-based column index → "A", "BC", … */
  private[graft] def colLetters(idx: Int): String = {
    var n = idx + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Parse one XML part with a fresh StAX cursor reader. */
  private def withReader[A](zf: ZipFile, name: String)(
      body: javax.xml.stream.XMLStreamReader => A): Option[A] = {
    Option(zf.getEntry(name)).map { e =>
      val in = zf.getInputStream(e)
      val f = XMLInputFactory.newInstance()
      // hygiene: never resolve external entities from an untrusted upload
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      val r = f.createXMLStreamReader(in)
      try body(r) finally { r.close(); in.close() }
    }
  }

  /** All raw rows of sheet 1 as (0-based row, sparse colIdx → text). Cell
    * text is resolved per the `t` attribute: `s` shared string, `inlineStr`
    * inline, `b` boolean (0/1 text kept), default = the literal `<v>`. */
  private[graft] def rawRows(path: String): Seq[mutable.Map[Int, String]] = {
    val zf = new ZipFile(path)
    try {
      val shared = mutable.ArrayBuffer[String]()
      withReader(zf, "xl/sharedStrings.xml") { r =>
        val sb = new StringBuilder
        var inT = false; var depth = 0
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => sb.clear()
                case "t"  => inT = true
                case _    => ()
              }
            case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t"  => inT = false
                case "si" => shared += sb.toString // concat of all <t> runs
                case _    => ()
              }
            case _ => ()
          }
        }
        depth // unused
      }
      val sheetName = zf.entries().asScala.map(_.getName)
        .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
        .toSeq.sorted.headOption
        .getOrElse(throw new IllegalArgumentException(s"$path: no worksheet part"))
      val rows = mutable.ArrayBuffer[mutable.Map[Int, String]]()
      withReader(zf, sheetName) { r =>
        var cur: mutable.Map[Int, String] = null
        var cellCol = -1; var cellType = ""; var inV = false; var inIsT = false
        val text = new StringBuilder
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => cur = mutable.Map.empty
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(cellCol + 1)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text.clear()
              case "v" => inV = true
              case "t" if cellType == "inlineStr" => inIsT = true
              case _ => ()
            }
            case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" =>
                val v = cellType match {
                  case "s"         => shared(text.toString.trim.toInt)
                  case "inlineStr" => text.toString
                  // booleans are stored as 0/1; surface them as the words
                  // so BOTH boolean and string schema targets read sanely
                  case "b"         => if (text.toString.trim == "1") "true" else "false"
                  case _           => text.toString
                }
                if (cur != null && v.nonEmpty) cur(cellCol) = v
              case "row" => if (cur != null) { rows += cur; cur = null }
              case _ => ()
            }
            case _ => ()
          }
        }
      }
      rows.toSeq
    } finally zf.close()
  }

  /** Read sheet 1 with a declared schema: row 1 is the header, columns are
    * matched to schema fields BY NAME (extra sheet columns ignored, missing
    * ones null), and every value casts from text under ANSI semantics. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rows = rawRows(path)
    require(rows.nonEmpty, s"$path: empty sheet (no header row)")
    val header = rows.head.toSeq.sortBy(_._1).map(_._2)
    // corrupted-upload-fails contract: a duplicated header name that the
    // schema references would silently bind the field to ONE of the
    // duplicate columns (map last-wins) and read the wrong column's data
    // with no error — fail loudly instead, like every bad-cast does
    val dups = header.groupBy(identity).collect {
      case (name, occ) if occ.size > 1 && schema.fieldNames.contains(name) => name
    }
    require(dups.isEmpty,
      s"$path: header $header has duplicated schema column(s) ${dups.mkString(", ")}")
    val colOf: Map[String, Int] =
      rows.head.map { case (i, name) => name -> i }.toMap
    require(schema.fields.forall(f => colOf.contains(f.name)),
      s"$path: header $header is missing schema fields " +
        schema.fields.map(_.name).filterNot(colOf.contains).mkString(", "))
    val stringSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val data: Seq[Row] = rows.tail.map { m =>
      Row.fromSeq(schema.fields.toSeq.map(f => colOf.get(f.name).flatMap(m.get).orNull))
    }
    spark.createDataFrame(data.asJava, stringSchema)
      .select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  private def xmlEsc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** Write a minimal single-sheet .xlsx: header + rows. Strings go as
    * inline strings, numbers (and anything else) as numeric/plain `<v>`
    * text via `toString` — `Double.toString` round-trips bit-exactly, so a
    * write→read cycle reproduces values. Nulls become absent cells. */
  def write(path: String, header: Seq[String], rows: Iterator[Seq[Any]]): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    try {
      part("[Content_Types].xml", decl +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        "</Types>")
      part("_rels/.rels", decl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
      part("xl/workbook.xml", decl +
        s"""<workbook xmlns="$SheetMain" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels", decl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        "</Relationships>")
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, "UTF-8")
      w.write(decl + s"""<worksheet xmlns="$SheetMain"><sheetData>""")
      def writeRow(rowIdx: Int, vals: Seq[Any]): Unit = {
        w.write(s"""<row r="$rowIdx">""")
        vals.zipWithIndex.foreach { case (v, c) =>
          val ref = colLetters(c) + rowIdx
          v match {
            case null => ()
            case s: String =>
              w.write(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEsc(s)}</t></is></c>""")
            case other =>
              w.write(s"""<c r="$ref"><v>${xmlEsc(other.toString)}</v></c>""")
          }
        }
        w.write("</row>")
      }
      writeRow(1, header)
      var r = 2
      rows.foreach { vals => writeRow(r, vals); r += 1 }
      w.write("</sheetData></worksheet>")
      w.flush()
      zos.closeEntry()
    } finally zos.close()
  }
}
