package graft.ops

import java.io.ByteArrayInputStream
import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2/S4 — REAL Excel container I/O (SURVEY.md §2.1; reference:
  * `timesheet_transform.py:17-29` `load_workbook`, `:105-138` in-place
  * workbook save, `timesheet_transform_v1.py:91-100` one-sheet-per-surname
  * output).
  *
  * An `.xlsx` workbook is a ZIP of XML parts — both codecs here are pure
  * JDK (`java.util.zip` + StAX), no third-party dependency, in the same
  * spirit as the PGM/WAV/Y4M byte decoders in [[Multimodal]]: the
  * container format is implemented, not adapted away.
  *
  * Scale shape: workbooks are inherently SMALL FILES (the format zips
  * whole XML sheets; Excel itself caps at ~1M rows), so the 100 TB story
  * is per-file parallelism — a corpus of workbooks scans via Spark's
  * `binaryFile` source and each executor parses its files' bytes with the
  * streaming StAX reader ([[readSheet]]); per-key workbook OUTPUT
  * ([[writeWorkbooks]]) shuffles by key once and writes files fully in
  * parallel (the [[Sinks.writePartitioned]] posture). One workbook must
  * fit one task — the format guarantees it.
  *
  * Reader semantics (what `openpyxl` gives the reference):
  *  - shared strings, inline strings, booleans, errors, numbers;
  *  - DATE-formatted numeric cells (style → builtin date numFmt ids or a
  *    custom y/m/d/h/s format code) convert from their Excel serial to
  *    ISO `yyyy-MM-dd` / `yyyy-MM-dd HH:mm:ss` strings — day-precision
  *    uses the 1900 date system anchored at 1899-12-30 (serials < 61,
  *    i.e. before the fictitious 1900-02-29, are not adjusted; every
  *    modern workbook is far past it);
  *  - all cells surface as STRINGS; typed casting is downstream's job
  *    (`try_cast` — the reference's tolerant-coercion posture, P5).
  */
object Xlsx {

  private val XlsxEpoch = LocalDate.of(1899, 12, 30)
  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val DateTimeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  // ───────────────────────── parsing (executor-side) ──────────────────

  /** All zip entries of a workbook, loaded into memory (bounded by the
    * format: one workbook per task). */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.toMap
  }

  private def staxReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** OOXML `_xHHHH_` escape decoding (ECMA-376 §22.9.2.19 ST_Xstring):
    * XML 1.0 cannot carry control characters, so producers encode them
    * as `_xHHHH_` (and escape a LITERAL such sequence by encoding its
    * underscore, `_x005F_xHHHH_`). Every conforming reader must decode;
    * openpyxl does, so the reference sees decoded text. */
  private val xEscape = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")

  private def decodeXstring(s: String): String = {
    if (!s.contains("_x")) return s
    val m = xEscape.matcher(s)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb ++= s.substring(last, m.start())
      sb += Integer.parseInt(m.group(1), 16).toChar
      last = m.end()
    }
    sb ++= s.substring(last)
    sb.result()
  }

  /** Collect the character content of the current element subtree's `<t>`
    * runs (a shared-string item or inline string may be split into rich
    * text runs), with `_xHHHH_` sequences decoded. Positioned ON the
    * container start element. */
  private def textRuns(r: javax.xml.stream.XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    var inT = false
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          depth += 1; if (r.getLocalName == "t") inT = true
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          depth -= 1; if (r.getLocalName == "t") inT = false
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
            javax.xml.stream.XMLStreamConstants.CDATA =>
          if (inT) sb ++= r.getText
        case _ =>
      }
    }
    decodeXstring(sb.result())
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = staxReader(bytes)
    val out = mutable.ArrayBuffer.empty[String]
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "si") out += textRuns(r)
    }
    r.close()
    out.toIndexedSeq
  }

  /** Builtin date/time numFmt ids (ECMA-376 §18.8.30) plus the locale
    * variants Excel emits; custom codes count as dates when they contain
    * a y/m/d/h/s token outside quoted literals and [] sections. */
  private def isDateCode(code: String): Boolean = {
    val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
    bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  private val builtinDateFmts: Set[Int] =
    (14 to 22).toSet ++ (27 to 36).toSet ++ (45 to 47).toSet ++ (50 to 58).toSet

  /** cellXf index → "formats as a date". */
  private def parseStyles(bytes: Array[Byte]): IndexedSeq[Boolean] = {
    val r = staxReader(bytes)
    val custom = mutable.Map.empty[Int, Boolean]
    val xfs = mutable.ArrayBuffer.empty[Boolean]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = Option(r.getAttributeValue(null, "formatCode"))
              for (i <- id; c <- code) custom(i) = isDateCode(c)
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
              xfs += (builtinDateFmts.contains(id) || custom.getOrElse(id, false))
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfs.toIndexedSeq
  }

  /** Sheet name → zip entry path, resolved through workbook.xml (sheet
    * order + r:id) and its .rels part — sheetN.xml file names do NOT
    * reliably match sheet order, so the relationship hop is mandatory. */
  private def sheetTargets(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels = mutable.Map.empty[String, String]
    for (bytes <- parts.get("xl/_rels/workbook.xml.rels")) {
      val r = staxReader(bytes)
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) rels(id) = target
        }
      }
      r.close()
    }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    for (bytes <- parts.get("xl/workbook.xml")) {
      val r = staxReader(bytes)
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // the r:id attribute is namespaced; scan attributes by local name
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          for (n <- Option(name); id <- rid; t <- rels.get(id)) {
            val path = if (t.startsWith("/")) t.drop(1)
            else if (t.startsWith("xl/")) t
            else "xl/" + t
            out += ((n, path))
          }
        }
      }
      r.close()
    }
    out.toSeq
  }

  /** Excel column ref ("BC" of "BC12") → 0-based column index. */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private val Xlsx1904Epoch = LocalDate.of(1904, 1, 1)

  /** Mac-Excel workbooks use the 1904 date system
    * (`<workbookPr date1904="1"/>`): serial 0 = 1904-01-01, no
    * fictitious leap day. */
  private def isDate1904(parts: Map[String, Array[Byte]]): Boolean = {
    var found = false
    for (bytes <- parts.get("xl/workbook.xml")) {
      val r = staxReader(bytes)
      while (!found && r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "workbookPr") {
          val v = Option(r.getAttributeValue(null, "date1904"))
          found = v.exists(x => x == "1" || x == "true")
        }
      }
      r.close()
    }
    found
  }

  private def serialToIso(raw: String, epoch: LocalDate): String = {
    val d = raw.toDouble
    val days = math.floor(d).toLong
    val frac = d - days
    val date = epoch.plusDays(days)
    if (frac == 0.0) date.format(DateFmt)
    else {
      val secs = math.round(frac * 86400.0)
      LocalDateTime.of(date, java.time.LocalTime.MIDNIGHT)
        .plusSeconds(secs).format(DateTimeFmt)
    }
  }

  /** Parse one worksheet part → (rowIdx 1-based, sparse cells). */
  private def parseSheet(
      bytes: Array[Byte],
      shared: IndexedSeq[String],
      dateXf: IndexedSeq[Boolean],
      epoch: LocalDate): Seq[(Long, Seq[(Int, String)])] = {
    val r = staxReader(bytes)
    val rows = mutable.ArrayBuffer.empty[(Long, Seq[(Int, String)])]
    var cells = mutable.ArrayBuffer.empty[(Int, String)]
    var rowIdx = 0L
    var autoRow = 0L
    var cellCol = -1
    var autoCol = 0
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var v = new StringBuilder
    var inlineStr: String = null
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              autoRow += 1
              rowIdx = Option(r.getAttributeValue(null, "r"))
                .map(_.toLong).getOrElse(autoRow)
              autoRow = rowIdx
              cells = mutable.ArrayBuffer.empty
              autoCol = 0
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(autoCol)
              autoCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).getOrElse(-1)
              v = new StringBuilder
              inlineStr = null
            case "is" => inlineStr = textRuns(r)
            case "v" => inV = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
            javax.xml.stream.XMLStreamConstants.CDATA =>
          if (inV) v ++= r.getText
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "c" =>
              val raw = v.result()
              val value: String = cellType match {
                case "s" =>
                  val i = raw.trim.toInt
                  if (i >= 0 && i < shared.length) shared(i) else null
                case "inlineStr" => inlineStr
                case "b" => if (raw.trim == "1") "true" else "false"
                case "str" | "e" => raw
                case _ => // numeric; date-styled numerics → ISO strings
                  if (raw.isEmpty) null
                  else if (cellStyle >= 0 && cellStyle < dateXf.length &&
                    dateXf(cellStyle) && raw.toDoubleOption.isDefined)
                    serialToIso(raw, epoch)
                  else raw
              }
              if (value != null) cells += ((cellCol, value))
            case "row" => rows += ((rowIdx, cells.toSeq))
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** Parse a whole workbook: (sheet, rowIdx, sparse cells) for every
    * sheet in `wanted` (None = all sheets). */
  private[ops] def parseWorkbook(
      bytes: Array[Byte],
      wanted: Option[Set[String]]): Seq[(String, Long, Seq[(Int, String)])] = {
    val parts = zipEntries(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val dateXf = parts.get("xl/styles.xml")
      .map(parseStyles).getOrElse(IndexedSeq.empty)
    val epoch = if (isDate1904(parts)) Xlsx1904Epoch else XlsxEpoch
    sheetTargets(parts)
      .filter { case (name, _) => wanted.forall(_.contains(name)) }
      .flatMap { case (name, path) =>
        parts.get(path).toSeq.flatMap(parseSheet(_, shared, dateXf, epoch))
          .map { case (i, cs) => (name, i, cs) }
      }
  }

  // ───────────────────────── reading (Spark surface) ──────────────────

  /** Raw long-form scan: one row per sheet row across every workbook the
    * glob matches — (`_file`, `_sheet`, `_row`, `cells` array). The
    * `binaryFile` source distributes the FILES; each executor parses its
    * own workbooks' bytes. Columned access: [[readSheet]]. */
  def readRaw(
      spark: SparkSession,
      path: String,
      sheets: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseWorkbook(bytes, sheets).map { case (sheet, rowIdx, cells) =>
          val width = cells.map(_._1).maxOption.map(_ + 1).getOrElse(0)
          val arr = new Array[String](width)
          cells.foreach { case (i, s) => arr(i) = s }
          (file, sheet, rowIdx, arr.toSeq)
        }
      }
      .toDF("_file", "_sheet", "_row", "cells")
  }

  /** Columned sheet scan — the `pd.read_excel` shape the reference opens
    * with. Column names come from the sheet's header row (parsed
    * driver-side from ONE workbook — the schema-first posture of
    * [[Sources.csvTable]]; data stays distributed); every data row pads /
    * truncates to that width. `sheet = None` reads EVERY sheet of every
    * workbook (sheets must share the header), keeping `_sheet` as lineage
    * — [[Sources.unionSheets]]' multi-sheet semantics straight from the
    * container. All value columns are STRING; cast downstream. */
  def readSheet(
      spark: SparkSession,
      path: String,
      sheet: Option[String] = None,
      header: Boolean = true): DataFrame = {
    val names = headerNames(spark, path, sheet, header)
    val raw = readRaw(spark, path, sheet.map(Set(_)))
    val width = names.length
    val dataRows = if (header) raw.filter(col("_row") > 1) else raw
    // get() (0-based) pads short rows with null instead of ANSI-throwing
    // like element_at would on a row narrower than the header
    val padded = (0 until width).map(i =>
      get(col("cells"), lit(i)).as(names(i)))
    dataRows.select(col("_file") +: col("_sheet").as("_sheet") +:
      col("_row").as("_row") +: padded: _*)
  }

  /** Driver-side header peek: the first matching workbook's requested (or
    * first) sheet, row 1. One bounded file read — the same cost class as
    * [[Similarity.topKIvfSampled]]'s codebook collect. */
  private def headerNames(
      spark: SparkSession,
      path: String,
      sheet: Option[String],
      header: Boolean): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(_.isFile)
          .filter(_.getPath.getName.endsWith(".xlsx"))
      else Seq(st)
    }.sortBy(_.getPath.toString)
    require(files.nonEmpty, s"Xlsx.readSheet: no workbook matches $path")
    val in = fs.open(files.head.getPath)
    val bytes = try in.readAllBytes() finally in.close()
    val rows = parseWorkbook(bytes, sheet.map(Set(_)))
    val bySheet = rows.groupBy(_._1)
    val firstSheet = sheet.getOrElse(
      sheetTargets(zipEntries(bytes)).headOption.map(_._1).getOrElse(
        throw new IllegalArgumentException("workbook has no sheets")))
    val sheetRows = bySheet.getOrElse(firstSheet,
      throw new IllegalArgumentException(s"no sheet '$firstSheet' in ${files.head.getPath}"))
    val first = sheetRows.minBy(_._2)
    val width = first._3.map(_._1).maxOption.map(_ + 1).getOrElse(0)
    if (!header) (0 until width).map(i => s"_c$i")
    else {
      val arr = new Array[String](width)
      first._3.foreach { case (i, s) => arr(i) = s }
      arr.toSeq.zipWithIndex.map {
        case (null, i) => s"_c$i"
        case ("", i) => s"_c$i"
        case (s, _) => s
      }
    }
  }

  // ───────────────────────── writing ──────────────────────────────────

  private def xmlEscape(s: String): String = {
    // a LITERAL _xHHHH_ in the data must survive the reader's ST_Xstring
    // decode: escape its own underscore first (ECMA-376 §22.9.2.19)
    val pre = if (s.contains("_x")) xEscape.matcher(s).replaceAll("_x005F_x$1_")
    else s
    val sb = new StringBuilder(pre.length + 8)
    pre.foreach {
      case '&' => sb ++= "&amp;"
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '"' => sb ++= "&quot;"
      // \r included: XML line-ending normalization would silently turn
      // a literal carriage return into \n on read
      case c if c < ' ' && c != '\t' && c != '\n' =>
        sb ++= f"_x${c.toInt}%04X_"
      case c => sb += c
    }
    sb.result()
  }

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  /** One `<c .../>` cell by Spark type: numerics stay numeric cells,
    * dates/timestamps become serials with the date/datetime style (so a
    * round trip exercises the reader's style decoding — and Excel shows
    * real dates), booleans are `t="b"`, everything else inline strings
    * (no shared-string table: deterministic single-pass output). */
  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case d: java.sql.Date =>
      val serial = java.time.temporal.ChronoUnit.DAYS
        .between(XlsxEpoch, d.toLocalDate)
      s"""<c r="$ref" s="1"><v>$serial</v></c>"""
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      val serial = java.time.temporal.ChronoUnit.DAYS
        .between(XlsxEpoch, ldt.toLocalDate)
      val frac = ldt.toLocalTime.toSecondOfDay / 86400.0
      s"""<c r="$ref" s="2"><v>${serial + frac}</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
        _: java.math.BigDecimal) =>
      s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case s =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s.toString)}</t></is></c>"""
  }

  private def sheetXml(header: Seq[String], rows: Iterable[Seq[Any]]): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= "<row r=\"1\">"
    header.zipWithIndex.foreach { case (h, i) =>
      sb ++= cellXml(colRef(i) + "1", if (h == null) "" else h)
    }
    sb ++= "</row>"
    var r = 2
    rows.foreach { cells =>
      sb ++= s"""<row r="$r">"""
      cells.zipWithIndex.foreach { case (v, i) =>
        sb ++= cellXml(colRef(i) + r, v)
      }
      sb ++= "</row>"
      r += 1
    }
    sb ++= "</sheetData></worksheet>"
    sb.result().getBytes("UTF-8")
  }

  /** Assemble a complete workbook: [Content_Types], rels, workbook,
    * styles (xf 0 general / 1 date / 2 datetime), one part per sheet.
    * Zip entry times are pinned → byte-deterministic output. */
  private[ops] def workbookBytes(
      sheets: Seq[(String, Seq[String], Iterable[Seq[Any]])]): Array[Byte] = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(315532800000L) // fixed: 1980-01-01, determinism
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    }
    val n = sheets.size
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString +
        "</Types>"
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
          .mkString +
        s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        "</Relationships>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>"
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="3"><xf numFmtId="0"/>""" +
        """<xf numFmtId="14" applyNumberFormat="1"/>""" +
        """<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>""" +
        "</styleSheet>"
    put("[Content_Types].xml", contentTypes.getBytes("UTF-8"))
    put("_rels/.rels", rootRels.getBytes("UTF-8"))
    put("xl/workbook.xml", workbook.getBytes("UTF-8"))
    put("xl/_rels/workbook.xml.rels", wbRels.getBytes("UTF-8"))
    put("xl/styles.xml", styles.getBytes("UTF-8"))
    sheets.zipWithIndex.foreach { case ((_, header, rows), i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(header, rows))
    }
    zos.close()
    bos.toByteArray
  }

  private def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    // executor-side: a fresh Configuration resolves the default
    // (file://, HDFS from core-site) filesystem; object stores with
    // session credentials should be written via their committers instead
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Write `df` as a single one-sheet workbook (the reference's plain
    * `wb.save(...)`, timesheet_transform.py:138). One task produces the
    * file — sized for report/extract output, not bulk storage (that is
    * parquet's job); the per-key fan-out shapes below are the parallel
    * paths. */
  def writeSheet(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val header = df.columns.toSeq
    df.coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      // empty frame still produces a header-only workbook
      writeFile(path, workbookBytes(Seq(
        (sheetName, header, rows.map(_.toSeq).toSeq))))
    }
  }

  /** One workbook, one sheet PER KEY VALUE, key column dropped from the
    * sheet body — exactly the reference's per-surname sheet loop
    * (timesheet_transform_v1.py:91-100), including the 31-char sheet-name
    * cap (P11). Single-task by necessity (one output file); per-key
    * parallel output is [[writeWorkbooks]]. */
  def writeSheets(
      df: DataFrame,
      sheetCol: String,
      path: String,
      maxSheetLen: Int = 31): Unit = {
    val keyIdx = df.columns.indexOf(sheetCol)
    require(keyIdx >= 0, s"no column '$sheetCol'")
    val header = df.columns.toSeq.patch(keyIdx, Nil, 1)
    df.coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      val grouped = rows.toSeq.groupBy(r => String.valueOf(r.get(keyIdx)))
      val sheets = grouped.toSeq.sortBy(_._1).map { case (k, rs) =>
        (k.take(maxSheetLen), header, rs.map(_.toSeq.patch(keyIdx, Nil, 1)))
      }
      if (sheets.nonEmpty) writeFile(path, workbookBytes(sheets))
    }
  }

  /** One workbook FILE per key value, written fully in parallel after one
    * shuffle by key (the [[Sinks.writePartitioned]] posture — no
    * driver-side per-key loop): `outDir/<key>.xlsx`, key truncated to
    * `maxKeyLen` chars and the key column dropped from the body. Each
    * key's rows must fit one task — the workbook format already demands
    * that. */
  def writeWorkbooks(
      df: DataFrame,
      keyCol: String,
      outDir: String,
      maxKeyLen: Int = 31,
      sheetName: String = "Sheet1"): Unit = {
    val keyIdx = df.columns.indexOf(keyCol)
    require(keyIdx >= 0, s"no column '$keyCol'")
    val header = df.columns.toSeq.patch(keyIdx, Nil, 1)
    df.repartition(col(keyCol)).foreachPartition { (rows: Iterator[Row]) =>
      rows.toSeq.groupBy(r => String.valueOf(r.get(keyIdx)))
        .foreach { case (k, rs) =>
          val name = k.take(maxKeyLen)
          writeFile(s"$outDir/$name.xlsx", workbookBytes(Seq(
            (sheetName, header, rs.map(_.toSeq.patch(keyIdx, Nil, 1))))))
        }
    }
  }
}
