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

  /** All zip entries of a workbook in ARCHIVE ORDER, loaded into memory
    * (bounded by the format: one workbook per task). Order matters for the
    * patch-through writer, which re-emits untouched parts verbatim. */
  private[ops] def zipEntriesOrdered(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += ((e.getName, zin.readAllBytes()))
      e = zin.getNextEntry
    }
    zin.close()
    out.toSeq
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] =
    zipEntriesOrdered(bytes).toMap

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
    val (names, headerRow) = headerNames(spark, path, sheet, header)
    val raw = readRaw(spark, path, sheet.map(Set(_)))
    val width = names.length
    // data rows = everything below the DISCOVERED header row (a foreign
    // workbook may omit leading blank rows from sheetData, so the header
    // is the sheet's minimum present row — not literally row 1)
    val dataRows = if (header) raw.filter(col("_row") > headerRow) else raw
    // get() (0-based) pads short rows with null instead of ANSI-throwing
    // like element_at would on a row narrower than the header
    val padded = (0 until width).map(i =>
      get(col("cells"), lit(i)).as(names(i)))
    dataRows.select(col("_file") +: col("_sheet").as("_sheet") +:
      col("_row").as("_row") +: padded: _*)
  }

  /** Driver-side header peek: the first matching workbook's requested (or
    * first) sheet's minimum present row → (column names, header row index).
    * One bounded file read — the same cost class as
    * [[Similarity.topKIvfSampled]]'s codebook collect. */
  private def headerNames(
      spark: SparkSession,
      path: String,
      sheet: Option[String],
      header: Boolean): (Seq[String], Long) = {
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
    if (!header) ((0 until width).map(i => s"_c$i"), 0L)
    else {
      val arr = new Array[String](width)
      first._3.foreach { case (i, s) => arr(i) = s }
      val names = arr.toSeq.zipWithIndex.map {
        case (null, i) => s"_c$i"
        case ("", i) => s"_c$i"
        case (s, _) => s
      }
      (names, first._2)
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

  /** The session's Hadoop conf flattened to serializable (key, value)
    * pairs so executor-side writers resolve the SAME filesystems the
    * session's reads do (object-store credentials, custom fs impls) —
    * `Configuration` itself is not Java-serializable and Spark's own
    * `SerializableConfiguration` wrapper is `private[spark]`. */
  private def confProps(spark: SparkSession): Array[(String, String)] = {
    val c = spark.sessionState.newHadoopConf()
    val buf = mutable.ArrayBuffer.empty[(String, String)]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  private def writeFile(
      path: String,
      bytes: Array[Byte],
      props: Array[(String, String)]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    props.foreach { case (k, v) => conf.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Excel forbids `[ ] : * ? / \` in sheet names; `/`/`\` in a file key
    * would also escape the output directory. Fail loud, don't mangle. */
  private def requireCleanKey(k: String, what: String): Unit = {
    require(k != null, s"$what is null")
    require(!k.exists(c => "[]:*?/\\".indexOf(c) >= 0) && !k.exists(_ < ' '),
      s"$what '$k' contains a character invalid in sheet/file names ([]:*?/\\ or control)")
  }

  /** Distinct keys must stay distinct AFTER the 31-char truncation —
    * otherwise two keys silently overwrite one sheet/file. */
  private def requireNoTruncationCollision(
      keys: Iterable[String], maxLen: Int, what: String): Unit = {
    val collided = keys.groupBy(_.take(maxLen)).filter(_._2.size > 1)
    require(collided.isEmpty,
      s"$what collide after $maxLen-char truncation: " +
        collided.map { case (t, ks) => s"'$t' <- ${ks.mkString(", ")}" }.mkString("; "))
  }

  /** Write `df` as a single one-sheet workbook (the reference's plain
    * `wb.save(...)`, timesheet_transform.py:138). One task produces the
    * file — sized for report/extract output, not bulk storage (that is
    * parquet's job); the per-key fan-out shapes below are the parallel
    * paths. */
  def writeSheet(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val header = df.columns.toSeq
    val props = confProps(df.sparkSession)
    df.coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      // empty frame still produces a header-only workbook
      writeFile(path, workbookBytes(Seq(
        (sheetName, header, rows.map(_.toSeq).toSeq))), props)
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
    val props = confProps(df.sparkSession)
    df.coalesce(1).foreachPartition { (rows: Iterator[Row]) =>
      val grouped = rows.toSeq.groupBy(r => String.valueOf(r.get(keyIdx)))
      grouped.keys.foreach(requireCleanKey(_, "sheet key"))
      requireNoTruncationCollision(grouped.keys, maxSheetLen, "sheet keys")
      val sheets = grouped.toSeq.sortBy(_._1).map { case (k, rs) =>
        (k.take(maxSheetLen), header, rs.map(_.toSeq.patch(keyIdx, Nil, 1)))
      }
      if (sheets.nonEmpty) writeFile(path, workbookBytes(sheets), props)
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
    val props = confProps(df.sparkSession)
    // global precheck: truncation collisions cross partitions, so they
    // cannot be detected task-locally. One distinct-agg job over the key
    // column — bounded by the number of OUTPUT FILES, which this sink is
    // inherently bounded by (one workbook per key).
    val keys = df.select(col(keyCol).cast("string")).distinct()
      .collect().map(r => String.valueOf(r.get(0)))
    keys.foreach(requireCleanKey(_, "workbook key"))
    requireNoTruncationCollision(keys, maxKeyLen, "workbook keys")
    df.repartition(col(keyCol)).foreachPartition { (rows: Iterator[Row]) =>
      rows.toSeq.groupBy(r => String.valueOf(r.get(keyIdx)))
        .foreach { case (k, rs) =>
          val name = k.take(maxKeyLen)
          writeFile(s"$outDir/$name.xlsx", workbookBytes(Seq(
            (sheetName, header, rs.map(_.toSeq.patch(keyIdx, Nil, 1))))), props)
        }
    }
  }

  // ───────────────── style-preserving in-place patch (S5) ──────────────

  /** Attribute map of one start-tag's text (machine-generated OOXML:
    * double- or single-quoted values, no `<`/`>` inside values). */
  private val attrPat =
    java.util.regex.Pattern.compile("""([\w:.-]+)\s*=\s*(?:"([^"]*)"|'([^']*)')""")

  private def tagAttrs(tag: String): Map[String, String] = {
    val m = mutable.Map.empty[String, String]
    val mm = attrPat.matcher(tag)
    while (mm.find())
      m(mm.group(1)) = if (mm.group(2) != null) mm.group(2) else mm.group(3)
    m.toMap
  }

  /** Render a PATCHED cell: the reference (`cell.value = x` in openpyxl,
    * timesheet_transform.py:131-136) replaces the VALUE and keeps the
    * cell's style, so the existing `s` attribute is carried over verbatim.
    * Strings become inline strings (the shared-string table is never
    * touched — unreferenced entries are valid OOXML); dates/timestamps
    * become serials ONLY when the target cell already has a style to
    * display them (a foreign workbook's `s` indexes its own styles.xml,
    * which this writer never edits), else self-describing ISO strings. */
  private def patchedCellXml(
      row: Long,
      colI: Int,
      refAttr: Option[String],
      styleAttr: Option[String],
      v: Any): String = {
    val ref = refAttr.getOrElse(colRef(colI) + row)
    val sA = styleAttr.map(x => s""" s="$x"""").getOrElse("")
    v match {
      case null => s"""<c r="$ref"$sA/>"""
      case d: java.sql.Date if styleAttr.isDefined =>
        val serial = java.time.temporal.ChronoUnit.DAYS
          .between(XlsxEpoch, d.toLocalDate)
        s"""<c r="$ref"$sA><v>$serial</v></c>"""
      case t: java.sql.Timestamp if styleAttr.isDefined =>
        val ldt = t.toLocalDateTime
        val serial = java.time.temporal.ChronoUnit.DAYS
          .between(XlsxEpoch, ldt.toLocalDate)
        val frac = ldt.toLocalTime.toSecondOfDay / 86400.0
        s"""<c r="$ref"$sA><v>${serial + frac}</v></c>"""
      case b: Boolean =>
        s"""<c r="$ref"$sA t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
          _: java.math.BigDecimal) =>
        s"""<c r="$ref"$sA t="n"><v>$n</v></c>"""
      case s =>
        s"""<c r="$ref"$sA t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s.toString)}</t></is></c>"""
    }
  }

  private def appendPendingCells(
      sb: StringBuilder, row: Long, pend: mutable.Map[Int, Any]): Unit = {
    pend.toSeq.sortBy(_._1).foreach { case (c, v) =>
      sb ++= patchedCellXml(row, c, None, None, v)
    }
    pend.clear()
  }

  /** SURGICAL worksheet rewrite: every byte outside the exact spans of
    * matched `<c>` elements is copied VERBATIM — untouched cells keep
    * their bytes (styles, formulas, attribute order and all); only the
    * matched cells' elements are re-rendered (style attribute preserved).
    * `updates` keys are (1-based sheet row, 0-based column). A matched
    * row missing the target cell gets it appended before `</row>`
    * (openpyxl materializes missing cells on assignment); updates for
    * ABSENT rows are ignored — update-only, never insert
    * (timesheet_transform.py:105-138).
    *
    * Safe to scan textually: XML character data and attribute values
    * cannot contain a literal `<`, so `</c>` is unambiguous, and `<c`
    * / `<row` are matched only when followed by a name-ending char. */
  private[ops] def patchSheetXml(
      xmlBytes: Array[Byte],
      updates: Map[(Long, Int), Any]): Array[Byte] = {
    val s = new String(xmlBytes, "UTF-8")
    val byRow: Map[Long, Map[Int, Any]] =
      updates.groupBy(_._1._1).map { case (r, m) =>
        r -> m.map { case ((_, c), v) => c -> v }
      }
    val out = new StringBuilder(s.length + 256)
    def nameEnd(i: Int): Boolean =
      i >= s.length || " \t\r\n>/".indexOf(s.charAt(i)) >= 0
    var i = 0
    var autoRow = 0L
    var curRow = 0L
    var autoCol = 0
    val rowPending = mutable.Map.empty[Int, Any]
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { out ++= s.substring(i); i = s.length }
      else {
        out ++= s.substring(i, lt)
        if (s.startsWith("<row", lt) && nameEnd(lt + 4)) {
          val gt = s.indexOf('>', lt)
          require(gt > lt, "malformed <row> tag")
          val selfClose = s.charAt(gt - 1) == '/'
          val attrs = tagAttrs(s.substring(lt + 4, gt))
          curRow = attrs.get("r").map(_.toLong).getOrElse(autoRow + 1)
          autoRow = curRow
          autoCol = 0
          rowPending.clear()
          rowPending ++= byRow.getOrElse(curRow, Map.empty)
          if (selfClose && rowPending.nonEmpty) {
            // expand the empty row: <row .../> → <row ...>cells</row>
            out ++= s.substring(lt, gt - 1); out += '>'
            appendPendingCells(out, curRow, rowPending)
            out ++= "</row>"
          } else out ++= s.substring(lt, gt + 1)
          i = gt + 1
        } else if (s.startsWith("</row", lt)) {
          if (rowPending.nonEmpty) appendPendingCells(out, curRow, rowPending)
          val gt = s.indexOf('>', lt)
          out ++= s.substring(lt, gt + 1)
          i = gt + 1
        } else if (s.startsWith("<c", lt) && nameEnd(lt + 2)) {
          val gt = s.indexOf('>', lt)
          require(gt > lt, "malformed <c> tag")
          val selfClose = s.charAt(gt - 1) == '/'
          val attrs = tagAttrs(s.substring(lt + 2, gt))
          val colI = attrs.get("r").map(colIndex).getOrElse(autoCol)
          autoCol = colI + 1
          val cellEnd =
            if (selfClose) gt + 1
            else {
              val close = s.indexOf("</c>", gt)
              require(close >= 0, "unterminated <c> element")
              close + 4
            }
          rowPending.remove(colI) match {
            case Some(v) =>
              out ++= patchedCellXml(curRow, colI, attrs.get("r"), attrs.get("s"), v)
            case None => out ++= s.substring(lt, cellEnd)
          }
          i = cellEnd
        } else {
          val gt = s.indexOf('>', lt)
          if (gt < 0) { out ++= s.substring(lt); i = s.length }
          else { out ++= s.substring(lt, gt + 1); i = gt + 1 }
        }
      }
    }
    out.result().getBytes("UTF-8")
  }

  /** S5 — STYLE-PRESERVING in-place workbook patch: the reference's final
    * sink opens an existing workbook, overwrites only matched cells'
    * values, and saves (`timesheet_transform.py:105-138`, save at `:138`)
    * — openpyxl preserves every untouched cell's style, column widths and
    * sheet furniture. This writer goes one stronger: every zip part OTHER
    * than the patched sheet XMLs is re-emitted BYTE-VERBATIM (styles.xml,
    * sharedStrings.xml, themes, drawings, column widths — all untouched),
    * and within a patched sheet only the matched `<c>` spans change.
    * `updates`: sheet name → ((1-based row, 0-based col) → new value). */
  def patchWorkbook(
      target: Array[Byte],
      updates: Map[String, Map[(Long, Int), Any]]): Array[Byte] = {
    val parts = zipEntriesOrdered(target)
    val partMap = parts.toMap
    val targets = sheetTargets(partMap).toMap
    val unknown = updates.keySet.diff(targets.keySet)
    require(unknown.isEmpty,
      s"patchWorkbook: workbook has no sheet(s) ${unknown.mkString(", ")}")
    val byPath: Map[String, Map[(Long, Int), Any]] =
      updates.map { case (sheet, m) => targets(sheet) -> m }
    val bos = new java.io.ByteArrayOutputStream(target.length + 1024)
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (name, bytes) =>
      val outBytes = byPath.get(name).map(patchSheetXml(bytes, _)).getOrElse(bytes)
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(315532800000L) // fixed: 1980-01-01, determinism
      zos.putNextEntry(e)
      zos.write(outBytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Spark surface of [[patchWorkbook]] — the end-to-end in-place merge
    * sink. `updates` carries `_sheet` (string), `_row` (the sheet row
    * index [[readSheet]] surfaced) and one column per `setCols` entry,
    * whose names resolve to sheet columns through each sheet's own header
    * row. NULL update values are no-ops (the [[MergeUpdate.updateOnly]]
    * coalesce contract). The patch set is collected driver-side — bounded
    * by the TARGET workbook itself (update-only ⇒ at most one update per
    * existing sheet cell; the container caps at ~1M rows), the same cost
    * class as the reference's whole-workbook openpyxl edit and the
    * [[writeSheet]] one-task report sink. `outPath` may equal
    * `targetPath` for a true in-place save. */
  def patchSheets(
      spark: SparkSession,
      targetPath: String,
      outPath: String,
      updates: DataFrame,
      setCols: Seq[String],
      maxPatchRows: Int = 1 << 20): Unit = {
    require(updates.columns.contains("_sheet") && updates.columns.contains("_row"),
      "updates must carry _sheet and _row (the readSheet lineage columns)")
    require(setCols.nonEmpty, "patchSheets needs at least one set column")
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(targetPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    // per-sheet header → column index, from the target workbook itself
    val headerIdx: Map[String, Map[String, Int]] =
      parseWorkbook(bytes, None).groupBy(_._1).map { case (sheet, rs) =>
        val hdr = rs.minBy(_._2)
        sheet -> hdr._3.collect {
          case (ci, nm) if nm != null && nm.nonEmpty => nm -> ci
        }.toMap
      }
    val rows = updates
      .select(col("_sheet").cast("string") +: col("_row").cast("long") +:
        setCols.map(col): _*)
      .limit(maxPatchRows + 1).collect()
    require(rows.length <= maxPatchRows,
      s"patchSheets: more than $maxPatchRows update rows — not a workbook-sized patch")
    val bySheet: Map[String, Map[(Long, Int), Any]] =
      rows.groupBy(_.getString(0)).map { case (sheet, rs) =>
        val hmap = headerIdx.getOrElse(sheet,
          throw new IllegalArgumentException(s"target workbook has no sheet '$sheet'"))
        val cells = rs.iterator.flatMap { r =>
          val rowI = r.getLong(1)
          setCols.zipWithIndex.flatMap { case (c, ci) =>
            val colI = hmap.getOrElse(c, throw new IllegalArgumentException(
              s"sheet '$sheet' has no header column '$c'"))
            Option(r.get(2 + ci)).map(v => (rowI, colI) -> v)
          }
        }.toMap
        sheet -> cells
      }
    val patched = patchWorkbook(bytes, bySheet)
    val op = new org.apache.hadoop.fs.Path(outPath)
    val ofs = op.getFileSystem(conf)
    val out = ofs.create(op, true)
    try out.write(patched) finally out.close()
  }
}
