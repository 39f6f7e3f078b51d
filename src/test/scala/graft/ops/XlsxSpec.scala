package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("xlsx_spec_").toString

  test("round trip: types, nulls, XML specials, dates and timestamps survive write -> read") {
    val dir = tmpDir()
    val df = Seq(
      (1L, "plain", Some(1.5), Some(java.sql.Date.valueOf("2024-03-07")),
        Some(java.sql.Timestamp.valueOf("2024-03-07 13:45:10")), Some(true)),
      (2L, "A&B <tag> \"q\"", Some(-0.25), Some(java.sql.Date.valueOf("1999-12-31")),
        Some(java.sql.Timestamp.valueOf("1999-12-31 00:00:59")), Some(false)),
      (3L, "", None, None, None, None))
      .toDF("id", "name", "score", "d", "ts", "flag")
    val path = s"$dir/rt.xlsx"
    Xlsx.writeSheet(df, path, "data")
    val back = Xlsx.readSheet(spark, path, Some("data"))
    assert(back.columns.toSeq ==
      Seq("_file", "_sheet", "_row", "id", "name", "score", "d", "ts", "flag"))
    val rows = back.orderBy("_row").collect().map(r =>
      (r.getString(3), r.getString(4), r.getString(5), r.getString(6),
        r.getString(7), r.getString(8)))
    assert(rows(0) == (("1", "plain", "1.5", "2024-03-07",
      "2024-03-07 13:45:10", "true")), rows(0).toString)
    assert(rows(1) == (("2", "A&B <tag> \"q\"", "-0.25", "1999-12-31",
      "1999-12-31 00:00:59", "false")), rows(1).toString)
    // nulls stay null; empty string written as inline empty cell comes
    // back null-equivalent (no value) or "" — both read as blank
    assert(rows(2)._1 == "3")
    assert(rows(2)._3 == null && rows(2)._4 == null && rows(2)._5 == null &&
      rows(2)._6 == null, rows(2).toString)
    // typed re-cast: the numeric/date/bool columns survive a strict cast
    val typed = back.select(col("id").cast("long"), col("score").cast("double"),
      col("d").cast("date"), col("ts").cast("timestamp"),
      col("flag").cast("boolean"))
    assert(typed.filter(col("id") === 1L && col("score") === 1.5 &&
      col("d") === lit("2024-03-07").cast("date") &&
      col("flag") === true).count() === 1)
  }

  test("foreign-producer workbook: shared strings, rich text runs, custom date numFmt, sparse cells") {
    // hand-assembled the way openpyxl/Excel lay workbooks out: shared
    // strings (not inline), a rich-text run split inside one <si>, a
    // CUSTOM date format (id 164), sheet path resolved via rels, sparse
    // row with a gap (B skipped), 1-based sheet file name differing from
    // the sheet's display name
    val dir = tmpDir()
    def entry(n: String, c: String) = n -> c.getBytes("UTF-8")
    val parts = Seq(
      entry("[Content_Types].xml",
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>"""),
      entry("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      entry("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Foglio Ore" sheetId="7" r:id="rOther"/></sheets></workbook>"""),
      entry("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rOther" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet99.xml"/></Relationships>"""),
      entry("xl/sharedStrings.xml",
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>NOME</t></si><si><t>ORE</t></si><si><r><t>Rossi</t></r><r><t xml:space="preserve"> Mario</t></r></si></sst>"""),
      entry("xl/styles.xml",
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="1"><numFmt numFmtId="164" formatCode="dd/mm/yyyy"/></numFmts><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="164" applyNumberFormat="1"/></cellXfs></styleSheet>"""),
      entry("xl/worksheets/sheet99.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>DATA</t></is></c></row><row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="n"><v>7.5</v></c><c r="C2" s="1"><v>45357</v></c></row><row r="3"><c r="A3" t="inlineStr"><is><t>Verdi</t></is></c><c r="C3" s="1"><v>45358</v></c></row></sheetData></worksheet>"""))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    val path = s"$dir/foreign.xlsx"
    Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
    val got = Xlsx.readSheet(spark, path, Some("Foglio Ore"))
      .orderBy("_row")
      .select("NOME", "ORE", "DATA")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // serial 45357 = 2024-03-06 (1899-12-30 + 45357 days)
    assert(got(0) == (("Rossi Mario", "7.5", "2024-03-06")), got(0).toString)
    // sparse row: ORE column absent -> null; custom numFmt still a date
    assert(got(1) == (("Verdi", null, "2024-03-07")), got(1).toString)
  }

  test("date1904 workbook: serials anchor at the Mac-Excel epoch") {
    val dir = tmpDir()
    def entry(n: String, c: String) = n -> c.getBytes("UTF-8")
    val parts = Seq(
      entry("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      entry("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><workbookPr date1904="1"/><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      entry("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      entry("xl/styles.xml",
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>"""),
      entry("xl/worksheets/sheet1.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>D</t></is></c></row><row r="2"><c r="A2" s="1"><v>44000</v></c></row></sheetData></worksheet>"""))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    val path = s"$dir/mac.xlsx"
    Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
    val got = Xlsx.readSheet(spark, path).select("D").head().getString(0)
    val expected = java.time.LocalDate.of(1904, 1, 1).plusDays(44000).toString
    assert(got == expected, s"$got vs $expected") // 2024-06-22, not the 1900-system 2020-06-18
  }

  test("writeSheets: one sheet per key in ONE workbook, key column dropped, 31-char cap; readSheet(None) unions them") {
    val dir = tmpDir()
    val longKey = "x" * 40
    val df = Seq(("alpha", 1L, 2.0), ("alpha", 2L, 3.0), ("beta", 3L, 4.0),
      (longKey, 4L, 5.0)).toDF("surname", "id", "ore")
    val path = s"$dir/sheets.xlsx"
    Xlsx.writeSheets(df, "surname", path)
    val back = Xlsx.readSheet(spark, path, sheet = None)
    val bySheet = back.collect()
      .map(r => (r.getString(1), r.getString(3), r.getString(4)))
      .groupBy(_._1)
    assert(bySheet.keySet == Set("alpha", "beta", "x" * 31))
    assert(bySheet("alpha").map(x => (x._2, x._3)).toSet ==
      Set(("1", "2.0"), ("2", "3.0")))
    assert(bySheet("beta").map(x => (x._2, x._3)).toSet == Set(("3", "4.0")))
    // the key column is dropped from the sheet body (reference drops
    // SURNAME per sheet)
    assert(back.columns.toSeq == Seq("_file", "_sheet", "_row", "id", "ore"))
  }

  test("writeWorkbooks: one file per key, parallel-written, glob read recovers every row") {
    val dir = tmpDir()
    val df = (1 to 50).map(i => (s"k${i % 7}", i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    Xlsx.writeWorkbooks(df, "k", dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".xlsx")).sorted // Hadoop local FS adds .crc sidecars
    assert(files.toSeq == (0 until 7).map(i => s"k$i.xlsx"), files.mkString(","))
    val back = Xlsx.readSheet(spark, s"$dir/*.xlsx")
    assert(back.count() === 50)
    // per-file key recovery: file lineage ends with <key>.xlsx
    val keys = back.select(regexp_extract(col("_file"), "([^/]+)\\.xlsx$", 1)
        .as("k"), col("id").cast("long").as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(keys.forall { case (k, id) => k == s"k${id % 7}" })
  }

  test("adversarial strings round-trip exactly: ST_Xstring escapes, controls, CR, unicode") {
    val dir = tmpDir()
    val strings = Seq(
      "_x0041_",            // literal escape-shaped text must NOT decode to 'A'
      "_x005F_",            // the escape of the escape
      "__x0000_",           // overlapping underscores
      "a_xZZZZ_b",          // not a valid escape — passes through
      "ctl\u0001\u0002end", // raw control chars -> encoded -> decoded
      "cr\rlf\ntab\t.",     // \r must survive XML newline normalization
      "emoji 🦊 + CJK 漢字 + RTL שלום",
      "nbsp pad ",
      "x" * 10000)
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val path = s"$dir/adv.xlsx"
    Xlsx.writeSheet(df, path)
    val back = Xlsx.readSheet(spark, path)
      .select(col("id").cast("long"), col("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    strings.zipWithIndex.foreach { case (s, i) =>
      assert(back(i.toLong) == s,
        s"row $i: ${back(i.toLong).take(60)} != ${s.take(60)}")
    }
  }

  // a styled, multi-numFmt workbook the way Excel itself lays one out:
  // theme + custom fonts/fills, TWO custom numFmts, column widths, a
  // formula cell, shared strings — the furniture openpyxl preserves and
  // the patch-through writer must too
  private def styledWorkbook(): Array[Byte] = {
    def e(n: String, c: String) = n -> c.getBytes("UTF-8")
    val parts = Seq(
      e("[Content_Types].xml",
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>"""),
      e("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      e("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Ore" sheetId="1" r:id="rId1"/><sheet name="Meta" sheetId="2" r:id="rId2"/></sheets></workbook>"""),
      e("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>"""),
      e("xl/sharedStrings.xml",
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>data</t></si><si><t>commessa</t></si><si><t>ore</t></si><si><t>PRJ-OLD</t></si></sst>"""),
      e("xl/styles.xml",
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><numFmts count="2"><numFmt numFmtId="164" formatCode="dd/mm/yyyy"/><numFmt numFmtId="165" formatCode="0.00&quot; h&quot;"/></numFmts><fonts count="2"><font><sz val="11"/></font><font><b/><color rgb="FFCC0000"/></font></fonts><fills count="2"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="solid"><fgColor rgb="FFFFEE00"/></patternFill></fill></fills><borders count="1"><border/></borders><cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1" fontId="1" fillId="1"/><xf numFmtId="0" fontId="1"/></cellXfs></styleSheet>"""),
      e("xl/worksheets/sheet1.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cols><col min="1" max="1" width="14.5" customWidth="1"/></cols><sheetData><row r="1" s="3" customFormat="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row><row r="2"><c r="A2" s="1"><v>45357</v></c><c r="B2" s="3" t="s"><v>3</v></c><c r="C2" s="2"><v>7.5</v></c></row><row r="3"><c r="A3" s="1"><v>45358</v></c><c r="B3" t="inlineStr"><is><t>PRJ-KEEP</t></is></c><c r="C3" s="2"><v>8</v></c><c r="D3"><f>C3*2</f><v>16</v></c></row><row r="4"/></sheetData></worksheet>"""),
      e("xl/worksheets/sheet2.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>untouched</t></is></c></row></sheetData></worksheet>"""))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def unzip(bytes: Array[Byte]): Map[String, Array[Byte]] =
    Xlsx.zipEntriesOrdered(bytes).toMap

  test("patchWorkbook: untouched zip parts byte-identical; styled multi-numFmt target keeps styles; only matched cell spans change") {
    val target = styledWorkbook()
    val patched = Xlsx.patchWorkbook(target, Map(
      "Ore" -> Map((2L, 1) -> "PRJ-NEW; PRJ-X", (2L, 2) -> 99.25)))
    val before = unzip(target)
    val after = unzip(patched)
    assert(before.keySet == after.keySet)
    // every part EXCEPT the one patched sheet is byte-identical — styles,
    // shared strings, rels, the sibling sheet, content types
    before.keys.filterNot(_ == "xl/worksheets/sheet1.xml").foreach { k =>
      assert(java.util.Arrays.equals(before(k), after(k)), s"part $k changed")
    }
    val sheet = new String(after("xl/worksheets/sheet1.xml"), "UTF-8")
    // untouched cells keep their EXACT bytes: date styles, the formula
    // cell, the bold header row, column widths
    for (span <- Seq(
        """<cols><col min="1" max="1" width="14.5" customWidth="1"/></cols>""",
        """<row r="1" s="3" customFormat="1"><c r="A1" t="s"><v>0</v></c>""",
        """<c r="A2" s="1"><v>45357</v></c>""",
        """<c r="A3" s="1"><v>45358</v></c>""",
        """<c r="B3" t="inlineStr"><is><t>PRJ-KEEP</t></is></c>""",
        """<c r="D3"><f>C3*2</f><v>16</v></c>""",
        """<row r="4"/>"""))
      assert(sheet.contains(span), s"lost verbatim span: $span")
    // the patched cells carry their ORIGINAL style index with new values
    assert(sheet.contains(
      """<c r="B2" s="3" t="inlineStr"><is><t xml:space="preserve">PRJ-NEW; PRJ-X</t></is></c>"""),
      sheet)
    assert(sheet.contains("""<c r="C2" s="2" t="n"><v>99.25</v></c>"""), sheet)
    // semantic read-back: new values in row 2, old in row 3, dates intact
    val rows = Xlsx.parseWorkbook(patched, Some(Set("Ore")))
      .map { case (_, r, cs) => r -> cs.toMap }.toMap
    assert(rows(2L) == Map(0 -> "2024-03-06", 1 -> "PRJ-NEW; PRJ-X", 2 -> "99.25"))
    assert(rows(3L)(1) == "PRJ-KEEP" && rows(3L)(2) == "8")
  }

  test("patchWorkbook: appends cells missing from a matched row, fills empty rows, ignores absent rows; unknown sheet fails loud") {
    val target = styledWorkbook()
    val patched = Xlsx.patchWorkbook(target, Map(
      "Ore" -> Map(
        (3L, 4) -> "added",   // row 3 has no column E -> appended
        (4L, 0) -> 12.5,      // row 4 is <row r="4"/> -> expanded
        (99L, 0) -> "ghost")))// absent row -> ignored, never inserted
    val rows = Xlsx.parseWorkbook(patched, Some(Set("Ore")))
      .map { case (_, r, cs) => r -> cs.toMap }.toMap
    assert(rows(3L)(4) == "added" && rows(3L)(1) == "PRJ-KEEP")
    assert(rows(4L) == Map(0 -> "12.5"))
    assert(!rows.contains(99L))
    intercept[IllegalArgumentException] {
      Xlsx.patchWorkbook(target, Map("NoSuch" -> Map((1L, 0) -> "x")))
    }
  }

  test("patchSheets end-to-end: readSheet lineage drives a real keyed update through the container, in place") {
    val dir = tmpDir()
    val path = s"$dir/target.xlsx"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), styledWorkbook())
    val back = Xlsx.readSheet(spark, path, Some("Ore"))
    // update the row whose commessa is PRJ-OLD, like the reference's
    // matched-row update; NULL set value is a no-op (coalesce contract)
    val updates = back.filter(col("commessa") === "PRJ-OLD")
      .select(col("_sheet"), col("_row"),
        lit("PRJ-NEW").as("commessa"),
        lit(null).cast("double").as("ore"))
    Xlsx.patchSheets(spark, path, path, updates, Seq("commessa", "ore"))
    val after = Xlsx.readSheet(spark, path, Some("Ore"))
      .select(col("_row").cast("long"), col("commessa"), col("ore"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(after(2L) == (("PRJ-NEW", "7.5"))) // ore untouched: null = no-op
    assert(after(3L) == (("PRJ-KEEP", "8")))
  }

  test("writers fail loud: sheet-name truncation collisions and path-escaping keys") {
    val dir = tmpDir()
    val a = ("y" * 31) + "AAA"
    val b = ("y" * 31) + "BBB"
    val df = Seq((a, 1L), (b, 2L)).toDF("k", "v")
    def messages(t: Throwable): String = {
      var cur = t; val sb = new StringBuilder
      while (cur != null) { sb ++= String.valueOf(cur.getMessage); cur = cur.getCause }
      sb.result()
    }
    val e1 = intercept[Exception] {
      Xlsx.writeSheets(df, "k", s"$dir/collide.xlsx")
    }
    assert(messages(e1).contains("truncation"), messages(e1))
    intercept[IllegalArgumentException] {
      Xlsx.writeWorkbooks(Seq(("a/b", 1L)).toDF("k", "v"), "k", dir)
    }
    intercept[IllegalArgumentException] {
      Xlsx.writeWorkbooks(Seq((a, 1L), (b, 2L)).toDF("k", "v"), "k", dir)
    }
  }

  test("readSheet: header discovered at the sheet's minimum present row, not hardcoded row 1") {
    val dir = tmpDir()
    def e(n: String, c: String) = n -> c.getBytes("UTF-8")
    // sheetData omits row 1 entirely: header lives at r=2
    val parts = Seq(
      e("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      e("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      e("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      e("xl/worksheets/sheet1.xml",
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="2"><c r="A2" t="inlineStr"><is><t>name</t></is></c></row><row r="3"><c r="A3" t="inlineStr"><is><t>v1</t></is></c></row></sheetData></worksheet>"""))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    Files.write(java.nio.file.Paths.get(s"$dir/h2.xlsx"), bos.toByteArray)
    val got = Xlsx.readSheet(spark, s"$dir/h2.xlsx")
    assert(got.columns.toSeq == Seq("_file", "_sheet", "_row", "name"))
    // the header row must NOT come back as a data row
    assert(got.select("name").collect().map(_.getString(0)).toSeq == Seq("v1"))
  }

  test("writers resolve filesystems through the SESSION Hadoop conf, not a fresh executor-side Configuration") {
    // discriminator: a session whose default fs is RawLocalFileSystem
    // (no .crc sidecars). If the executor rebuilt a fresh Configuration
    // it would fall back to file:/// = checksummed LocalFileSystem and
    // leave a .crc next to the workbook.
    val s2 = spark.newSession()
    // session-scoped overrides — newHadoopConf() copies session SQL confs
    // in verbatim (the same path per-session object-store credentials
    // take): file:// resolves to the RAW local fs; cache disabled so
    // neither this fs nor other suites' cached checksummed fs leak
    s2.conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    s2.conf.set("fs.file.impl.disable.cache", "true")
    val dir = tmpDir()
    val df = s2.range(1).selectExpr("id", "'a' as x")
    Xlsx.writeSheet(df, s"$dir/conf.xlsx")
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains("conf.xlsx"), names.toString)
    assert(!names.exists(_.endsWith(".crc")),
      s"checksum sidecar written — session conf was not shipped: $names")
  }

  test("workbookBytes is deterministic; header-only for an empty frame") {
    val rows = Seq(Seq[Any](1L, "a"), Seq[Any](2L, "b"))
    val a = Xlsx.workbookBytes(Seq(("S", Seq("id", "x"), rows)))
    val b = Xlsx.workbookBytes(Seq(("S", Seq("id", "x"), rows)))
    assert(java.util.Arrays.equals(a, b))
    val dir = tmpDir()
    val empty = Seq.empty[(Long, String)].toDF("id", "x")
    Xlsx.writeSheet(empty, s"$dir/empty.xlsx")
    val back = Xlsx.readSheet(spark, s"$dir/empty.xlsx")
    assert(back.columns.toSeq == Seq("_file", "_sheet", "_row", "id", "x"))
    assert(back.count() === 0)
  }
}
