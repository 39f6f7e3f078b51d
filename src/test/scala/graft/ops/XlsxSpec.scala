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
