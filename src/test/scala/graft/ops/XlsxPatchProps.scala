package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-JVM invariants of the surgical patch codec ([[Xlsx.patchSheetXml]]
  * / [[Xlsx.patchWorkbook]]) and the perceptual hash
  * ([[Multimodal.aHashBits]]) — no Spark session, so these run at the
  * full default case count.
  *
  * The patch properties drive a MODEL workbook: a random sparse grid of
  * (row → col → value) rendered to worksheet XML the way foreign
  * producers lay it out (explicit and omitted `r` attributes, style
  * attributes, self-closing empty rows), then a random update map. The
  * patched output must (a) parse to the model with updates applied —
  * update existing, append missing cells to present rows, never invent
  * absent rows — and (b) keep every untouched explicit cell's EXACT
  * source bytes. */
object XlsxPatchProps extends Properties("graft.invariants.xlsxpatch") {

  // ── model generation ──────────────────────────────────────────────

  private case class Cell(v: String, style: Option[Int], explicitRef: Boolean)
  private case class Model(rows: Map[Long, Map[Int, Cell]], emptyRows: Set[Long])

  private val genCell: Gen[Cell] = for {
    v <- Gen.oneOf(Gen.choose(0, 999).map(_.toString),
      Gen.alphaNumStr.map(s => "s" + s.take(6)))
    st <- Gen.option(Gen.choose(0, 3))
    er <- Gen.frequency(4 -> true, 1 -> false)
  } yield Cell(v, st, er)

  private val genModel: Gen[Model] = for {
    nRows <- Gen.choose(1, 10)
    rowIds <- Gen.pick(nRows, 1L to 14L)
    rows <- Gen.sequence[List[(Long, Map[Int, Cell])], (Long, Map[Int, Cell])](
      rowIds.toList.map { r =>
        for {
          nCols <- Gen.choose(0, 5)
          cols <- Gen.pick(nCols, 0 to 6)
          cells <- Gen.sequence[List[(Int, Cell)], (Int, Cell)](
            cols.toList.map(c => genCell.map(c -> _)))
        } yield r -> cells.toMap
      })
  } yield {
    val m = rows.toMap
    Model(m.filter(_._2.nonEmpty), m.filter(_._2.isEmpty).keySet)
  }

  private def colRef(i: Int): String = ('A' + i).toChar.toString

  /** Render the model the way a foreign producer would: cells in column
    * order, `r` attributes present or omitted per cell (omitted ⇒ the
    * reader's auto-increment position rule applies — only safe when
    * every earlier cell in the row is explicit, so we force the ref
    * whenever the previous cell omitted its own). */
  private def render(m: Model): String = {
    val sb = new StringBuilder
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    val allRows = (m.rows.keySet ++ m.emptyRows).toSeq.sorted
    allRows.foreach { r =>
      if (m.emptyRows(r)) sb ++= s"""<row r="$r"/>"""
      else {
        sb ++= s"""<row r="$r">"""
        var prevExplicit = true
        var prevCol = -1
        m.rows(r).toSeq.sortBy(_._1).foreach { case (c, cell) =>
          // omitted r is only unambiguous immediately after col prevCol
          val canOmit = !cell.explicitRef && prevExplicit && c == prevCol + 1
          val ref = if (canOmit) "" else s""" r="${colRef(c)}$r""""
          val st = cell.style.map(x => s""" s="$x"""").getOrElse("")
          sb ++= s"""<c$ref$st t="inlineStr"><is><t>${cell.v}</t></is></c>"""
          prevExplicit = true // after any cell the next position is known
          prevCol = c
        }
        sb ++= "</row>"
      }
    }
    sb ++= "</sheetData></worksheet>"
    sb.result()
  }

  private def workbookZip(sheetXml: String): Array[Byte] = {
    def e(n: String, c: String) = n -> c.getBytes("UTF-8")
    val parts = Seq(
      e("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""),
      e("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      e("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""),
      e("xl/worksheets/sheet1.xml", sheetXml))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n)); zos.write(b); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private val genUpdates: Gen[Map[(Long, Int), Any]] =
    Gen.mapOf(for {
      r <- Gen.choose(1L, 16L) // deliberately past the model's max: absent rows
      c <- Gen.choose(0, 7)
      v <- Gen.oneOf(Gen.choose(0, 999).map(x => x: Any),
        Gen.alphaNumStr.map(s => ("u" + s.take(5)): Any))
    } yield (r, c) -> v)

  property("patchWorkbook ≡ model update: update existing, append to present rows, never insert rows; untouched explicit cells keep exact bytes") =
    forAll(genModel, genUpdates) { (m, upd) =>
      val sheetXml = render(m)
      val patched = Xlsx.patchWorkbook(workbookZip(sheetXml), Map("S" -> upd))
      // parseWorkbook surfaces empty (self-closing) rows as zero-cell
      // entries; the model compare is over rows that carry cells
      val got: Map[Long, Map[Int, String]] = Xlsx
        .parseWorkbook(patched, Some(Set("S")))
        .map { case (_, r, cs) => r -> cs.toMap }.filter(_._2.nonEmpty).toMap
      // model with updates applied
      val presentRows = m.rows.keySet ++ m.emptyRows
      val expected: Map[Long, Map[Int, String]] = presentRows.map { r =>
        val base = m.rows.getOrElse(r, Map.empty).map { case (c, cell) => c -> cell.v }
        val over = upd.collect { case ((ur, uc), v) if ur == r => uc -> v.toString }
        r -> (base ++ over)
      }.filter(_._2.nonEmpty).toMap
      val parseOk = got == expected
      // untouched explicit cells byte-identical in the patched sheet
      val outXml = new String(
        Xlsx.zipEntriesOrdered(patched).toMap.apply("xl/worksheets/sheet1.xml"), "UTF-8")
      val verbatimOk = m.rows.forall { case (r, cells) =>
        cells.forall { case (c, cell) =>
          upd.contains((r, c)) || {
            val st = cell.style.map(x => s""" s="$x"""").getOrElse("")
            // only assert cells rendered WITH an explicit ref (omitted-ref
            // cells may legitimately re-render when a sibling was patched)
            val span = s"""<c r="${colRef(c)}$r"$st t="inlineStr"><is><t>${cell.v}</t></is></c>"""
            !sheetXml.contains(span) || outXml.contains(span)
          }
        }
      }
      parseOk && verbatimOk
    }

  // ── perceptual hash invariants (REAL decoded pixels) ─────────────

  private val genImage: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(8, 20)
    h <- Gen.choose(8, 17)
    px <- Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 200))
  } yield (w, h, px)

  property("aHash is invariant under global brightness shift (the property that makes it perceptual)") =
    forAll(genImage, Gen.choose(1, 55)) { case ((w, h, px), shift) =>
      Multimodal.aHashBits(w, h, px) ==
        Multimodal.aHashBits(w, h, px.map(_ + shift))
    }

  property("PNG codec round trip is pixel-exact for any id") =
    forAll(Gen.choose(0L, 100000L)) { id =>
      val (w, h, px) = Multimodal.decodePng(Multimodal.encodePng(id))
      w == 8 + (id % 9).toInt && h == 8 + (id % 7).toInt &&
        px.zipWithIndex.forall { case (p, i) => p == ((id * 5 + i * 11) % 256) }
    }
}
