package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge semantics of the scalar layer, cataloged in SURVEY.md §2.2 / §5. */
class CleansingSpec extends SparkSpec {
  import spark.implicits._

  test("P1/P2: week range parse — valid, garbage, missing separator, bad date") {
    val df = Seq(
      "03/03/2025 al 09/03/2025", // valid
      "garbage",                  // no separator -> P1 drops
      "99/99/2025 al 01/01/2025", // separator but unparseable -> null
      " 3/3/2025 al 9/3/2025"     // non-padded day-first still parses
    ).toDF("wr")
    val out = df
      .withColumn("keep", Cleansing.hasWeekRange($"wr"))
      .withColumn("ws", Cleansing.weekStart($"wr"))
      .collect()
    assert(out(0).getBoolean(1) && out(0).getDate(2).toString == "2025-03-03")
    assert(!out(1).getBoolean(1))
    assert(out(2).getBoolean(1) && out(2).isNullAt(2))
    assert(out(3).getBoolean(1) && out(3).getDate(2).toString == "2025-03-03")
  }

  test("P2/P9: lenient parse — dash + ISO separators, day-first precedence") {
    val df = Seq(
      "05/03/2025",     // slash day-first
      "05-03-2025",     // dash day-first -> 5 March, NOT 3 May
      "2025-03-05",     // ISO (4-digit day never parses day-first)
      "5-3-2025",       // non-padded dash
      "05.03.2025",     // dotted European, day-first
      "2025/03/05",     // ISO with slashes — the 4-digit year can only be
                        // yyyy/M/d (d/M/yyyy fails on a 4-digit day)
      "20250305",       // compact 8-digit
      "5 Mar 2025",     // dateutil month-name forms
      "05-Mar-2025",
      "March 5, 2025",
      "5 March 2025",   // full month name
      "5th March 2025", // ordinal day suffixes (dateutil strips them)
      "March 5th, 2025",
      "5th Mar 2025",
      "March 5th 2025", // month-first without the comma
      "5/3/25",         // two-digit year, day-first -> 2025
      "5-3-25",
      // datetime STRINGS truncate to the date, the reference's
      // target-cell coercion (timesheet_transform.py:121-125)
      "5/3/2025 14:30",
      "5/3/2025 9:05:59",
      "2025-03-05 23:59",
      "2025-03-05 00:00:01",
      "2025-03-05T14:30:00", // ISO T separator
      "not a date"      // total failure -> null
    ).toDF("c")
    val got = df.select(Cleansing.parseDateLenient($"c").as("d")).collect()
    got.dropRight(1).zipWithIndex.foreach { case (r, i) =>
      assert(!r.isNullAt(0) && r.getDate(0).toString == "2025-03-05",
        s"row $i: $r")
    }
    assert(got.last.isNullAt(0))
    // two-digit-year pivot: 00-49 -> 20xx, 50-99 -> 19xx (fixed POSIX
    // boundary — deterministic, unlike dateutil's moving ±50 window)
    val piv = Seq("1/2/49", "1/2/50", "31/12/99", "29/2/68").toDF("c")
      .select(Cleansing.parseDateLenient($"c").as("d"))
      .collect().map(_.getDate(0).toString).toSeq
    assert(piv == Seq("2049-02-01", "1950-02-01", "1999-12-31", "1968-02-29"),
      piv.toString)
    // ordinal stripping must NOT leak into numeric branches or corrupt
    // text that merely contains st/nd/rd/th after digits elsewhere
    val weird = Seq("1st-2nd-3rd", "21st century").toDF("c")
      .select(Cleansing.parseDateLenient($"c").as("d")).collect()
    assert(weird.forall(_.isNullAt(0)), weird.mkString(","))
    // asDate: every free-form cell shape coerces like the reference's
    // pandas to_datetime target-cell coercion
    val d2 = Seq("05-03-2025", "5 Mar 2025", "20250305").toDF("c")
      .select(Cleansing.asDate($"c")).collect()
    d2.foreach(r => assert(r.getDate(0).toString == "2025-03-05", r.toString))
  }

  test("P2: locale month names — Italian full + abbrev, French/German/Spanish conventions, accent-stripped variants") {
    val df = Seq(
      "5 marzo 2025",        // Italian full (the reference's locale)
      "5 mar 2025",          // Italian abbreviation (= English Mar, same month)
      "1 gennaio 2024",      // Italian full
      "17 ago 1999",         // Italian abbreviation, no English collision
      "5 février 2025",      // French accented
      "5 fevrier 2025",      // accent-stripped variant
      "9 août 2000",         // French accented
      "5. März 2025",        // German: capitalized month + day dot
      "31. dezember 2001",   // German lowercase
      "5 de marzo de 2025",  // Spanish "de" connective
      "12 de octubre de 1998",
      "5 frobuary 2025",     // unknown month word -> null, no error
      "5 marzo",             // yearless -> null
      "5 March 2025"         // English still parses (earlier branch)
    ).toDF("s")
    val got = df.select(Cleansing.parseDateLenient($"s")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDate(0).toString)
    assert(got.toSeq == Seq(
      "2025-03-05", "2025-03-05", "2024-01-01", "1999-08-17",
      "2025-02-05", "2025-02-05", "2000-08-09", "2025-03-05",
      "2001-12-31", "2025-03-05", "1998-10-12", null, null,
      "2025-03-05"), got.mkString(","))
  }

  test("P4: surname — last token, lowercased; empty/blank/null -> unknown") {
    val df = Seq(
      Some("Pietro Fava"), Some("  Anna Maria DE LUCA  "), Some("Single"),
      Some("   "), Some(""), None
    ).toDF("autore")
    val got = df.select(Cleansing.surname($"autore")).as[String].collect().toSeq
    assert(got == Seq("fava", "de luca".split(" ").last, "single", "unknown", "unknown", "unknown"))
  }

  test("P5: hours cleansing — NBSP, whitespace, unparseable -> 0.0, numeric passthrough") {
    val df = Seq(" 8 ", " 7.5", "n/a", "", "3").toDF("h")
    val got = df.select(Cleansing.cleanHours($"h")).as[Double].collect().toSeq
    assert(got == Seq(8.0, 7.5, 0.0, 0.0, 3.0))
  }

  test("P6: null raw is dropped even though cleaned is 0; zero cleaned dropped") {
    val df = Seq(Some("4"), Some("0"), Some("junk"), None).toDF("raw")
      .withColumn("ore", Cleansing.cleanHours($"raw"))
      .filter(Cleansing.keepHours($"raw", $"ore"))
    assert(df.select("raw").as[String].collect().toSeq == Seq("4"))
  }

  test("P9: date normalization accepts string and timestamp cells") {
    val df = Seq("2025-03-03", "not a date").toDF("c")
      .select(Cleansing.asDate($"c").as("d"))
    val got = df.collect()
    assert(got(0).getDate(0).toString == "2025-03-03" && got(1).isNullAt(0))
  }

  test("P11: name truncation to 31 chars") {
    val long = "x" * 40
    val got = Seq(long).toDF("n")
      .select(Cleansing.truncName(col("n"))).as[String].head()
    assert(got == "x" * 31)
  }

  test("confusableFold: Cyrillic/Greek lookalikes fold to ASCII; idempotent") {
    def fold(s: String): String = Seq(s).toDF("c")
      .select(Cleansing.confusableFold(col("c"))).as[String].head()
    // "раусаl" typed with Cyrillic р/а/у/с folds to the Latin word
    assert(fold("раураl") == "paypal")
    assert(fold("ορen") == "open") // greek omicron + rho
    // pure ASCII passes through untouched; folding is idempotent
    assert(fold("already clean 123") == "already clean 123")
    assert(fold(fold("С742 Мікrоѕоft")) == fold("С742 Мікrоѕоft"))
    assert(fold("Мікrоѕоft") == "Mikrosoft")
  }

  test("parseDateLenientYearless: yearless shapes fill the explicit year") {
    def parse(s: String): Option[java.sql.Date] =
      Option(Seq(s).toDF("c")
        .select(Cleansing.parseDateLenientYearless(col("c"), 1995))
        .collect().head.getDate(0))
    val mar5 = Some(java.sql.Date.valueOf("1995-03-05"))
    assert(parse("Wednesday, March 5") == mar5) // weekday stripped, not checked
    assert(parse("Wed, Mar 5") == mar5)
    assert(parse("March 5") == mar5)
    assert(parse("March 5th") == mar5)
    assert(parse("5 March") == mar5)
    assert(parse("5/3") == mar5) // day-first, the cascade's convention
    // yearful strings take the FULL cascade, never the fill year
    assert(parse("5/3/2001") == Some(java.sql.Date.valueOf("2001-03-05")))
    // invalid resolved date: Feb 29 in a non-leap fill year -> null
    assert(parse("February 29").isEmpty)
    assert(parse("total garbage").isEmpty)
  }

  test("fixMojibake repairs every pinned double-encoding sequence") {
    import spark.implicits._
    // the canonical corruption: UTF-8 bytes re-read as Latin-1/cp1252 —
    // fixMojibake must invert it for every mapped character
    val originals = Seq("café", "naïve—no", "piñata", "über",
      "l’été", "«quote»", "straße")
    val corrupted = originals.map { s =>
      new String(s.getBytes("UTF-8"), "windows-1252")
    }
    val got = corrupted.toDF("t")
      .select(Cleansing.fixMojibake(org.apache.spark.sql.functions.col("t")))
      .as[String].collect()
    // ï (C3 AF) and — (E2 80 94 em dash) are deliberately NOT in the
    // pinned map; everything mapped must come back exactly
    assert(got(0) == "café")
    assert(got(2) == "piñata" && got(3) == "über")
    assert(got(4) == "l’été" && got(5) == "«quote»" && got(6) == "straße")
    // idempotent on clean text
    val clean = Seq("already clean é — ñ").toDF("t")
      .select(Cleansing.fixMojibake(org.apache.spark.sql.functions.col("t")))
      .as[String].head()
    assert(clean == "already clean é — ñ")
  }
}
