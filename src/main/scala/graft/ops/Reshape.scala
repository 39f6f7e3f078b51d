package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1 — the weekday unpivot / melt (SURVEY.md §2.3).
  *
  * Wide weekly rows (one column per weekday) → long (giorno, offset, value)
  * records. Uses the built-in `Dataset.unpivot` (a Catalyst `Expand` node:
  * shuffle-free, codegen'd, scales linearly with input) instead of any
  * row-at-a-time loop (reference loop: timesheet_transform.py:63-82).
  */
object Reshape {

  /** (column name in the wide frame, weekday label, day offset from the
    * week start) — the reference's `day_offset` table
    * (timesheet_transform.py:32-40), ASCII-normalized labels. */
  val weekdays: Seq[(String, String, Int)] = Seq(
    ("h_lunedi", "lunedi", 0),
    ("h_martedi", "martedi", 1),
    ("h_mercoledi", "mercoledi", 2),
    ("h_giovedi", "giovedi", 3),
    ("h_venerdi", "venerdi", 4),
    ("h_sabato", "sabato", 5),
    ("h_domenica", "domenica", 6))

  /** Melt `dayCols` of `df` into (giorno, offset, `valueName`) long form,
    * carrying `idCols` through. Nulls are retained (filtered downstream by
    * the P6 predicate, as in the reference). */
  def meltWeek(
      df: DataFrame,
      idCols: Seq[String],
      dayCols: Seq[(String, String, Int)] = weekdays,
      valueName: String = "ore_raw"): DataFrame = {
    val melted = df.unpivot(
      idCols.map(col).toArray,
      dayCols.map { case (c, _, _) => col(c) }.toArray,
      "_day_col",
      valueName)
    // _day_col holds the source column name; decode to label + offset with a
    // when-chain (J3: tiny static lookup — no join needed).
    val giorno = dayCols.foldLeft(lit(null).cast("string")) {
      case (acc, (c, label, _)) => when(col("_day_col") === c, lit(label)).otherwise(acc)
    }
    val offset = dayCols.foldLeft(lit(null).cast("int")) {
      case (acc, (c, _, off)) => when(col("_day_col") === c, lit(off)).otherwise(acc)
    }
    melted
      .withColumn("giorno", giorno)
      .withColumn("doff", offset)
      .drop("_day_col")
  }

  /** P7: expand the parsed week start by the weekday offset into the actual
    * day date (timesheet_transform.py:76). */
  def dayDate(weekStart: Column, offset: Column): Column =
    date_add(weekStart, offset)
}
