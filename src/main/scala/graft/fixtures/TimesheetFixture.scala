package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic wide-timesheet fixture derived from the driver's `orders`
  * table (FIXTURES.md F1), with every dirty-data variant the reference
  * tolerates: garbage week ranges (P1/P2 skip), blank authors (P4 →
  * "unknown"), NBSP-polluted hour strings (P5), unparseable hours (→ 0.0,
  * then dropped by P6), null hours, and a "sheet" (o_orderstatus = 'O')
  * whose job-code column is missing and defaults to the sheet name (S2).
  *
  * The SAME derivation is expressed in DuckDB SQL by
  * [[graft.Oracles.wideCte]] so every downstream operator is
  * oracle-checkable end to end. Keep the two in lockstep.
  */
object TimesheetFixture {

  val dayNames: Seq[String] = Seq("h_lunedi", "h_martedi", "h_mercoledi",
    "h_giovedi", "h_venerdi", "h_sabato", "h_domenica")

  /** One row = person × job × week; 7 string-typed weekday hour columns. */
  def wide(spark: SparkSession, sfDir: String): DataFrame = {
    val o = graft.ops.Sources.balanced(spark.read.parquet(s"$sfDir/orders.parquet"))
    val ws = date_trunc("week", col("o_orderdate").cast("date")).cast("date")
    // mixed separators (dash / ISO rows) exercise the pandas-style
    // dayfirst leniency of Cleansing.parseDateLenient — the reference's
    // pd.to_datetime(dayfirst=True) accepts all three
    def range(fmt: String): Column = concat(
      date_format(ws, fmt), lit(" al "), date_format(date_add(ws, 6), fmt))
    val weekrange = when(col("o_orderkey") % 97 === 0, lit("garbage"))
      .when(col("o_orderkey") % 7 === 1, range("dd-MM-yyyy"))
      .when(col("o_orderkey") % 7 === 2, range("yyyy-MM-dd"))
      .otherwise(range("dd/MM/yyyy"))
    val autore = when(col("o_orderkey") % 89 === 0, lit("  "))
      .otherwise(concat(lit("Mario ROSSI"),
        lpad((col("o_custkey") % 50).cast("string"), 2, "0")))
    val commessa = when(col("o_orderstatus") === "O", lit("SHEET-O"))
      .otherwise(col("o_orderpriority"))

    // Dirty hour strings: null every 13th, unparseable every 17th, NBSP +
    // trailing space pollution on giovedi (d=3), else clean "0".."10".
    def hourCol(d: Int): Column = {
      val v = (col("o_orderkey") * (d + 2) + col("o_custkey")) % 11
      val cleanOrDirty =
        if (d == 3) concat(lit("\u00A0"), v.cast("string"), lit(" "))
        else v.cast("string")
      when((col("o_orderkey") + d) % 13 === 0, lit(null).cast("string"))
        .when((col("o_orderkey") + d) % 17 === 0, lit("n/a"))
        .otherwise(cleanOrDirty)
    }

    val ids = Seq(
      col("o_orderkey").as("rid"),
      col("o_orderstatus").as("sheet"),
      weekrange.as("weekrange"),
      autore.as("autore"),
      commessa.as("commessa"))
    val hours = dayNames.zipWithIndex.map { case (n, d) => hourCol(d).as(n) }
    o.select(ids ++ hours: _*)
  }

  /** Static priority → project-code mapping (FIXTURES.md F2): partial on
    * purpose so unmapped codes fall through (timesheet_transform.py:56). */
  def mapping(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("1-URGENT", "P1-URG"),
      ("2-HIGH", "P2-HIGH"),
      ("3-MEDIUM", "P3-MED")).toDF("code_raw", "code_mapped")
  }
}
