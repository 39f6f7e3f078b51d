package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val wide = Seq(
    (1L, Some("1"), Some("2"), Some("3"), Some("4"), Some("5"), Some("6"), Some("7")),
    (2L, None, Some("0"), None, Some("x"), None, None, Some("9"))
  ).toDF("rid", "h_lunedi", "h_martedi", "h_mercoledi", "h_giovedi",
    "h_venerdi", "h_sabato", "h_domenica")

  test("R1: melt emits one record per weekday cell, nulls retained") {
    val m = Reshape.meltWeek(wide, idCols = Seq("rid"))
    assert(m.count() == 14) // 2 rows x 7 days
    assert(m.filter($"ore_raw".isNull).count() == 4)
  }

  test("R1: giorno/doff decode matches the weekday table") {
    val m = Reshape.meltWeek(wide, idCols = Seq("rid"))
      .filter($"rid" === 1L)
      .select("giorno", "doff", "ore_raw")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(_._2)
    assert(m.head == ("lunedi", 0, "1") && m.last == ("domenica", 6, "7"))
  }

  test("P7: dayDate expands week start by offset") {
    val got = Seq(("2025-03-03", 6)).toDF("ws", "doff")
      .select(Reshape.dayDate($"ws".cast("date"), $"doff"))
      .head().getDate(0).toString
    assert(got == "2025-03-09")
  }

  test("R1 invariant: sum of non-null melted cells == count of non-null wide cells") {
    val nonNullWide = Reshape.weekdays.map { case (c, _, _) =>
      wide.filter(col(c).isNotNull).count()
    }.sum
    val melted = Reshape.meltWeek(wide, idCols = Seq("rid"))
      .filter($"ore_raw".isNotNull).count()
    assert(melted == nonNullWide)
  }
}
