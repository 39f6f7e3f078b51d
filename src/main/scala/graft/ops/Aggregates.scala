package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1 / A2 — the reference's two aggregations (SURVEY.md §2.5).
  *
  * Both are plain hash aggregates: Catalyst gives partial (map-side) +
  * final aggregation for `sum` for free; `collect_set` is a distinct
  * aggregate whose partial buffers also combine map-side, so the single
  * shuffle moves only (key, partial-state) — the scalable shape at 100 TB.
  */
object Aggregates {

  /** A1: n-key sum (timesheet_transform_v1.py:85). */
  def sumByKeys(df: DataFrame, keys: Seq[String], valueCol: String, out: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(sum(col(valueCol)).as(out))

  /** A2 (flagship agg): per key, the set-valued column becomes
    * `"; ".join(sorted(set(values)))` and the measure is summed —
    * `concat_ws("; ", array_sort(collect_set(...)))` reproduces the
    * reference's `"; ".join(sorted(set(x)))` exactly
    * (timesheet_transform.py:90-93). Idempotent under re-application
    * (A3 semantics, timesheet_transform.py:129-134).
    */
  def setJoinSum(df: DataFrame, keys: Seq[String], setCol: String, sumCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      concat_ws("; ", array_sort(collect_set(col(setCol)))).as(setCol),
      sum(col(sumCol)).as(sumCol))
}
