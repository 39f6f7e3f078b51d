package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S5 / J2 — update-only keyed merge (SURVEY.md §2.1 S5, §2.4 J2).
  *
  * The reference's in-place workbook update ("overwrite matched rows'
  * columns B/C, never insert, leave everything else untouched",
  * timesheet_transform.py:98-138) reframed as a distributed MERGE:
  * left-outer equi-join target←updates + per-column `coalesce`. Target
  * cardinality is preserved exactly (left join on a unique update key);
  * unmatched update rows drop, matching the reference. At scale this is a
  * shuffle join on the merge key (or broadcast when the update side is
  * small) — no driver-side iteration.
  */
object MergeUpdate {

  /** Apply `updates` onto `target`. `keys` are equi-join column names
    * present on both sides; `setCols` maps target column → update column
    * whose non-null values overwrite it. `updates` must be unique per key
    * (guaranteed when it is the output of an Aggregates.* groupBy on the
    * same keys) so the join cannot duplicate target rows.
    */
  def updateOnly(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      setCols: Map[String, String]): DataFrame = {
    val u = updates.select(
      (keys.map(col) ++ setCols.values.toSeq.map(c => col(c).as(s"_u_$c"))): _*)
    val joined = target.join(u, keys, "left")
    setCols.foldLeft(joined) { case (acc, (tCol, uCol)) =>
      acc.withColumn(tCol, coalesce(col(s"_u_$uCol"), col(tCol)))
    }.drop(setCols.values.toSeq.map(c => s"_u_$c"): _*)
  }
}
