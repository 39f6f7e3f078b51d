package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SCD type-2 merge: history-keeping upsert of a dimension table.
    *
    * `dim` carries (keys..., attr, validFrom, validTo) where validTo IS
    * NULL marks the current row; `updates` carries (keys..., attr) as of
    * `batch`. Per key:
    *  - update with a CHANGED attr → current row closes (validTo = batch)
    *    and a new open row (batch, null) appends;
    *  - update with an unchanged attr → untouched;
    *  - update for an unseen key → new open row;
    *  - no update → untouched. Historical (closed) rows pass through.
    *
    * One full-outer shuffle join of current rows against updates (or
    * broadcast when the update batch is small) + a union — no
    * driver-side iteration, cardinality grows by exactly the number of
    * changed + new keys. `updates` must be unique per key. */
  def scd2(
      dim: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      attrCol: String,
      validFrom: String,
      validTo: String,
      batch: Column): DataFrame = {
    val hist = dim.filter(col(validTo).isNotNull)
    // explicit existence markers: attr nullability cannot mark row presence
    // (a current row whose attr is legitimately NULL must not read as "key
    // absent" — it would be dropped from keptOrClosed and its history
    // rewritten via `opened`)
    val cur = dim.filter(col(validTo).isNull).withColumn("_in_dim", lit(true))
    val u = updates.select(
      (keys.map(col) :+ col(attrCol).as("_new_attr")): _*)
      .withColumn("_in_upd", lit(true))
    val j = cur.join(u, keys, "full")
    val inDim = coalesce(col("_in_dim"), lit(false))
    val inUpd = coalesce(col("_in_upd"), lit(false))
    // null-safe: NULL→value, value→NULL, and value→different-value all
    // count as changed; NULL→NULL and value→same-value do not
    val changed = inDim && inUpd && !(col("_new_attr") <=> col(attrCol))
    val isNewKey = !inDim
    val keptOrClosed = j.filter(inDim).select(
      (keys.map(col) :+ col(attrCol) :+ col(validFrom) :+
        when(changed, batch).otherwise(col(validTo)).as(validTo)): _*)
    val opened = j.filter(changed || isNewKey).select(
      (keys.map(col) :+ col("_new_attr").as(attrCol) :+
        batch.as(validFrom) :+
        lit(null).cast(dim.schema(validTo).dataType).as(validTo)): _*)
    hist.select((keys.map(col) :+ col(attrCol) :+ col(validFrom) :+ col(validTo)): _*)
      .unionByName(keptOrClosed)
      .unionByName(opened)
  }

  /** Classic upsert MERGE — WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
    * THEN INSERT: the insert-capable dual of [[updateOnly]] (and the
    * history-less sibling of [[scd2]]). Matched target rows take the
    * update's `setCols` values VERBATIM (a null update value overwrites —
    * MERGE semantics, unlike [[updateOnly]]'s coalesce); unmatched update
    * rows insert with target columns outside `setCols`/`keys` left null.
    *
    * One full-outer shuffle join on the merge key (broadcast when the
    * batch is small — Spark picks from stats/AQE); cardinality =
    * |target| + |new keys|. `updates` must be unique per key. */
  def upsert(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      setCols: Map[String, String]): DataFrame = {
    // a key listed in setCols would overwrite the coalesced join key and
    // silently corrupt inserted rows' keys — fail fast instead
    val overlap = keys.toSet.intersect(setCols.keySet)
    require(overlap.isEmpty,
      s"upsert keys and setCols must be disjoint; both contain: ${overlap.mkString(", ")}")
    val missing = setCols.values.toSet.diff(updates.columns.toSet)
    require(missing.isEmpty,
      s"setCols source columns absent from updates: ${missing.mkString(", ")}")
    val u = updates.select(
      (keys.map(col) ++ setCols.values.toSeq.map(c => col(c).as(s"_u_$c"))): _*)
      .withColumn("_in_upd", lit(true))
    val j = target.join(u, keys, "full")
    val inUpd = coalesce(col("_in_upd"), lit(false))
    val applied = setCols.foldLeft(j) { case (acc, (tCol, uCol)) =>
      acc.withColumn(tCol, when(inUpd, col(s"_u_$uCol")).otherwise(col(tCol)))
    }
    applied.select(target.columns.map(col): _*)
  }

  /** Additive MERGE — incremental view maintenance for distributive
    * aggregates: `store` holds materialized partials (sums/counts) per
    * key, `delta` holds the new batch's partials, and matched keys ADD
    * (`UPDATE SET n = n + delta.n`) while unseen keys insert. Applying
    * batches one at a time or all at once yields identical stores
    * (associativity is the whole point — the spec asserts it), which is
    * what makes nightly-incremental equal to full-recompute at 100 TB
    * without rescanning history.
    *
    * One full-outer join on the merge key per batch; `addCols` maps
    * store column → delta column, both sides' nulls read as zero.
    * `delta` must be unique per key (it is an aggregate output). */
  def mergeAdditive(
      store: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      addCols: Map[String, String]): DataFrame = {
    val overlap = keys.toSet.intersect(addCols.keySet)
    require(overlap.isEmpty,
      s"mergeAdditive keys and addCols must be disjoint; both contain: ${overlap.mkString(", ")}")
    val d = delta.select(
      (keys.map(col) ++ addCols.values.toSeq.map(c => col(c).as(s"_d_$c"))): _*)
    val j = store.join(d, keys, "full")
    val applied = addCols.foldLeft(j) { case (acc, (sCol, dCol)) =>
      acc.withColumn(sCol,
        coalesce(col(sCol), lit(0L).cast(acc.schema(sCol).dataType)) +
          coalesce(col(s"_d_$dCol"), lit(0L).cast(acc.schema(sCol).dataType)))
    }
    applied.select(store.columns.map(col): _*)
  }

  /** [[upsert]]'s change-data-feed face: instead of the merged table,
    * emit the CHANGES the merge would make — the Delta/Debezium row shape
    * downstream consumers (cache invalidation, incremental materialized
    * views, audit) subscribe to. Output = target schema + `_change_type`:
    *  - `insert` — update key absent from the target (post-values);
    *  - `update_preimage` / `update_postimage` — matched key whose set
    *    columns actually change (null-safe compare), old and new row;
    *  - matched no-op updates emit NOTHING (deterministic feed: replaying
    *    the same batch twice produces an empty second feed).
    *
    * Same single full-outer join on the merge key as [[upsert]] — the
    * feed costs no more than the merge itself; pre/post rows are two
    * projections of the one joined row, not a second join. `updates`
    * must be unique per key. */
  def upsertWithCdf(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      setCols: Map[String, String]): DataFrame = {
    val overlap = keys.toSet.intersect(setCols.keySet)
    require(overlap.isEmpty,
      s"upsertWithCdf keys and setCols must be disjoint; both contain: ${overlap.mkString(", ")}")
    val missing = setCols.values.toSet.diff(updates.columns.toSet)
    require(missing.isEmpty,
      s"setCols source columns absent from updates: ${missing.mkString(", ")}")
    val u = updates.select(
      (keys.map(col) ++ setCols.values.toSeq.map(c => col(c).as(s"_u_$c"))): _*)
      .withColumn("_in_upd", lit(true))
    val t = target.withColumn("_in_tgt", lit(true))
    val j = t.join(u, keys, "full")
    val inUpd = coalesce(col("_in_upd"), lit(false))
    val inTgt = coalesce(col("_in_tgt"), lit(false))
    val changed = inTgt && inUpd && setCols.map { case (tCol, uCol) =>
      !(col(s"_u_$uCol") <=> col(tCol))
    }.reduce(_ || _)
    val outCols = target.columns.toSeq
    def project(df: DataFrame, tag: String, applied: Boolean): DataFrame = {
      val base = if (!applied) df else setCols.foldLeft(df) {
        case (acc, (tCol, uCol)) => acc.withColumn(tCol, col(s"_u_$uCol"))
      }
      base.select(outCols.map(col) :+ lit(tag).as("_change_type"): _*)
    }
    project(j.filter(changed), "update_preimage", applied = false)
      .unionByName(project(j.filter(changed), "update_postimage", applied = true))
      .unionByName(project(j.filter(!inTgt), "insert", applied = true))
  }

  /** Row-level snapshot reconciliation — the row-grain sibling of
    * [[Profile.profileDiff]] (which diffs column statistics): a
    * full-outer join on the key classifies every row of two snapshots as
    * `added` (current only), `removed` (reference only), `changed` (in
    * both with at least one compare column differing null-safely), or
    * `unchanged`, and names the differing columns per changed row
    * (`;`-joined in `compareCols` declaration order).
    *
    * Null-safe `<=>` comparison: NULL→value and value→NULL count as
    * changes; NULL↔NULL does not.
    *
    * Scale: one hash shuffle per side on the key and one sort-merge
    * full-outer join — the canonical 100 TB reconciliation shape. Both
    * sides co-partition on the same key; no broadcast, no window, no
    * driver state. Output cardinality = |keys(ref) ∪ keys(cur)|. */
  def tableDiff(
      ref: DataFrame,
      cur: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val overlap = keys.toSet.intersect(compareCols.toSet)
    require(overlap.isEmpty,
      s"tableDiff keys and compareCols must be disjoint; both contain: ${overlap.mkString(", ")}")
    require(compareCols.nonEmpty, "tableDiff needs at least one compare column")
    // the join reserves _in_ref/_in_cur and _c_<compareCol> working names;
    // a user column colliding with one would silently compare the wrong
    // pair (same non-collision contract as Temporal.asofJoinBackward)
    val reserved = Set("_in_ref", "_in_cur") ++ compareCols.map(x => s"_c_$x")
    val clash = (keys ++ compareCols).filter(reserved)
    require(clash.isEmpty,
      s"tableDiff key/compare columns collide with reserved working names: ${clash.mkString(", ")}")
    val r = ref.select((keys ++ compareCols).map(col): _*)
      .withColumn("_in_ref", lit(true))
    val c = cur.select(
        keys.map(col) ++ compareCols.map(x => col(x).as(s"_c_$x")): _*)
      .withColumn("_in_cur", lit(true))
    val j = r.join(c, keys, "full")
    val inRef = coalesce(col("_in_ref"), lit(false))
    val inCur = coalesce(col("_in_cur"), lit(false))
    // concat_ws drops the NULL arms, leaving only the differing names
    val changedCols = concat_ws(";",
      compareCols.map(x => when(!(col(x) <=> col(s"_c_$x")), lit(x))): _*)
    val status = when(!inRef, lit("added"))
      .when(!inCur, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    j.select(keys.map(col) :+ status.as("diff_status") :+
      when(status === "changed", changedCols).as("changed_cols"): _*)
  }
}
