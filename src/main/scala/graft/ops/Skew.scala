package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.5 #5 / 100 TB posture).
  *
  * AQE's skew-join handling covers sort-merge joins; `saltedJoin` is the
  * explicit variant for when a dimension is too big to broadcast and one
  * probe key dominates: the big side salts each row into one of
  * `buckets` sub-keys, the small side replicates `buckets`×, and the join
  * runs on (key, salt) — a hot key's rows now spread over `buckets`
  * reducers instead of one. Result is row-identical to the plain join.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hashes the whole row
    * (xxhash64 — execution-internal only, never compared to an oracle). */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets))

  /** Equi-join `big ⋈ small` on `keys`, salted `buckets` ways. `how` is
    * any join type whose semantics survive small-side replication with
    * disjoint salts ("inner" and "left" do: each big row matches exactly
    * the replica carrying its own salt). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int = 16,
      how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"unsupported join type: $how")
    val saltedBig = big.withColumn("_salt", rowSalt(big, buckets))
    val replicated = small
      .withColumn("_salt_i", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt_i").cast("long"))
      .drop("_salt_i")
    saltedBig.join(replicated, keys :+ "_salt", how).drop("_salt")
  }

  /** Two-stage aggregation on a salted key: partial sums per (key, salt),
    * then merge. For algebraic aggs Spark's map-side partials already
    * bound hot-key state; this shape matters for *holistic* aggs
    * (collect_set & co.) where a hot key's buffer would otherwise
    * concentrate on one reducer. */
  def setJoinSumSalted(
      df: DataFrame,
      keys: Seq[String],
      setCol: String,
      sumCol: String,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, buckets))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(collect_set(col(setCol)).as("_set"), sum(col(sumCol)).as("_sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        concat_ws("; ",
          array_sort(array_distinct(flatten(collect_list(col("_set"))))))
          .as(setCol),
        sum(col("_sum")).as(sumCol))
  }
}
