package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy posture audits over tabular corpora — the release-gate
  * questions a dataset must answer before rows containing personal
  * attributes ship to training: how re-identifiable is each
  * quasi-identifier cohort (k-anonymity, Sweeney 2002) and how much does
  * a cohort leak about its sensitive attribute (distinct-l-diversity,
  * Machanavajjhala et al. 2007). Complements [[TextAnalysis.piiScrub]]:
  * scrubbing redacts the free-text channel, these audit the STRUCTURED
  * channel the scrubber can't touch.
  *
  * Scale posture: both audits are one hash-aggregate over the corpus
  * keyed by the quasi-identifier tuple. `count(distinct sensitive)` is
  * Spark's standard two-phase distinct aggregate (partial distinct
  * map-side, exact merge), so the shuffle carries (quasi, sensitive)
  * pairs at worst — never raw rows. Output is one row per cohort,
  * bounded by the quasi-identifier cardinality (generalize the
  * identifiers — bucket timestamps, band numerics — before calling if
  * that cardinality approaches the row count; a cohort-per-row audit is
  * the finding "k = 1 everywhere", not a useful report).
  */
object Privacy {

  /** Per-cohort k-anonymity + distinct-l-diversity audit: one row per
    * distinct `quasiCols` tuple with the cohort size, the number of
    * distinct `sensitive` values it contains (nulls excluded, standard
    * COUNT DISTINCT semantics), the re-identification risk `1/size`
    * (6dp), and violation flags vs the `k` / `l` thresholds. The
    * dataset's own k (its weakest cohort) is `min(group_size)` over the
    * result. */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("risk", round(lit(1.0) / col("group_size"), 6))
      .withColumn("violates_k", (col("group_size") < k).cast("int"))
      .withColumn("violates_l", (col("l_distinct") < l).cast("int"))
  }

  /** One-row dataset summary of [[kAnonymityAudit]]: the dataset's k
    * (weakest cohort), cohort count, violating-cohort counts, and the
    * number of ROWS living in under-k cohorts (the re-identifiable
    * population — the number a release decision actually turns on). */
  def kAnonymitySummary(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame =
    kAnonymityAudit(df, quasiCols, sensitive, k, l).agg(
      min("group_size").as("dataset_k"),
      count(lit(1)).as("n_cohorts"),
      sum("violates_k").as("n_under_k"),
      sum("violates_l").as("n_under_l"),
      sum(when(col("violates_k") === 1, col("group_size"))
        .otherwise(lit(0L))).as("rows_at_risk"))
}
