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

  /** Per-cohort t-closeness for a CATEGORICAL sensitive attribute
    * (Li/Li/Venkatasubramanian 2007): t = the total-variation distance
    * between the cohort's sensitive-value distribution and the global
    * one — the audit l-diversity misses (a cohort can hold l distinct
    * values yet still be a near-certain giveaway when one value
    * dominates far beyond its global share). Computed as
    * `0.5·(Σ_{v∈cohort} |p_c(v) − p_g(v)| + (1 − Σ_{v∈cohort} p_g(v)))`
    * — values absent from the cohort contribute their whole global mass.
    *
    * Scale posture: one (quasi, v) hash-aggregate over the corpus; the
    * global distribution is a ≤|values|-row aggregate broadcast into the
    * join; the cohort size reuses the (quasi, v) grid through a window
    * keyed by the quasi tuple. Nothing larger than the (quasi, v) grid
    * ever shuffles. */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    val qc = quasiCols.map(col)
    val base = df.select(qc :+ sensitive.as("_v"): _*)
    val cv = base.groupBy(qc :+ col("_v"): _*).agg(count(lit(1)).as("_cnt"))
    val gl = base.groupBy(col("_v")).agg(count(lit(1)).as("_gcnt"))
      .withColumn("_gp",
        col("_gcnt").cast("double") /
          sum(col("_gcnt")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
      .drop("_gcnt")
    val size = sum(col("_cnt")).over(org.apache.spark.sql.expressions.Window
      .partitionBy(qc: _*))
    cv.withColumn("_size", size)
      .join(broadcast(gl), "_v")
      .groupBy(qc: _*)
      .agg(
        max(col("_size")).as("group_size"),
        sum(abs(col("_cnt").cast("double") / col("_size") - col("_gp")))
          .as("_part1"),
        sum(col("_gp")).as("_covered"))
      .select(qc ++ Seq(
        col("group_size"),
        round(lit(0.5) * (col("_part1") + (lit(1.0) - col("_covered"))), 6)
          .as("t_dist")): _*)
      .withColumn("violates_t", (col("t_dist") > t).cast("int"))
  }

  /** Per-cohort ENTROPY l-diversity (Machanavajjhala et al. 2007 §3):
    * a cohort is entropy-l-diverse when the Shannon entropy of its
    * sensitive-value distribution is at least `ln(l)` — strictly stronger
    * than distinct-l ([[kAnonymityAudit]]'s `l_distinct`), which a cohort
    * can satisfy while one value holds 99% of the mass. Emits the
    * entropy (nats, 6dp), the effective value count `e^H` (6dp — the
    * "how many values is this cohort REALLY spread over" number a release
    * review reads), and the violation flag vs `ln(l)`.
    *
    * Scale: one (quasi, sensitive) hash-aggregate, then a per-cohort
    * re-aggregate — the shuffle carries value pairs, never rows; output
    * bounded by cohort cardinality. */
  def entropyLDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, "l must be >= 1")
    val qc = quasiCols.map(col)
    val cv = df.select(qc :+ sensitive.as("_v"): _*)
      .groupBy(qc :+ col("_v"): _*).agg(count(lit(1)).as("_cnt"))
    cv.groupBy(qc: _*)
      .agg(sum("_cnt").as("group_size"),
        count(lit(1)).as("l_distinct"),
        sum(col("_cnt") * log(col("_cnt"))).as("_clogc"))
      // greatest(…, 0.0): entropy is provably >= 0, but the float residue
      // of ln(g) − Σc·ln(c)/g on single-valued cohorts lands at ~−2e-16,
      // and engines disagree on round(−2e-16, 6): DuckDB keeps the sign
      // (−0.0), Spark's BigDecimal round normalizes to +0.0 — the −0.0
      // canonical-hash edge (q210/q318). The clamp is semantically exact.
      .withColumn("entropy", round(greatest(
        log(col("group_size")) - col("_clogc") / col("group_size"),
        lit(0.0)), 6))
      .withColumn("eff_values", round(exp(col("entropy")), 6))
      .withColumn("violates_entropy_l",
        (col("entropy") < math.log(l.toDouble)).cast("int"))
      .drop("_clogc")
  }

  /** Differentially-private count release (ε-DP, Dwork et al. 2006) with
    * a SEEDED noise channel: per group, `count + Laplace(1/ε)` noise
    * drawn by inverse-CDF from a uniform derived deterministically from
    * the group key (`hash60(key‖salt) mod 10⁹ / 10⁹`), then clamped at 0
    * and rounded to an integer release. Counting queries have
    * sensitivity 1, so scale `b = 1/ε`. The seeded channel makes the
    * release REPRODUCIBLE — the property an audited release pipeline
    * needs (re-running the job must publish the same numbers, and an
    * oracle can replay them); swap the salt to redraw the noise.
    *
    * Neither the raw count NOR the noise is emitted — callers get only
    * the noisy release plus ε (release − noise reconstructs the true
    * count, so publishing either side defeats the mechanism; the noise
    * lives in [[dpNoiseAudit]], a separate restricted view). `salt` has
    * no default and MUST be kept secret: the noise is a deterministic
    * function of (group key, salt), so anyone who knows the salt can
    * replay it and the release degrades to the exact counts — a
    * public/guessable salt forfeits the DP guarantee entirely.
    * One hash-aggregate; output bounded by group cardinality. */
  def dpNoisyCount(
      df: DataFrame,
      groupCols: Seq[String],
      epsilon: Double,
      salt: String): DataFrame =
    dpNoisyRelease(
      df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("_true")),
      groupCols, "_true", epsilon, salt)

  /** [[dpNoisyCount]]'s release half over PRE-AGGREGATED counts — the
    * shape a streaming release takes (a complete-mode count store
    * accumulates, the noise is applied at release time from the group
    * key alone, so releases stay reproducible across micro-batches). */
  def dpNoisyRelease(
      counts: DataFrame,
      groupCols: Seq[String],
      countCol: String,
      epsilon: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0, "epsilon must be positive")
    counts
      .withColumn("epsilon", lit(epsilon))
      .withColumn("released", greatest(
        round(col(countCol) + laplaceNoise(groupCols, epsilon, salt))
          .cast("long"), lit(0L)))
      .drop(countCol)
  }

  /** The seeded Laplace(1/ε) draw [[dpNoisyRelease]] adds: inverse-CDF
    * from `hash60(groupKey‖salt) mod 10⁹ / 10⁹`, 6dp-rounded. */
  private def laplaceNoise(
      groupCols: Seq[String], epsilon: Double, salt: String): Column = {
    val key = concat_ws("|",
      groupCols.map(col(_).cast("string")) :+ lit(salt): _*)
    val u = (Hashing.hash60(key) % 1000000000L).cast("double") / 1e9
    val v = u - lit(0.5)
    round(lit(-1.0 / epsilon) * signum(v) *
      log(lit(1.0) - lit(2.0) * abs(v)), 6)
  }

  /** RESTRICTED audit view of the [[dpNoisyRelease]] noise channel: the
    * per-group noise draw alone — for the release auditor who holds the
    * salt and needs to verify the mechanism, never to be joined back
    * against the published release (released − noise is the true
    * count). Kept out of the release frame by construction. */
  def dpNoiseAudit(
      counts: DataFrame,
      groupCols: Seq[String],
      epsilon: Double,
      salt: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(epsilon > 0, "epsilon must be positive")
    counts.select(groupCols.map(col) :+
      laplaceNoise(groupCols, epsilon, salt).as("noise"): _*)
  }

  /** Fail-loud cardinality gate for a drained complete-mode streaming
    * state store (the [[graft.ops.Models]] bradleyTerry/maxItems
    * posture): a complete-mode privacy monitor's state is the
    * (cohort × sensitive) grid, "bounded by cohort cardinality" — but
    * nothing in Structured Streaming enforces that bound, so a
    * mis-keyed cohort column (e.g. a raw user id leaking into the
    * quasi-identifier set) grows state without limit until the job
    * OOMs. This gate makes the contract explicit: count the distinct
    * cohorts in the drained store and refuse to roll up past
    * `maxCohorts`. One distinct-aggregate over the (already bounded-ish)
    * store; returns the store unchanged for chaining. */
  def requireBoundedCohorts(
      store: DataFrame,
      cohortCols: Seq[String],
      maxCohorts: Long): DataFrame = {
    require(cohortCols.nonEmpty, "need at least one cohort column")
    require(maxCohorts >= 1, "maxCohorts must be >= 1")
    val n = store.select(cohortCols.map(col): _*).distinct().count()
    require(n <= maxCohorts,
      s"streaming privacy state holds $n cohorts over ${cohortCols.mkString(",")} " +
        s"— exceeds maxCohorts=$maxCohorts; a cohort key this wide is " +
        "either mis-chosen (an identifier leaked into the cohort set) or " +
        "needs an update-mode store with drain-side rollup")
    store
  }

  /** Checksum-validated PAN (payment-card number) detection: 13-19 digit
    * runs are only FINDINGS when they pass the Luhn check (ISO/IEC
    * 7812) — the validation layer a pattern-only scrubber
    * ([[TextAnalysis.piiScrub]]) lacks, killing the false positives that
    * make teams ignore PII reports (timestamps, ids, hashes that merely
    * look like card numbers). Emits one row per document that contains
    * at least one candidate: candidate/valid counts and the
    * last-4-masked valid numbers (sorted, `;`-joined) for the audit log;
    * full numbers are never emitted.
    *
    * Scale shape: candidates are rare, so the explode is tiny; the Luhn
    * sum is an explode + (doc, candidate) hash-aggregate — no UDF, and
    * the digit-position math mirrors into SQL exactly (all integer). */
  /** Pinned synthesis PANs for the q308 oracle: indices 0-3 pass the
    * Luhn check (standard test numbers), 4-7 are the same numbers with
    * one digit perturbed (checksum fails). Both the Spark synthesis CASE
    * and the generated SQL CASE read this list, so they cannot drift. */
  val pinnedPansV1: Seq[String] = Seq(
    "4111111111111111", "5500005555555559", "340000000000009",
    "6011000990139424", "4111111111111112", "5500005555555550",
    "340000000000001", "6011000990139421")

  def luhnPanScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = df.select(col(idCol),
      explode(regexp_extract_all(col(textCol), lit("\\b\\d{13,19}\\b"),
        lit(0))).as("cand"))
    val dg = cands.select(col(idCol), col("cand"),
      posexplode(split(col("cand"), "")).as(Seq("pos", "d")))
    val dI = col("d").cast("int")
    val doubled = dI * 2
    val contrib = when((length(col("cand")) - 1 - col("pos")) % 2 === 1,
      when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(dI)
    val valid = dg.groupBy(col(idCol), col("cand"))
      .agg(sum(contrib).as("_s"))
      .withColumn("valid", (col("_s") % 10 === 0).cast("int"))
    valid.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_candidates"),
        sum("valid").as("n_valid"),
        concat_ws(";", array_sort(collect_list(when(col("valid") === 1,
          concat(lit("****"), substring(col("cand"), -4, 4))))))
          .as("masked"))
      .withColumn("has_pan", (col("n_valid") > 0).cast("int"))
  }
}
