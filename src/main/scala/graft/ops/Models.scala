package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus analytics: a trained quality classifier (the
  * fastText-classifier slot of an LLM data pipeline — score every document
  * with a model FIT ON THE CORPUS ITSELF, not a hand-tuned heuristic like
  * [[TextAnalysis.qualityScore]]) and per-key trend regression.
  *
  * Scale posture: training state is a HANDFUL OF DOUBLES (the weight
  * vector / the per-key moment set), never per-row state. Each gradient
  * step is one map-side-combinable average over the feature frame; the
  * step's 1-row result re-enters the plan as a broadcast cross join (the
  * TF-IDF corpus-stats pattern), so the whole fit+score is a single lazy
  * plan — no driver-side collect, no iteration over rows. At 100 TB each
  * epoch is one scan with a 4-double shuffle.
  */
object Models {

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  private def zOf(xCols: Seq[String]): Column =
    xCols.zipWithIndex.map { case (c, i) => col(s"w${i + 1}") * col(c) }
      .foldLeft(col("b"))(_ + _)

  /** Full-batch logistic regression fit by `iters` unrolled gradient
    * steps from the zero vector (deterministic — no shuffling, no
    * mini-batches; σ(0)=0.5 folds the first step to a closed form).
    * Returns a 1-row frame `(b, w1 … wk)`.
    *
    * Each step is `w ← w − lr · avg((σ(wᵀx) − y) · x)` — one aggregate
    * over `f` with the previous weights joined in as a broadcast 1-row
    * cross join. `iters` is expected to be small (single digits): the
    * plan depth grows linearly with it, and full-batch GD on normalized
    * bounded features converges in a few steps to a useful scorer (this
    * is a corpus FILTER, not a leaderboard model). */
  def logregFit(
      f: DataFrame,
      labelCol: String,
      xCols: Seq[String],
      lr: Double = 5.0,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val y = col(labelCol).cast("double")
    // step 1 from w=0: σ(z)=0.5 exactly, no weight reference needed
    val first = f.agg(
      (lit(0.0) - lit(lr) * avg(lit(0.5) - y)).as("b"),
      xCols.zipWithIndex.map { case (c, i) =>
        (lit(0.0) - lit(lr) * avg((lit(0.5) - y) * col(c))).as(s"w${i + 1}")
      }: _*)
    (2 to iters).foldLeft(first) { (w, _) =>
      val err = sigmoid(zOf(xCols)) - y
      f.crossJoin(broadcast(w)).agg(
        (min(col("b")) - lit(lr) * avg(err)).as("b"),
        xCols.zipWithIndex.map { case (c, i) =>
          (min(col(s"w${i + 1}")) - lit(lr) * avg(err * col(c))).as(s"w${i + 1}")
        }: _*)
    }
  }

  /** Score `f` with a 1-row weight frame from [[logregFit]]: appends
    * `prob` (σ(wᵀx), 6dp) and `pred` (rounded prob ≥ 0.5, so engines
    * decide boundary cases identically). Broadcast 1-row cross join —
    * a map-only pass over the features. */
  def logregScore(
      f: DataFrame,
      weights: DataFrame,
      xCols: Seq[String]): DataFrame =
    f.crossJoin(broadcast(weights))
      .withColumn("prob", round(sigmoid(zOf(xCols)), 6))
      .withColumn("pred", col("prob") >= 0.5)
      .drop("b" +: xCols.indices.map(i => s"w${i + 1}"): _*)

  /** Multinomial Naive Bayes fit over word tokens — the GENERATIVE
    * counterpart of [[logregFit]]'s discriminative filter and the
    * textbook shape of the fastText/CCNet-style corpus quality
    * classifiers: per-token class likelihoods with Laplace smoothing,
    * vocabulary-capped. `label` must evaluate to 1/0 (rows where it is
    * null are excluded from counts); both classes must be non-empty or
    * the prior degenerates to ±∞.
    *
    * Returns the broadcastable model: one row per in-vocab token,
    * `(token, llr, log_prior)` with `llr = ln P(t|1) − ln P(t|0)`
    * (token counts WITH multiplicity — multinomial, not Bernoulli) and
    * the doc-count log-prior `ln(n1/n0)` repeated on every row so the
    * whole model travels as ONE ≤vocabSize-row frame.
    *
    * Scale shape: ONE tokenize pass computes total + per-class counts
    * per token type in a single hash-agg (map-side combine, shuffle
    * carries (token, partials) only); the vocab cut is a top-V
    * TakeOrderedAndProject over TYPE rows; the ≤vocabSize result is
    * `localCheckpoint`ed so the smoothing-denominator aggregate reuses
    * it instead of re-deriving the whole subtree (the HITS
    * two-consumers rule); priors are one column-pruned doc-count
    * aggregate. Nothing per-row reaches the driver. */
  def naiveBayesFit(
      df: DataFrame,
      textCol: String,
      label: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val toks = df.select(label.cast("int").as("_y"),
      explode(TextAnalysis.words(col(textCol))).as("token"))
    // total freq (all docs, labeled or not — buildVocab's definition)
    // and per-class counts in ONE pass over the token stream
    val counts = toks.groupBy("token")
      .agg(count(lit(1)).as("_f"),
        count(when(col("_y") === 1, 1)).as("_c1"),
        count(when(col("_y") === 0, 1)).as("_c0"))
      .orderBy(col("_f").desc, col("token")).limit(vocabSize)
      .select("token", "_c1", "_c0")
      .localCheckpoint()
    val tot = counts.agg(sum("_c1").as("_t1"), sum("_c0").as("_t0"),
      count(lit(1)).as("_v"))
    val prior = df.agg(
      count(when(label.cast("int") === 1, 1)).as("_n1"),
      count(when(label.cast("int") === 0, 1)).as("_n0"))
    counts.crossJoin(broadcast(tot)).crossJoin(broadcast(prior))
      .select(col("token"),
        (log((col("_c1") + 1.0) / (col("_t1") + col("_v"))) -
          log((col("_c0") + 1.0) / (col("_t0") + col("_v")))).as("llr"),
        log(col("_n1").cast("double") / col("_n0")).as("log_prior"))
  }

  /** Score `df` with a [[naiveBayesFit]] model: appends `log_odds`
    * (prior + Σ in-vocab token llr, 6dp — out-of-vocabulary tokens are
    * skipped, the standard NB posture) and `pred` (rounded log_odds > 0,
    * so engines decide boundary cases identically). The model is a
    * broadcast probe over one tokenize pass; the per-doc sums join back
    * on `idCol` — text never shuffles. */
  def naiveBayesScore(
      df: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val prior = model.agg(max("log_prior").as("_lp"))
    val sums = df
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("token"))
      .join(broadcast(model.select("token", "llr")), Seq("token"))
      .groupBy(idCol).agg(sum("llr").as("_s"))
    df.join(sums, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .withColumn("log_odds", round(col("_lp") + coalesce(col("_s"), lit(0.0)), 6))
      .withColumn("pred", (col("log_odds") > 0).cast("int"))
      .drop("_s", "_lp")
  }

  /** Serving-form Naive Bayes scorer: the [[naiveBayesFit]] model
    * collected once (bounded by vocabSize — the pinned-index serving
    * contract) and embedded as a literal token→llr MAP, so scoring is a
    * PURE PROJECTION — no join, no per-doc aggregate — and therefore
    * runs unchanged on a STREAMING frame (the q233→q239 batch-rule →
    * ingest-gate pattern). Value-identical to [[naiveBayesScore]] at the
    * 6dp round (the per-doc sum merely changes association order).
    * Token-less (null/empty) docs score exactly the prior, matching the
    * join path's left-join fallback. */
  def naiveBayesServe(
      df: DataFrame,
      model: DataFrame,
      textCol: String): DataFrame = {
    val rows = model.select("token", "llr", "log_prior").collect()
    require(rows.nonEmpty, "naiveBayesServe: empty model")
    val lp = rows.head.getDouble(2)
    val m = map(rows.flatMap(r =>
      Seq(lit(r.getString(0)), lit(r.getDouble(1)))).toIndexedSeq: _*)
    val toks = coalesce(TextAnalysis.words(col(textCol)),
      array().cast("array<string>"))
    df.withColumn("log_odds",
        round(lit(lp) + aggregate(toks, lit(0.0),
          (acc, t) => acc + coalesce(try_element_at(m, t), lit(0.0))), 6))
      .withColumn("pred", (col("log_odds") > 0).cast("int"))
  }

  /** Bradley–Terry preference aggregation — the RLHF/leaderboard op:
    * turn pairwise "A beat B" outcomes into per-item strength ratings by
    * `iters` rounds of the MM update (Hunter 2004),
    *
    *   uᵢ = Wᵢ / Σ_{j≠i} nᵢⱼ / (rᵢ + rⱼ),   rᵢ' = round(uᵢ / Σu, 9)
    *
    * (sum-normalized so ratings form a distribution; per-step 9dp
    * rounding keeps any two engines' trajectories bit-identical — the
    * Holt/pageRank recurrence-determinism pattern).
    *
    * Scale posture: the corpus-sized work is ONE distributed hash-agg
    * (win counts per ordered pair); the loop then runs driver-side over
    * the ≤items² aggregated match matrix — the bounded-model-state
    * posture of pqTrain/bpeTrainDriver, enforced by `require(items ≤
    * maxItems)`. Preference corpora have billions of comparisons over
    * hundreds of items, so the matrix is tiny even when the pair stream
    * is not. Items with no games never appear; an item that never wins
    * converges to rating 0.
    *
    * Returns one row per item: `(item, wins, games, rating)`. */
  def bradleyTerry(
      pairs: DataFrame,
      winnerCol: String,
      loserCol: String,
      iters: Int = 20,
      maxItems: Int = 256): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = pairs.sparkSession
    // null-keyed matches carry no usable identity — dropped, documented
    val counts = pairs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .groupBy(col(winnerCol).cast("string").as("_w"),
        col(loserCol).cast("string").as("_l"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = counts.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val m = items.length
    require(m <= maxItems,
      s"bradleyTerry: $m items exceeds maxItems=$maxItems — the driver-side " +
        "matrix is bounded by design; raise maxItems deliberately if the " +
        "item universe is genuinely this large")
    val idx = items.zipWithIndex.toMap
    val wins = Array.fill(m)(0L)
    val games = Array.ofDim[Long](m, m)
    counts.foreach { case (w, l, n) =>
      val (i, j) = (idx(w), idx(l))
      wins(i) += n
      games(i)(j) += n
      games(j)(i) += n
    }
    var r = Array.fill(m)(1.0)
    val rd9 = (x: Double) => math.rint(x * 1e9) / 1e9
    (1 to iters).foreach { _ =>
      val u = Array.tabulate(m) { i =>
        var denom = 0.0
        var j = 0
        while (j < m) {
          if (j != i && games(i)(j) > 0) denom += games(i)(j) / (r(i) + r(j))
          j += 1
        }
        if (denom == 0.0) r(i) else wins(i) / denom
      }
      val s = u.sum
      r = u.map(x => rd9(x / s))
    }
    import spark.implicits._
    items.indices
      .map(i => (items(i), wins(i), games(i).sum, r(i)))
      .toDF("item", "wins", "games", "rating")
  }

  /** Per-key ordinary-least-squares trend: slope/intercept/corr of `y`
    * over `x` per group, from population moments
    * (`slope = covar_pop/var_pop`, `intercept = avg(y) − slope·avg(x)`) —
    * the formulation both engines share verbatim, one hash-aggregate with
    * map-side partials, a (key, moments) shuffle only. Callers should
    * pass `x` RE-BASED to a small range (e.g. days since the window
    * start): centering is what keeps `var_pop` free of catastrophic
    * cancellation at 100 TB row counts. Rows where either side is null
    * are excluded from all moments (both engines' aggregate-null
    * semantics). `n` is the non-null pair count. */
  def linearTrend(
      df: DataFrame,
      keyCols: Seq[String],
      x: Column,
      y: Column): DataFrame = {
    val vx = var_pop(col("_x"))
    val vy = var_pop(col("_y"))
    val cv = covar_pop(col("_x"), col("_y"))
    val slope = cv / vx
    // explicit null on degenerate groups (constant x → no slope; constant
    // either side → no correlation): ANSI mode would otherwise raise
    // DIVIDE_BY_ZERO, and an explicit formula keeps both engines agreeing
    // where corr() implementations differ on the 0/0 case
    def safe(guard: Column, v: Column): Column =
      when(guard, lit(null).cast("double")).otherwise(round(v, 6))
    df.select(keyCols.map(col) :+ x.cast("double").as("_x") :+
        y.cast("double").as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        safe(vx === 0, slope).as("slope"),
        safe(vx === 0, avg(col("_y")) - slope * avg(col("_x"))).as("intercept"),
        safe(vx === 0 || vy === 0, cv / sqrt(vx * vy)).as("r"))
  }

  /** Pearson χ² test of independence between two categorical columns:
    * one row per (a, b) cell of the FULL margin grid — including cells
    * never observed together (O = 0, E > 0), which carry real χ² mass —
    * with the expected count under independence
    * (`row_total · col_total / N`), the cell's contribution `(O−E)²/E`,
    * and the test totals (`chi2` = Σ contributions, `dof` =
    * (|A|−1)·(|B|−1)) repeated on every row so the result is a single
    * self-contained frame.
    *
    * Scale shape: ONE hash-aggregate collapses the data to the observed
    * contingency table (the only pass that sees the 100 TB input); the
    * margins, their |A|·|B| cross grid, and the totals are joins/windows
    * over that tiny table. Nulls in either column are excluded (they
    * form no hypothesis). Zero-EXPECTED cells cannot arise: both margins
    * of every grid cell are positive by construction. */
  def chiSquareIndependence(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("observed"))
    val rowm = cells.groupBy("a").agg(sum(col("observed")).as("_ra"))
    val colm = cells.groupBy("b").agg(sum(col("observed")).as("_cb"))
    val grid = rowm.crossJoin(broadcast(colm))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
    val wAll = Window.partitionBy()
    val expected = col("_ra") * col("_cb") / sum(col("observed")).over(wAll)
    grid
      .withColumn("expected", round(expected, 6))
      .withColumn("contrib",
        round(pow(col("observed") - col("expected"), 2) / col("expected"), 6))
      .withColumn("chi2", round(sum(col("contrib")).over(wAll), 6))
      .withColumn("dof",
        (size(collect_set(col("a")).over(wAll)) - 1).cast("long") *
          (size(collect_set(col("b")).over(wAll)) - 1))
      .drop("_ra", "_cb")
  }

  /** Weight-of-evidence / information-value binning — the standard
    * feature-screening transform of a training pipeline: bucket a
    * numeric feature into `nBins` equal-width bins over its observed
    * [min, max], then per bin
    * `woe = ln((pos_i + ½)/(pos_tot + ½·k) ÷ (neg_i + ½)/(neg_tot + ½·k))`
    * (Laplace-smoothed so empty sides stay finite and BOTH engines agree
    * on edge bins) and `iv_contrib = (pos% − neg%)·woe`; the total IV is
    * the sum over bins, repeated per row.
    *
    * Equal-width (not quantile) bins on purpose: quantile binning via
    * ntile() is tie-order nondeterministic — equal-width is a pure map
    * off the broadcast 1-row (min, max), bit-reproducible everywhere.
    * Scale: one (min, max) agg, one map pass, one ≤nBins-row agg. */
  def woeIv(
      df: DataFrame,
      featureCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val in = df.where(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(col(featureCol).cast("double").as("_f"),
        col(labelCol).cast("boolean").as("_y"))
    val bounds = in.agg(min(col("_f")).as("_lo"), max(col("_f")).as("_hi"))
    val width = (col("_hi") - col("_lo")) / lit(nBins)
    val bin = when(col("_hi") === col("_lo"), lit(0))
      .otherwise(least(lit(nBins - 1),
        floor((col("_f") - col("_lo")) / width).cast("int")))
    val binned = in.crossJoin(broadcast(bounds))
      .select(bin.as("bin"),
        col("_y"),
        round(col("_lo") + bin * width, 6).as("bin_lo"))
    val perBin = binned.groupBy("bin", "bin_lo")
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("n_neg"))
    val wAll = Window.partitionBy()
    val k = count(lit(1)).over(wAll).cast("double")
    val posRate = (col("n_pos") + lit(0.5)) /
      (sum(col("n_pos")).over(wAll) + lit(0.5) * k)
    val negRate = (col("n_neg") + lit(0.5)) /
      (sum(col("n_neg")).over(wAll) + lit(0.5) * k)
    perBin
      .withColumn("woe", round(log(posRate / negRate), 6))
      .withColumn("iv_contrib",
        round((posRate - negRate) * log(posRate / negRate), 6))
      .withColumn("iv", round(sum(col("iv_contrib")).over(wAll), 6))
  }

  /** Kaplan–Meier survival estimator over (duration, event) subjects —
    * the churn/time-to-event curve with right-censoring done correctly
    * (a still-active subject says "survived ≥ t", never "churned at t"):
    * per distinct duration t, the at-risk count
    * `n_risk(t) = Σ_{t' ≥ t} subjects(t')` (a suffix-sum window), the
    * observed event count `d(t)`, and
    * `survival(t) = Π_{t' ≤ t} (1 − d/n_risk)` — the running product
    * folded as `exp(Σ ln(1 − d/n))` so both engines accumulate in frame
    * order and the product is order-independent.
    *
    * Scale shape: ONE hash-aggregate collapses subjects to the distinct
    * duration grid (the only pass at data scale); both windows run over
    * that grid, whose size is bounded by the observation span, not the
    * population. The grid windows are unpartitioned — sound for a
    * calendar-bounded duration grain (the rollingCorr contract). */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      eventCol: String): DataFrame = {
    val grid = df
      .where(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).as("t"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(when(col(eventCol).cast("boolean"), 1L).otherwise(0L))
          .as("d"))
    val wSuffix = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // d = n_risk (everyone at risk churns) sends the product to exactly
    // 0 — but Spark's log(0) is null (the term would silently VANISH
    // from the sum), so that arm is an explicit running-min guard
    val lnTerm = when(col("d") < col("n_risk"),
      log(lit(1.0) - col("d") / col("n_risk")))
    grid
      .withColumn("n_risk", sum(col("n_subjects")).over(wSuffix))
      .withColumn("survival",
        when(min(col("n_risk") - col("d")).over(wPrefix) > 0,
          round(exp(sum(lnTerm).over(wPrefix)), 6))
          .otherwise(lit(0.0)))
  }

  /** Welch's two-sample t-test (unequal variances) between the two arms
    * of `armCol` (values `0` and `1` — assign upstream with a
    * deterministic hash so the split is reproducible): one row with per-
    * arm n/mean/variance, the t statistic, the Welch–Satterthwaite
    * degrees of freedom, and a 95 % two-sided significance flag
    * (|t| ≥ 1.96 — the normal-approximation critical value; at the df
    * this test runs with at any real scale the t and normal quantiles
    * agree to 3 decimals).
    *
    * Scale shape: ONE hash-aggregate with conditional moments — six
    * doubles cross the wire regardless of input size. Null metrics are
    * excluded from their arm's moments. */
  def welchTTest(
      df: DataFrame,
      armCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    def arm(a: Int, f: Column => Column): Column =
      f(when(col(armCol) === a, v))
    val agg = df.where(v.isNotNull).agg(
      arm(0, count).as("n_a"), arm(1, count).as("n_b"),
      arm(0, avg).as("_ma"), arm(1, avg).as("_mb"),
      arm(0, var_samp).as("_va"), arm(1, var_samp).as("_vb"))
    val sea = col("_va") / col("n_a")
    val seb = col("_vb") / col("n_b")
    val tStat = (col("_ma") - col("_mb")) / sqrt(sea + seb)
    val dfW = pow(sea + seb, 2) /
      (pow(sea, 2) / (col("n_a") - 1) + pow(seb, 2) / (col("n_b") - 1))
    agg.select(col("n_a"), col("n_b"),
      round(col("_ma"), 6).as("mean_a"), round(col("_mb"), 6).as("mean_b"),
      round(col("_va"), 6).as("var_a"), round(col("_vb"), 6).as("var_b"),
      round(tStat, 6).as("t_stat"), round(dfW, 6).as("df_welch"),
      (round(abs(tStat), 6) >= 1.96).as("significant"))
  }

  /** Population Stability Index between a reference and a current
    * sample of the same numeric feature — the drift monitor a serving
    * pipeline runs between training and inference snapshots: `nBins`
    * equal-width bins over the REFERENCE range (current values outside
    * it clamp into the edge bins — drift concentrates there, it must
    * not vanish), Laplace-½-smoothed shares on both sides, per-bin
    * `psi_contrib = (p_ref − p_cur) · ln(p_ref/p_cur)` and the total
    * repeated per row. Rule of thumb: < 0.1 stable, > 0.25 drifted.
    *
    * Scale: one (min, max) agg on ref, one map + ≤nBins-row agg per
    * side, a bin-spine outer join so EMPTY bins still contribute. */
  def psiDrift(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val v = col(valueCol).cast("double")
    val bounds = ref.where(v.isNotNull)
      .agg(min(v).as("_lo"), max(v).as("_hi"))
    val width = (col("_hi") - col("_lo")) / lit(nBins)
    val bin = when(col("_hi") === col("_lo"), lit(0)).otherwise(
      least(lit(nBins - 1), greatest(lit(0),
        floor((v - col("_lo")) / width).cast("int"))))
    def binned(df: DataFrame, out: String): DataFrame =
      df.where(v.isNotNull).crossJoin(broadcast(bounds))
        .groupBy(bin.as("bin")).agg(count(lit(1)).as(out))
    val spine = ref.sparkSession.range(nBins)
      .select(col("id").cast("int").as("bin"))
    val counts = spine
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    psiFromCounts(counts, nBins)
  }

  /** The PSI share/total arithmetic over a pre-binned
    * `(bin, n_ref, n_cur)` frame — split out so a STREAMING current
    * side (bin counts as a streaming aggregate) prices drift against a
    * static reference with the identical math as [[psiDrift]]. */
  def psiFromCounts(counts: DataFrame, nBins: Int): DataFrame = {
    val wAll = Window.partitionBy()
    def share(c: String): Column = (col(c) + lit(0.5)) /
      (sum(col(c)).over(wAll) + lit(0.5) * lit(nBins))
    val p = share("n_ref")
    val q = share("n_cur")
    counts
      .withColumn("p_ref", round(p, 6))
      .withColumn("p_cur", round(q, 6))
      .withColumn("psi_contrib", round((p - q) * log(p / q), 6))
      .withColumn("psi", round(sum(col("psi_contrib")).over(wAll), 6))
  }

  /** Two-sample Kolmogorov–Smirnov drift test — the nonparametric
    * sibling of [[psiDrift]] (no binning choice, no smoothing):
    * `D = sup_x |F_ref(x) − F_cur(x)|`, evaluated EXACTLY on the merged
    * distinct-value grid, with the α=0.05 critical value
    * `1.358·√((n+m)/(n·m))` and the reject decision. Returns one row
    * `(d_stat, d_at, n_ref, n_cur, crit_05, drifted)`; `d_at` is the
    * smallest value achieving the sup (deterministic tie-break).
    *
    * Scale: per-side value counts are map-side-combined hash aggregates
    * (one shuffle each, carrying (value, count) only); the running-CDF
    * window then runs over the DISTINCT-VALUE GRID, not the data —
    * exact and cheap for discrete or rounded measures. For genuinely
    * continuous high-cardinality measures, quantize first
    * (`round(v, p)`) so the grid stays bounded; the grid window is the
    * deliberate single-partition step, sized by |grid| alone. */
  def ksTest(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    def counts(df: DataFrame, out: String): DataFrame =
      df.where(v.isNotNull).groupBy(v.as("v")).agg(count(lit(1)).as(out))
    val grid = counts(ref, "n_ref")
      .join(counts(cur, "n_cur"), Seq("v"), "full")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val wAll = Window.partitionBy()
    val wCdf = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = grid
      .withColumn("nr", sum(col("n_ref")).over(wAll))
      .withColumn("nc", sum(col("n_cur")).over(wAll))
      .withColumn("d", round(abs(
        sum(col("n_ref")).over(wCdf) / col("nr")
          - sum(col("n_cur")).over(wCdf) / col("nc")), 6))
      .withColumn("d_stat", max(col("d")).over(wAll))
    val crit = round(lit(1.358) *
      sqrt((col("n_ref") + col("n_cur")) / (col("n_ref") * col("n_cur"))), 6)
    cdf.where(col("d") === col("d_stat"))
      .agg(max(col("d_stat")).as("d_stat"), min(col("v")).as("d_at"),
        max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"))
      .select(col("d_stat"), col("d_at"), col("n_ref"), col("n_cur"),
        crit.as("crit_05"), (col("d_stat") > crit).as("drifted"))
  }

  /** Calibration report for a probabilistic classifier: `nBins`
    * equal-width probability bins over [0, 1] — fixed bounds, not
    * data-derived, so bins mean the same thing across models — with per-
    * bin count, mean predicted probability, observed positive rate, and
    * the global Brier score `avg((prob − y)²)` repeated per row. A
    * well-calibrated model has `pos_rate ≈ mean_prob` per bin.
    *
    * One map pass + one ≤nBins-row hash-agg; the Brier moment rides the
    * same aggregate. */
  def calibrationReport(
      scored: DataFrame,
      probCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val bin = least(lit(nBins - 1), floor(p * nBins).cast("int"))
    val wAll = Window.partitionBy()
    scored.where(p.isNotNull && y.isNotNull)
      .select(bin.as("bin"), p.as("_p"), y.as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("_p")), 6).as("mean_prob"),
        round(avg(col("_y")), 6).as("pos_rate"),
        sum(pow(col("_p") - col("_y"), 2)).as("_se"))
      .withColumn("brier",
        round(sum(col("_se")).over(wAll) / sum(col("n")).over(wAll), 6))
      .drop("_se")
  }

  /** Calibration by SCORE QUANTILE — the report to reach for when the
    * model's scores occupy a narrow band (a weakly-trained scorer can
    * put every document in one fixed [0,1] decile and
    * [[calibrationReport]] degenerates to one row): bin edges are the
    * nBins-quantile cuts of the score itself (6dp-rounded, `bin` =
    * number of cuts strictly below the score — a pure comparison, so
    * ties land identically on every engine), then the same per-bin
    * mean-prob / pos-rate / Brier columns.
    *
    * Exact interpolated percentiles for the oracle contract — at 100 TB
    * swap the cuts for `percentile_approx`/`Sketches.histogramQuantiles`
    * (broadcast 1-row either way; the madOutliers note). */
  def calibrationByQuantile(
      scored: DataFrame,
      probCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("double")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    // Column-API percentile so prob column names needing backticks work
    val cuts = scored.where(p.isNotNull && y.isNotNull).agg(
      transform(percentile(col(probCol), lit(qs.toArray)),
        c => round(c, 6)).as("_cuts"))
    val bin = size(filter(col("_cuts"), c => p > c))
    val wAll = Window.partitionBy()
    scored.where(p.isNotNull && y.isNotNull)
      .crossJoin(broadcast(cuts))
      .select(bin.as("bin"), p.as("_p"), y.as("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("_p")), 6).as("mean_prob"),
        round(avg(col("_y")), 6).as("pos_rate"),
        sum(pow(col("_p") - col("_y"), 2)).as("_se"))
      .withColumn("brier",
        round(sum(col("_se")).over(wAll) / sum(col("n")).over(wAll), 6))
      .drop("_se")
  }

  /** Classifier confusion matrix: one row per OBSERVED (actual,
    * predicted) cell with its count, the cell's share of its actual row
    * (= recall when actual = predicted) and of its predicted column
    * (= precision when actual = predicted), and the global accuracy
    * repeated per row — the audit you run on a heuristic labeler (e.g.
    * [[TextAnalysis.langId]] vs a declared-language column) before
    * trusting it to route data. Shares 6dp-rounded (exact integer ratios
    * cast once — the [[mutualInformation]] float contract).
    *
    * Scale shape: ONE hash-aggregate collapses the corpus to the
    * ≤|A|·|P|-row cell grid; row/column margins and the accuracy are
    * windows over that grid, never the data. */
  def confusionMatrix(
      df: DataFrame,
      actualCol: String,
      predCol: String): DataFrame = {
    val cells = df.where(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).as("actual"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))
    val wA = Window.partitionBy("actual")
    val wP = Window.partitionBy("predicted")
    val wAll = Window.partitionBy()
    cells
      .withColumn("row_share",
        round(col("n").cast("double") / sum(col("n")).over(wA), 6))
      .withColumn("col_share",
        round(col("n").cast("double") / sum(col("n")).over(wP), 6))
      .withColumn("accuracy",
        round(sum(when(col("actual") === col("predicted"), col("n"))
          .otherwise(0L)).over(wAll).cast("double") /
          sum(col("n")).over(wAll), 6))
  }

  /** Mutual information between two categorical columns — χ²'s
    * information-theoretic sibling (how many nats knowing A tells you
    * about B): one row per OBSERVED (a, b) cell with its pointwise
    * mutual information `pmi = ln(p_ab / (p_a·p_b))`, plus the corpus
    * totals repeated per row — `mi` (Σ p_ab·pmi), the marginal entropies
    * `h_a`/`h_b`, and the normalized `nmi = mi / √(h_a·h_b)`.
    * Zero-observed cells contribute exactly 0 to MI (p·ln p → 0), so
    * unlike [[chiSquareIndependence]] no margin grid is needed.
    *
    * Scale shape: ONE hash-aggregate to the contingency table; margins,
    * entropies, and totals are windows over that ≤|A|·|B|-row frame.
    * The ln argument is the exact integer ratio `n_ab·N / (n_a·n_b)`
    * cast once to double — both engines walk the identical float path. */
  def mutualInformation(
      df: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val wa = Window.partitionBy("a")
    val wb = Window.partitionBy("b")
    val wAll = Window.partitionBy()
    val na = sum(col("n")).over(wa)
    val nb = sum(col("n")).over(wb)
    val nTot = sum(col("n")).over(wAll)
    val pmi = log((col("n") * nTot).cast("double") / (na * nb))
    val pab = col("n") / nTot
    // marginal entropies: each cell carries its margin's share of the
    // -p·ln p term divided by the margin's cell count in that window —
    // summed over the window this folds to Σ_margins -p·ln p exactly
    def entropy(margin: Column) = {
      val p = margin / nTot
      -sum((col("n") / margin) * p * log(p)).over(wAll)
    }
    cells
      .withColumn("pmi", round(pmi, 6))
      .withColumn("mi", round(sum(pab * pmi).over(wAll), 6))
      .withColumn("h_a", round(entropy(na), 6))
      .withColumn("h_b", round(entropy(nb), 6))
      .withColumn("nmi",
        when(col("h_a") > 0 && col("h_b") > 0,
          round(col("mi") / sqrt(col("h_a") * col("h_b")), 6)))
  }

  /** Jensen–Shannon divergence of each group's categorical distribution
    * from the corpus-wide distribution — the curation question "which
    * source deviates most from the overall language mix": for each
    * group g, `JSD(P_g ‖ P_all) = ½·KL(P_g ‖ M) + ½·KL(P_all ‖ M)` with
    * `M = ½(P_g + P_all)`; symmetric, bounded by ln 2, zero-safe
    * (0·ln 0 terms drop; M > 0 wherever either side is).
    *
    * Scale: ONE hash-agg to the (group, category) table; the corpus
    * margin is a window over it; the group×category grid (margins cross
    * join, chi2-style — a category the group never emits still carries
    * ½·p_all·ln(p_all/m) mass) stays ≤|G|·|C| rows. Output: one row per
    * group with its jsd and share of corpus rows. */
  def jsdByGroup(
      df: DataFrame,
      groupCol: String,
      catCol: String): DataFrame = {
    // the (group, category) table feeds three branches (both margins +
    // the grid join): materialize it once
    val cells = df.where(col(groupCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(catCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val gm = cells.groupBy("g").agg(sum(col("n")).as("_ng"))
    val cm = cells.groupBy("c").agg(sum(col("n")).as("_nc"))
    val nt = cells.agg(sum(col("n")).as("_nt"))
    val grid = gm.crossJoin(broadcast(cm)).crossJoin(broadcast(nt))
      .join(cells, Seq("g", "c"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val wAll = Window.partitionBy()
    val p = col("n") / col("_ng")       // group share
    val q = col("_nc") / col("_nt")     // corpus share
    val m = (p + q) / lit(2.0)
    val term = when(p > 0, p * log(p / m)).otherwise(lit(0.0)) / 2.0 +
      q * log(q / m) / 2.0              // q > 0 by construction of cm
    grid
      .groupBy(col("g").as(groupCol))
      .agg(max(col("_ng")).as("n_rows"),
        round(sum(term), 6).as("jsd"))
      .withColumn("corpus_share",
        round(col("n_rows") / sum(col("n_rows")).over(wAll), 6))
  }

  /** RFM (recency / frequency / monetary) customer segmentation: each
    * dimension scored 1–5 by quintile cuts of its own distribution
    * (6dp-rounded interpolated percentiles compared STRICTLY — ties land
    * identically on every engine, the calibrationByQuantile rule);
    * recency is inverted (recent = good). Emits the raw dimensions, the
    * three scores, and the concatenated `rfm` segment key.
    *
    * One per-customer hash-agg, one 1-row percentile agg (exact for the
    * oracle; swap approx at 100 TB — the madOutliers note), broadcast
    * cuts, pure map scoring. */
  def rfmSegments(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String): DataFrame = {
    val perCust = orders
      .where(col(custCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(col(custCol))
      .agg(max(col(dateCol)).as("_last"),
        count(lit(1)).as("frequency"),
        round(sum(col(amountCol)), 2).as("monetary"))
    val horizon = perCust.agg(max(col("_last")).as("_h"))
    val base = perCust.crossJoin(broadcast(horizon))
      .withColumn("recency_days",
        datediff(col("_h"), col("_last")).cast("double"))
      .drop("_last", "_h")
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    // Column-API percentile: the madOutliers backtick-safety contract
    def cutsOf(c: String) =
      transform(percentile(col(c), lit(qs.toArray)),
        x => round(x, 6)).as(s"_cuts_$c")
    val cuts = base.agg(cutsOf("recency_days"), cutsOf("frequency"),
      cutsOf("monetary"))
    def below(c: String): Column =
      size(filter(col(s"_cuts_$c"), x => col(c).cast("double") > x))
    base.crossJoin(broadcast(cuts))
      .withColumn("r_score", lit(5) - below("recency_days")) // recent = 5
      .withColumn("f_score", below("frequency") + 1)
      .withColumn("m_score", below("monetary") + 1)
      .withColumn("rfm", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .drop("_cuts_recency_days", "_cuts_frequency", "_cuts_monetary")
  }

  /** ROC AUC via the rank statistic (Mann–Whitney U with midranks for
    * ties): `AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)` where R⁺ is the sum of
    * positive midranks — exactly the probability a random positive
    * outscores a random negative (ties count ½), with no threshold
    * sweep. Returns one row `(n_pos, n_neg, auc, gini)`.
    *
    * Scale shape: ONE hash-agg collapses scores to the distinct-score
    * grid (scores should be ROUNDED upstream — 6dp bounds the grid at
    * ~10⁶ rows however big the corpus); one running window over that
    * grid assigns midranks; one 1-row agg folds U. The grid window is
    * unpartitioned — sound because the rounded-score grain is bounded,
    * the rollingCorr contract. */
  def aucRank(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val grid = scored.where(col(scoreCol).isNotNull && y.isNotNull)
      .groupBy(col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_cnt"), sum(y).as("_pos"))
    val cumBefore = coalesce(
      sum(col("_cnt")).over(Window.orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val midrank = cumBefore + (col("_cnt") + lit(1.0)) / lit(2.0)
    grid
      .withColumn("_rsum", col("_pos") * midrank)
      .agg(sum(col("_pos")).cast("long").as("n_pos"),
        (sum(col("_cnt")) - sum(col("_pos"))).cast("long").as("n_neg"),
        sum(col("_rsum")).as("_rpos"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("_rpos") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * col("n_neg")), 6)).as("auc"))
      .withColumn("gini", round(col("auc") * 2 - 1, 6))
  }

  /** Leave-one-out target encoding with m-estimate smoothing: replace a
    * high-cardinality categorical with the mean target of its category
    * computed EXCLUDING the row itself —
    * `enc = (Σ_cat y − y_row + m·prior) / (n_cat − 1 + m)` — the
    * leakage-safe form (plain mean encoding lets each row see its own
    * label, the classic target-leak that inflates offline metrics). The
    * prior is the global target mean; `m` pulls thin categories toward it
    * (a category seen once encodes exactly to the prior). 6dp-rounded.
    *
    * Scale shape: per-category (sum, count) via ONE window over the
    * category partition (sum/count windows without ORDER BY collapse to a
    * single hash-style pass — no per-row sort state); the global prior is
    * a 1-row broadcast re-entry. No driver state, no category table
    * materialized — exactly why target encoding (not one-hot) is the
    * 100 TB posture for 10⁸-cardinality keys. */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      yCol: String,
      m: Double = 10.0): DataFrame = {
    require(m >= 0, "m must be >= 0")
    val wc = Window.partitionBy(col(catCol))
    val prior = df.agg(
      (sum(col(yCol)).cast("double") / count(col(yCol))).as("_prior"))
    // m = 0 + a singleton (or all-null-y) category degenerates the LOO
    // denominator to 0 — those rows encode to null instead of erroring
    // under ANSI division
    val denom = count(col(yCol)).over(wc) - 1 + lit(m)
    df.crossJoin(broadcast(prior))
      .withColumn("enc",
        when(denom > 0,
          round((sum(col(yCol)).over(wc) - col(yCol) + lit(m) * col("_prior")) /
            denom, 6)))
      .drop("_prior")
  }

  /** Wilson-score interval on a per-group pass rate (Wilson 1927; the
    * interval Agresti–Coull approximates) — the governance number for
    * "which sources meet the quality bar with CONFIDENCE": a source with
    * 3/3 passing is not safer than one with 940/1000, and the Wilson
    * lower bound says so where the raw rate lies. Returns
    * (group, n, n_pass, rate, lo, hi), all rates 6dp-rounded; `z` is
    * the normal quantile (1.96 ≈ 95%).
    *
    * One map-side-combined hash-agg by group; the interval algebra runs
    * on the ≤|groups|-row aggregate, written in the exact association
    * order the oracle mirrors. */
  def wilsonPassRate(
      df: DataFrame,
      groupCol: String,
      passCol: String,
      z: Double = 1.96): DataFrame = {
    require(z > 0, "z must be positive")
    val zc = lit(z)
    val a = df.groupBy(groupCol).agg(
      count(lit(1)).cast("double").as("_n"),
      sum(when(col(passCol), 1).otherwise(0)).cast("double").as("_k"))
    val n = col("_n")
    val p = col("_k") / n
    val half = zc * sqrt(p * (lit(1.0) - p) / n +
      (zc * zc) / (lit(4.0) * n * n))
    val den = lit(1.0) + (zc * zc) / n
    a.select(col(groupCol),
      col("_n").cast("long").as("n"),
      col("_k").cast("long").as("n_pass"),
      round(p, 6).as("rate"),
      round(((p + (zc * zc) / (lit(2.0) * n)) - half) / den, 6).as("lo"),
      round(((p + (zc * zc) / (lit(2.0) * n)) + half) / den, 6).as("hi"))
  }

  /** Unbiased pass@k over per-attempt eval results (Chen et al. 2021,
    * "Evaluating Large Language Models Trained on Code", eq. 1): per
    * problem with n attempts and c passes,
    * `pass@k = 1 − C(n−c, k)/C(n, k)`, computed as the numerically-stable
    * product `1 − Π_{i=0..k−1} (n−c−i)/(n−i)` (left-fold — the paper's
    * own reference implementation). `c = 0` gives 0, `n − c < k` gives 1
    * (some k-subset must contain a pass), and `n < k` yields null (the
    * estimator is undefined — fewer samples than the budget it scores).
    *
    * Scale posture: ONE hash-aggregate over the attempts keyed by
    * problem (map-side combinable count/sum), then a bounded k-term
    * product per problem row — the per-problem attempt set is never
    * materialized. The fold is a HOF (interpreted) but runs on the
    * ≤|problems|-row aggregate, not the attempt stream. */
  def passAtK(
      df: DataFrame,
      problemCol: String,
      passed: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val a = df.groupBy(problemCol).agg(
      count(lit(1)).as("n"),
      sum(when(passed, 1L).otherwise(0L)).as("c"))
    val n = col("n").cast("double")
    val c = col("c").cast("double")
    val estimates = ks.map { k =>
      val prod = aggregate(
        sequence(lit(0), lit(k - 1)),
        lit(1.0),
        (acc, i) => acc * (n - c - i.cast("double")) / (n - i.cast("double")))
      when(col("n") < k, lit(null).cast("double"))
        .when(col("n") - col("c") < k, lit(1.0))
        .otherwise(round(lit(1.0) - prod, 6))
        .as(s"pass_at_$k")
    }
    a.select(col(problemCol) +: col("n") +: col("c") +: estimates: _*)
  }

  /** Poisson-bootstrap cumulative thresholds for λ = 1: P(X ≤ k) for
    * k = 0..5, 9dp literals shared with the oracle (draws above the last
    * threshold clamp to 6 — P(X > 6) ≈ 8·10⁻⁵, negligible for CI work
    * and keeps the when-chain bounded). */
  val poissonCdf1: Seq[Double] = Seq(
    0.367879441, 0.735758882, 0.919698603, 0.981011843, 0.996340153,
    0.999405815)

  /** Percentile-bootstrap confidence interval for a per-group MEAN of an
    * integer metric, via the POISSON bootstrap (Chamandy et al. 2012 —
    * the resampling scheme that works on a distributed corpus: each row
    * draws an independent Poisson(1) replication count per resample, so
    * no pass ever needs the group's row count up front). Deterministic:
    * the "draw" is a hash-uniform u = hash60(id:bs:b)/10⁹ pushed through
    * the pinned λ=1 CDF literals, so two runs — and the oracle — agree
    * exactly. The CI is the exact (⌈α/2·B⌉, ⌈(1−α/2)·B⌉) pair of order
    * statistics over the B resample means (no interpolation).
    *
    * Scale posture: one B-way explode of the narrow (id, value) frame
    * (values are integers — resample sums are EXACT), one (group, b)
    * hash-agg, then order statistics over the B-row-per-group aggregate
    * assembled sort-inside-the-aggregate. Nothing bigger than B rows per
    * group past the first aggregate. */
  def bootstrapCI(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      b: Int = 40,
      alpha: Double = 0.05): DataFrame = {
    require(b >= 4 && alpha > 0 && alpha < 1, "need B >= 4, alpha in (0,1)")
    val u = (Hashing.hash60(concat_ws(":", col(idCol).cast("string"),
      lit("bs"), col("_b").cast("string"))) % 1000000000L).cast("double") /
      1e9
    val w = poissonCdf1.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (p, k)) =>
        acc.when(u < p, lit(k))
      }
      .otherwise(lit(6))
    val loIdx = math.max(1, math.ceil(alpha / 2 * b).toInt)
    val hiIdx = math.min(b, math.ceil((1 - alpha / 2) * b).toInt)
    val resampled = df
      .select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("_b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("_w", w)
      .groupBy(col(groupCol), col("_b"))
      .agg(sum(col("_w").cast("long") * col(valueCol)).as("_ws"),
        sum(col("_w").cast("long")).as("_wn"))
      .filter(col("_wn") > 0) // an all-zero resample has no mean
      .select(col(groupCol),
        (col("_ws").cast("double") / col("_wn")).as("_mean"))
    val base = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      round(sum(col(valueCol)).cast("double") / count(lit(1)), 6).as("mean"))
    val ci = resampled.groupBy(col(groupCol))
      .agg(array_sort(collect_list(col("_mean"))).as("_ms"),
        count(lit(1)).as("n_resamples"))
      .select(col(groupCol), col("n_resamples"),
        round(element_at(col("_ms"),
          least(lit(loIdx), size(col("_ms")))), 6).as("boot_lo"),
        round(element_at(col("_ms"),
          least(lit(hiIdx), size(col("_ms")))), 6).as("boot_hi"))
    base.join(ci, Seq(groupCol), "left_outer")
  }

  /** Split-conformal calibration (Vovk; Lei et al. 2018): per group,
    * the calibration half's nonconformity scores (|y − ŷ|, INTEGER here
    * so order statistics are exact) yield
    * `q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest score`; the interval
    * `ŷ ± q̂` then covers ≥ 1−α of exchangeable test points — the
    * distribution-free guarantee, CHECKED on the held-out half. The
    * cal/test split is hash-deterministic on the id. The coverage level
    * is a RATIONAL `coverNum/coverDen` so the rank
    * `k = ⌈(n_cal+1)·num/den⌉` is pure integer arithmetic — a double
    * `(n+1)·0.9` rounds differently than DECIMAL at exact multiples and
    * would desync the two engines by one rank.
    *
    * Scale posture: one rank window per group over the calibration half
    * (sort-based, spillable — never a driver collect), one
    * groups-sized (group, q̂) join back, one coverage aggregate. */
  def splitConformal(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      yCol: String,
      predCol: String,
      coverNum: Int = 9,
      coverDen: Int = 10): DataFrame = {
    require(coverDen > 0 && coverNum > 0 && coverNum < coverDen,
      "coverage must be a proper fraction")
    val isCal = Hashing.hash60(concat_ws(":", col(idCol).cast("string"),
      lit("cf"))) % 100 < 50
    val scored = df.select(col(groupCol), col(idCol),
      abs(col(yCol) - col(predCol)).as("_s"), isCal.as("_cal"))
    val cal = scored.filter(col("_cal"))
    val nCal = cal.groupBy(col(groupCol)).agg(count(lit(1)).as("n_cal"))
    val ranked = cal.withColumn("_r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
        .orderBy(col("_s"), col(idCol))))
    // k = ceil((n_cal+1)·num/den) as integers; k > n_cal → infinite interval
    val k = expr(
      s"((n_cal + 1) * $coverNum + ${coverDen - 1}) div $coverDen")
    val qhat = ranked.join(nCal, Seq(groupCol))
      .filter(col("_r") === least(k, col("n_cal")))
      .withColumn("_unbounded", (k > col("n_cal")).cast("int"))
      .select(col(groupCol), col("n_cal"), col("_s").as("qhat"),
        col("_unbounded"))
    scored.filter(!col("_cal"))
      .join(qhat, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        max(col("qhat")).as("qhat"),
        max(col("_unbounded")).as("unbounded"),
        round(sum(when(col("_s") <= col("qhat") || col("_unbounded") === 1,
          1L).otherwise(0L)).cast("double") / count(lit(1)), 6)
          .as("coverage"))
      .withColumn("target",
        round(lit(coverNum.toDouble) / coverDen, 6))
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement among a
    * FIXED panel of `nRaters` raters assigning one categorical label per
    * item — the multi-annotator dual of pairwise Cohen's κ, and the
    * standard gate on human-labeled training/eval data before the labels
    * are trusted. Per group:
    * `P̄ = (Σ_i Σ_j n_ij² − N·n) / (N·n·(n−1))` (observed agreement),
    * `P_e = Σ_j (Σ_i n_ij / (N·n))²` (chance agreement),
    * `κ = (P̄ − P_e) / (1 − P_e)`. Items that did not receive exactly
    * `nRaters` labels are excluded (the classic estimator requires a
    * balanced panel) and surfaced in `n_unbalanced`; κ is null when
    * `P_e = 1` (a single category — agreement is undefined, not perfect).
    * P̄ and P_e are 6dp-rounded and κ is computed FROM the rounded values
    * so an oracle replays identical arithmetic.
    *
    * Scale shape: one (group, item, label) hash-aggregate over the
    * ratings (map-side combined), re-aggregated to per-item totals and
    * then to one row per group; the label-marginal pass reuses the same
    * counts. Nothing wider than the rating tuples ever shuffles, and the
    * output is bounded by the group cardinality. */
  def fleissKappa(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      labelCol: String,
      nRaters: Int): DataFrame = {
    require(nRaters >= 2, "nRaters must be >= 2")
    val cnt = df.groupBy(col(groupCol), col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nij"))
    val itemTot = cnt.groupBy(col(groupCol), col(itemCol))
      .agg(sum("nij").as("n_i"), sum(col("nij") * col("nij")).as("sq_i"))
    val bal = itemTot.filter(col("n_i") === nRaters)
    val grp = itemTot.groupBy(col(groupCol)).agg(
      sum(when(col("n_i") === nRaters, 1L).otherwise(0L)).as("n_items"),
      sum(when(col("n_i") =!= nRaters, 1L).otherwise(0L)).as("n_unbalanced"),
      sum(when(col("n_i") === nRaters, col("sq_i")).otherwise(0L))
        .as("_sum_sq"))
    val cat = cnt.join(bal.select(col(groupCol), col(itemCol)),
        Seq(groupCol, itemCol))
      .groupBy(col(groupCol), col(labelCol))
      .agg(sum("nij").as("cat_tot"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("cat_tot") * col("cat_tot")).as("_sum_cat2"))
    val n = lit(nRaters.toLong)
    grp.join(cat, Seq(groupCol), "left")
      .withColumn("pbar", when(col("n_items") > 0,
        round((col("_sum_sq") - col("n_items") * n) /
          (col("n_items") * n * (nRaters - 1)), 6)))
      .withColumn("pe", when(col("n_items") > 0,
        round(col("_sum_cat2") /
          (col("n_items") * n * col("n_items") * n), 6)))
      .withColumn("kappa", when(col("pe") < 1.0,
        round((col("pbar") - col("pe")) / (lit(1.0) - col("pe")), 6)))
      .drop("_sum_sq", "_sum_cat2")
  }

  /** Krippendorff's alpha, nominal scale (Krippendorff 1970/2004): the
    * agreement coefficient that — unlike [[fleissKappa]] — handles a
    * VARIABLE number of raters per item: units rated by 2-5 raters all
    * contribute, single-rating units are unpairable (surfaced in
    * `n_unpairable`), units with more than 5 raters are excluded and
    * surfaced in `n_oversize` (see below). Nominal form:
    * `α = 1 − (n−1)·Σ_u (m_u² − Σ_c n_uc²)/(m_u−1) / (n² − Σ_c n_c²)`
    * with n = total pairable ratings, n_c = label totals over pairable
    * units.
    *
    * EXACT-ARITHMETIC construction: the only fractions are the per-unit
    * `1/(m_u−1)` weights, and for panels of 2-5 raters `(m_u−1)` divides
    * 12 — so the sum is accumulated as the INTEGER
    * `Σ_u (12/(m_u−1))·(m_u² − Σn_uc²)` (a `when` chain picks
    * 12/6/4/3), and α is one double division at the end, 6dp. No float
    * accumulation order anywhere, so an oracle replays it bit-exact —
    * the reason for the 5-rater exactness bound. α is null when the
    * denominator degenerates (one label, or n ≤ 1).
    *
    * Scale: one (group, item, label) hash-aggregate re-aggregated twice,
    * exactly [[fleissKappa]]'s posture — output bounded by groups. */
  def krippendorffAlpha(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      labelCol: String): DataFrame = {
    val cnt = df.groupBy(col(groupCol), col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nuc"))
    val unit = cnt.groupBy(col(groupCol), col(itemCol))
      .agg(sum("nuc").as("m"), sum(col("nuc") * col("nuc")).as("sq"))
    val pairable = unit.filter(col("m") >= 2 && col("m") <= 5)
    val sOver = when(col("m") === 2, 12L).when(col("m") === 3, 6L)
      .when(col("m") === 4, 4L).otherwise(3L)
    val grp = unit.groupBy(col(groupCol)).agg(
      sum(when(col("m") >= 2 && col("m") <= 5, 1L).otherwise(0L))
        .as("n_units"),
      sum(when(col("m") === 1, 1L).otherwise(0L)).as("n_unpairable"),
      sum(when(col("m") > 5, 1L).otherwise(0L)).as("n_oversize"),
      sum(when(col("m") >= 2 && col("m") <= 5,
        sOver * (col("m") * col("m") - col("sq"))).otherwise(0L)).as("_a"),
      sum(when(col("m") >= 2 && col("m") <= 5, col("m")).otherwise(0L))
        .as("n"))
    val lbl = cnt
      .join(pairable.select(col(groupCol), col(itemCol)),
        Seq(groupCol, itemCol))
      .groupBy(col(groupCol), col(labelCol))
      .agg(sum("nuc").as("nc"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("nc") * col("nc")).as("_sumc2"))
    grp.join(lbl, Seq(groupCol), "left")
      .withColumn("alpha",
        when(col("n") > 1 && col("n") * col("n") - col("_sumc2") > 0,
          round(lit(1.0) - (col("n") - 1) * col("_a") /
            (lit(12L) * (col("n") * col("n") - col("_sumc2"))), 6)))
      .drop("_a", "_sumc2")
  }

  /** Rank-biased overlap (Webber/Moffat/Zobel 2010), truncated at depth
    * `k`: `RBO = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d` — the standard
    * top-weighted similarity between two rankings (here: two ANN
    * configurations answering the same queries), robust to tail
    * disagreement in a way plain overlap@k is not. The per-depth weights
    * `(1−p)·p^{d−1}/d` are PLAN-TIME literals and the weighted sum is a
    * FIXED-ORDER expression over a conditional-max pivot (never a float
    * aggregation), so both engines fold the identical doubles in the
    * identical order.
    *
    * Scale: one equi-join on (query, item) + one explode to the ≤ k
    * contributing depths + a per-query hash-aggregate. Queries sharing
    * no items still report (rbo 0) via the left join back to the query
    * set. */
  def rbo(
      a: DataFrame, // (qid, cid, rnk)
      b: DataFrame,
      k: Int = 10,
      p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 20, "k must be in [1, 20]")
    require(p > 0 && p < 1, "p must be in (0, 1)")
    val wts = (1 to k).map(d => d -> ((1 - p) * math.pow(p, d - 1) / d))
    val j = a.select(col("qid"), col("cid"), col("rnk").as("_ra"))
      .join(b.select(col("qid"), col("cid"), col("rnk").as("_rb")),
        Seq("qid", "cid"))
      .filter(greatest(col("_ra"), col("_rb")) <= k)
    // a shared item counts toward X_d for every depth d >= max(ra, rb)
    val xd = j.select(col("qid"),
        explode(sequence(greatest(col("_ra"), col("_rb")).cast("int"),
          lit(k))).as("d"))
      .groupBy("qid", "d").agg(count(lit(1)).as("x"))
    val piv = xd.groupBy("qid").agg(
      (1 to k).map(d =>
        coalesce(max(when(col("d") === d, col("x"))), lit(0L))
          .as(s"_x$d")).head,
      (2 to k).map(d =>
        coalesce(max(when(col("d") === d, col("x"))), lit(0L))
          .as(s"_x$d")): _*)
    val rboCol = wts.map { case (d, w) => lit(w) * col(s"_x$d") }
      .reduce(_ + _)
    a.select(col("qid")).distinct()
      .join(piv, Seq("qid"), "left")
      .na.fill(0L, (1 to k).map(d => s"_x$d"))
      .withColumn("overlap_k", round(col(s"_x$k") / k, 6))
      .withColumn("rbo", round(rboCol, 6))
      .drop((1 to k).map(d => s"_x$d"): _*)
  }

  /** Benjamini–Hochberg FDR control (1995) over a family of m
    * hypotheses: rank p-values ascending, find the largest rank with
    * `p ≤ rank·q/m`, and flag every hypothesis at or below that rank a
    * discovery. Pure rank arithmetic — the only float is the threshold
    * `rank·q/m`, computed identically in both engines. Emits every
    * hypothesis with its rank, BH threshold (6dp), and discovery flag.
    *
    * The rank runs in ONE partition by design: this is a REPORT over a
    * hypothesis family (metrics × segments — thousands, not billions);
    * partition by family key upstream when testing many families. */
  def bhFdr(
      df: DataFrame,
      idCol: String,
      pCol: String,
      q: Double = 0.05): DataFrame = {
    require(q > 0 && q < 1, "q must be in (0, 1)")
    val wOrd = Window.orderBy(col(pCol), col(idCol))
    val wAll = Window.partitionBy()
    df.select(col(idCol), col(pCol))
      .withColumn("rank", row_number().over(wOrd).cast("long"))
      .withColumn("_m", count(lit(1)).over(wAll))
      .withColumn("threshold", round(col("rank") * q / col("_m"), 6))
      .withColumn("_pass", col(pCol) <= col("rank") * q / col("_m"))
      .withColumn("_kstar",
        max(when(col("_pass"), col("rank"))).over(wAll))
      .withColumn("discovery",
        (col("rank") <= coalesce(col("_kstar"), lit(0L))).cast("int"))
      .drop("_m", "_pass", "_kstar")
  }

  /** Temperature-scaling calibration (Guo et al. 2017) by grid search:
    * for each pinned temperature `T`, mean NLL of `σ(z/T)` against the
    * binary labels (per-row NLL 6dp-rounded before the mean, the house
    * float-parity posture); the best row minimizes mean NLL with a
    * smallest-T tie-break. The one-parameter post-hoc calibrator every
    * LLM eval stack runs before trusting its confidence numbers —
    * complements the DIAGNOSTIC calibration reports (q177/q196), which
    * measure miscalibration but don't fix it.
    *
    * Scale: grid × corpus is a broadcast cross join (|grid| rows), one
    * hash-aggregate per temperature; output is |grid| rows. */
  def temperatureScaling(
      df: DataFrame,
      idCol: String,
      logitCol: String,
      labelCol: String,
      grid: Seq[Double] = Seq(0.25, 0.33, 0.5, 0.75, 1.0, 1.5, 2.0, 4.0)): DataFrame = {
    require(grid.nonEmpty && grid.forall(_ > 0), "grid must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val g = grid.toDF("t")
    // clamp σ into [ε, 1−ε] (Guo et al.'s standard posture): at
    // |z|/T ≳ 37 double σ saturates to exactly 0/1 and log() nulls;
    // null NLL rows silently vanish from sum() but not count(), biasing
    // mean_nll low and breaking the min-struct is_best flag
    val eps = 1e-12
    val p = least(greatest(sigmoid(col(logitCol) / col("t")), lit(eps)),
      lit(1.0 - eps))
    val nll = round(lit(0.0) -
      (col(labelCol) * log(p) + (lit(1) - col(labelCol)) * log(lit(1.0) - p)),
      6)
    val perT = df.select(col(idCol), col(logitCol), col(labelCol))
      .crossJoin(broadcast(g))
      .select(col("t"), nll.as("_nll"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"),
        round(sum("_nll") / count(lit(1)), 6).as("mean_nll"))
    val wAll = Window.partitionBy()
    perT
      .withColumn("_best", min(struct(col("mean_nll"), col("t"))).over(wAll))
      .withColumn("is_best",
        (col("mean_nll") === col("_best.mean_nll") &&
          col("t") === col("_best.t")).cast("int"))
      .drop("_best")
  }

  /** Group-relative reward normalization (the GRPO estimator, Shao et
    * al. 2024, and the best-of-n selection every rejection-sampling /
    * RLVR batch-prep stage runs): per prompt group of sampled
    * completions, `advantage = (r − mean_r) / std_r` with the
    * POPULATION std, plus the best-of-n flag (max reward, lowest-id
    * tie-break) and the group mean/std for the training log. A
    * zero-std group (every completion scored identically — common
    * under binary verifiable rewards) yields advantage 0 for all
    * members, the GRPO convention (no gradient signal, not a NaN).
    *
    * Float-parity posture: mean and variance derive from Σr and Σr² —
    * when rewards are integer-valued (milli-rewards, verifier counts)
    * those sums are EXACT in any summation order, so both engines
    * compute identical doubles from identical integers (no
    * stddev-algorithm divergence); `std_r = sqrt(Σr²/n − mean²)` and
    * every emitted double is 6dp-rounded.
    *
    * Scale shape: one window partitioned by the group (groups are
    * small — n completions per prompt — so the shuffle is by prompt
    * key and state per group is a few sums); no joins, no collect. */
  def groupAdvantage(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      rewardCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
    val r = col("reward")
    val mean = sum(r).over(w) / count(lit(1)).over(w)
    val variance = sum(r * r).over(w) / count(lit(1)).over(w) - mean * mean
    // float residue can land variance at ~−1e-16 on constant groups;
    // clamp (exact: variance ≥ 0) — the q300 −0.0 lesson
    val std = sqrt(greatest(variance, lit(0.0)))
    val best = min(struct((lit(0.0) - r).as("nr"), col(idCol).as("id")))
      .over(w)
    df.select(col(groupCol), col(idCol),
        col(rewardCol).cast("double").as("reward"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("mean_r", round(mean, 6))
      .withColumn("std_r", round(std, 6))
      .withColumn("advantage",
        when(std > 0, round((r - mean) / std, 6)).otherwise(lit(0.0)))
      .withColumn("_best", best)
      .withColumn("is_best",
        (r === lit(0.0) - col("_best.nr") && col(idCol) === col("_best.id"))
          .cast("int"))
      .drop("_best")
  }

  /** DPO preference-pair construction — the [[groupAdvantage]] sibling
    * for offline preference tuning: per prompt group, pick the
    * highest-scored completion as `chosen` and the lowest as
    * `rejected`, keep pairs whose margin clears `minMargin`, and drop
    * degenerate groups (fewer than two completions, or chosen ==
    * rejected). Ties break DETERMINISTICALLY on the id (max side:
    * higher id; min side: lower id) via struct ordering inside the
    * aggregate — `max_by`/window-free, so two runs (and the SQL
    * oracle's `row_number` formulation) agree bit-for-bit.
    *
    * Scale shape: ONE map-side-combinable aggregate by prompt —
    * `max(struct(score, id))` / `min(struct(score, id))` fold to a
    * constant per group on the map side, so the shuffle carries two
    * structs per prompt, not the completion rows. (Struct agg buffers
    * plan as SortAggregate — per-partition spillable sorts on the map
    * side — not HashAggregate; the partial/final split is the claim
    * that matters.) The tempting `row_number` window formulation
    * shuffles EVERY completion to its prompt's reducer and sorts the
    * whole corpus there; at scale the aggregate form is the one you
    * want. */
  def dpoPairs(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      minMargin: Double): DataFrame = {
    val sc = col(scoreCol).cast("double")
    df.groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_responses"),
        max(struct(sc.as("s"), col(idCol).as("id"))).as("_ch"),
        min(struct(sc.as("s"), col(idCol).as("id"))).as("_rj"))
      .filter(col("n_responses") >= 2 &&
        col("_ch.id") =!= col("_rj.id") &&
        col("_ch.s") - col("_rj.s") >= minMargin)
      .select(col(promptCol), col("n_responses"),
        col("_ch.id").as("chosen_id"), col("_ch.s").as("chosen_score"),
        col("_rj.id").as("rejected_id"), col("_rj.s").as("rejected_score"),
        (col("_ch.s") - col("_rj.s")).as("margin"))
  }
}
