package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
