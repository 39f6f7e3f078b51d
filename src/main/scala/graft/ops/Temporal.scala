package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: backward as-of join and a
  * binned interval (range-containment) join.
  *
  * Both are expressed so the pair space never explodes:
  *  - as-of is a union + one running window per key — a single shuffle of
  *    (key, time)-tagged rows, no join at all;
  *  - the interval join buckets time into fixed bins and equi-joins on
  *    (key, bin), so only same-bin rows ever meet — the theta-join that
  *    Spark would otherwise plan as a broadcast nested loop becomes a
  *    shuffle hash join, the 100 TB shape.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the `payload` columns
    * of the most recent right row with the same `keys` and
    * `right(rTime) <= left(lTime)` (inclusive, matching DuckDB
    * `ASOF LEFT JOIN ... ON l.t >= r.t`). Unmatched left rows keep null
    * payloads (left-outer semantics).
    *
    * Implementation: tag both sides, union, and take a running
    * `last(payload, ignoreNulls)` per key ordered by (time, side) with
    * right rows sorting first at equal timestamps. One window shuffle on
    * `keys`; no join, no range explosion — each row is touched once.
    *
    * Right-side determinism is the caller's contract: if two right rows
    * share (keys, rTime), pre-aggregate them first (the window picks the
    * last in sort order, which is otherwise partition-dependent). Null
    * payload VALUES on matched rows are indistinguishable from no-match
    * (ignoreNulls skips them) — pre-filter or fill if that matters.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the union routes right-side payload values through columns of these
    // names: a left column sharing a payload name would feed left values
    // into the running last(), and _t/_side would be silently clobbered
    val collide = (payload ++ Seq("_t", "_side")).filter(leftCols.contains)
    require(collide.isEmpty,
      s"asofJoinBackward: left columns ${collide.mkString(", ")} collide " +
        "with payload/_t/_side; rename them before the join")
    require(!payload.exists(Set("_t", "_side")),
      "asofJoinBackward: payload may not be named _t or _side")
    val l = left
      .withColumn("_t", col(lTime))
      .withColumn("_side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rTime).as("_t"), lit(0).as("_side")) ++
        payload.map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPayload = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Forward as-of join: for each left row, attach the payload of the
    * EARLIEST right row with the same keys and `right(rTime) >=
    * left(lTime)` (inclusive — DuckDB `ASOF LEFT JOIN ... ON l.t <=
    * r.t`). The "next quote after the trade" direction; same
    * single-shuffle union+window shape as [[asofJoinBackward]] with the
    * running `last` taken over DESCENDING time (right rows still first
    * at equal timestamps, so an exactly-simultaneous right row matches).
    * Same right-side-determinism and null-payload contracts. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val collide = (payload ++ Seq("_t", "_side")).filter(leftCols.contains)
    require(collide.isEmpty,
      s"asofJoinForward: left columns ${collide.mkString(", ")} collide " +
        "with payload/_t/_side; rename them before the join")
    require(!payload.exists(Set("_t", "_side")),
      "asofJoinForward: payload may not be named _t or _side")
    val l = left
      .withColumn("_t", col(lTime))
      .withColumn("_side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rTime).as("_t"), lit(0).as("_side")) ++
        payload.map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPayload = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** Binned interval join: inner-join `points` (instant `pTime`) to
    * `intervals` (half-open [`startCol`, `endCol`)) sharing `keys`, with
    * time bucketed into `binSeconds`-wide bins. Each interval is exploded
    * to the bins it covers (≈ length/bin + 1 rows — pick a bin near the
    * typical interval length); each point has exactly ONE bin, so every
    * qualifying (point, interval) pair is emitted exactly once, no
    * dedup needed. Equi-join on (keys, bin) + residual range filter:
    * shuffles by (key, bin) instead of nested-looping the cross product.
    */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pTime: String,
      startCol: String,
      endCol: String,
      binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    def bin(c: Column): Column = floor(unix_micros(c) / binUs)
    val p = points.withColumn("_bin", bin(col(pTime)))
    val i = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)),
        // end is exclusive: the last covered bin holds end - 1µs
        bin(col(endCol) - expr("INTERVAL 1 MICROSECOND")))))
    p.join(i, keys :+ "_bin")
      .filter(col(pTime) >= col(startCol) && col(pTime) < col(endCol))
      .drop("_bin")
  }

  /** Point-in-time join: each fact picks up the dimension version valid
    * at its timestamp — the standard read side of an SCD-type-2 dimension
    * ([[MergeUpdate.scd2]]'s dual): key equality plus
    * `from ≤ ts < to` (open rows have null `to`). Left join keeps facts
    * that predate every version (null dim columns).
    *
    * Scale shape: an equi-join on the dimension key with the validity
    * check as a residual filter — each key has few versions, so the
    * residual rejects a bounded number of rows per fact and the planner
    * is free to broadcast the dimension or shuffle both sides by key;
    * no interval explosion, no theta join. */
  def pointInTimeJoin(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      tsCol: String,
      fromCol: String,
      toCol: String): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(tsCol) >= dim(fromCol) &&
        (dim(toCol).isNull || facts(tsCol) < dim(toCol)),
      "left")

  /** Time-series resample: fill the daily gaps of a (key, day, value)
    * series — one row per key per calendar day between that key's first
    * and last observation — and forward-fill missing values from the most
    * recent prior day. Input must be pre-aggregated to one row per
    * (key, day); output adds `<valueCol>_filled` (the carried-forward
    * value) and `is_gap` (true on spine rows with no observation).
    *
    * Scale shape: the spine is one per-key min/max aggregate + a
    * `sequence` explode bounded by each key's day span (never the global
    * range), co-partitioned with the observations by (key, day) for the
    * left join; the forward fill is ONE running `last(ignoreNulls)`
    * window per key ordered by day — keys parallelize, and no
    * self-join-per-gap ever happens (the naive "join each gap to its
    * predecessor" is quadratic in gap length). */
  def gapFillDaily(
      df: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val spine = df.groupBy(keyCol)
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as(dayCol))
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dayCol), "left")
      .withColumn(s"${valueCol}_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
  }

  /** Trailing z-score anomaly detection over a (key, order, value)
    * series: each point is scored against the mean/stddev of its own
    * trailing `lookback` points (EXCLUDING itself — the classic
    * leave-current-out control chart, so a spike can't dilute its own
    * baseline). Emits only flagged rows: |z| ≥ `zThreshold` with at least
    * `minPrior` prior points — plus the σ = 0 degenerate case (a FLAT
    * baseline followed by any deviation is the most obvious anomaly, yet
    * its z is undefined: those rows flag with a null `zscore` instead of
    * silently passing). μ/σ are 6dp-rounded BEFORE the z division and the
    * threshold tests the rounded z — the cross-engine float contract used
    * throughout (both engines fold the ≤`lookback`-row frame in frame
    * order).
    *
    * Scale shape: ONE bounded-frame window per key — state is `lookback`
    * rows however long the series; keys parallelize. No self-join of the
    * series against its own history (the O(n·lookback) join formulation
    * this replaces). */
  def anomalyZScores(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      lookback: Int = 7,
      minPrior: Int = 4,
      zThreshold: Double = 2.0): DataFrame = {
    val win = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val scored = df.select(col(keyCol), col(orderCol), v,
      round(avg(v).over(win), 6).as("mu"),
      round(stddev_samp(v).over(win), 6).as("sigma"),
      count(v).over(win).as("_n"))
    scored
      .withColumn("zscore",
        when(col("sigma") > 0, round((v - col("mu")) / col("sigma"), 6)))
      .filter(col("_n") >= minPrior &&
        ((col("sigma") > 0 && abs(col("zscore")) >= zThreshold) ||
          (col("sigma") === 0 && v =!= col("mu"))))
      .drop("_n")
  }

  /** Sweep-line interval concurrency: given per-key intervals
    * `[startCol, endCol)` (half-open — an interval ending exactly when
    * another starts does NOT overlap it), the peak number of
    * simultaneously-open intervals per key and the earliest instant it is
    * reached: `(key, peak, peak_at)`.
    *
    * Implementation: each interval becomes a +1 delta at its start and a
    * −1 at its end; deltas are SUMMED PER (key, instant) first (so the
    * running sum advances on unique instants — no tie-order ambiguity),
    * then one running-sum window per key gives the open count just after
    * each instant, and one aggregate takes the max and its earliest time.
    *
    * Scale shape: 2 rows per interval, one shuffle on the key for the
    * window, one hash-agg — the O(n·n) "count overlapping rows via
    * self-theta-join" formulation never appears. Keys parallelize; a
    * single key's series is its event count, sorted once. */
  def maxConcurrency(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val in = df.where(col(startCol).isNotNull && col(endCol).isNotNull &&
      col(endCol) > col(startCol))
    val deltas = in.select(col(keyCol).as("_k"), col(startCol).as("_t"),
        lit(1L).as("_d"))
      .unionByName(in.select(col(keyCol).as("_k"), col(endCol).as("_t"),
        lit(-1L).as("_d")))
      .groupBy("_k", "_t").agg(sum(col("_d")).as("_d"))
    val w = Window.partitionBy("_k").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("_open", sum(col("_d")).over(w))
      .groupBy(col("_k").as(keyCol))
      .agg(max(col("_open")).as("peak"),
        min_by(col("_t"), struct(-col("_open"), col("_t"))).as("peak_at"))
  }

  /** Windowed exponentially-weighted moving average over a (key, order,
    * value) series: each point's EWMA is the decay-weighted average of
    * its trailing `lookback` points (inclusive),
    * `Σᵢ (1−α)ⁱ·x_{t−i} / Σᵢ (1−α)ⁱ` for i = 0 … min(lookback, t) − 1 —
    * pandas `ewm(alpha, adjust=True)` truncated to a bounded window, so
    * per-row state is `lookback` values, not the whole series.
    *
    * Implementation: ONE bounded-frame window collects the trailing
    * values in frame order; a single `aggregate` higher-order expression
    * folds the decay dot product — no self-join of the series against
    * its own history (the O(n·lookback) join formulation), no driver
    * iteration. The geometric denominator folds to the closed form
    * (1−(1−α)ⁿ)/α.
    *
    * Per-row state is exactly `lookback` doubles — the grain contract is
    * structural here (unlike [[holtLinear]]'s whole-series fold), so the
    * only unbounded-buffer risk is a pathological lookback: capped at
    * 10⁶ (8 MB/row) by a loud `require`. The per-key window SORT handles
    * any series length (Spark external-sorts the partition). */
  def ewma(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double,
      lookback: Int = 10): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(lookback >= 1 && lookback <= 1000000,
      "lookback must be in [1, 1e6] — the trailing frame is buffered " +
        "per row; a decay window wider than 1e6 points is an unbounded " +
        "buffer in disguise (at alpha >= 1e-5 the tail weight past 1e6 " +
        "points is < 2e-5 — truncate)")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(-(lookback - 1), 0)
    val decay = 1.0 - alpha
    // frame order is oldest→current; reverse so index 0 carries weight 1
    val num = expr(
      s"""aggregate(reverse(_vals), struct(0 AS i, CAST(0.0 AS DOUBLE) AS s),
         |  (acc, x) -> struct(acc.i + 1, acc.s + x * power($decay, acc.i)),
         |  acc -> acc.s)""".stripMargin)
    val den = (lit(1.0) - pow(lit(decay), size(col("_vals")))) / lit(alpha)
    df.withColumn("_vals",
        collect_list(col(valueCol).cast("double")).over(w))
      .withColumn("ewma", round(num / den, 6))
      .drop("_vals")
  }

  /** Daily OHLC (open/high/low/close) bars per key: for each (key, day),
    * the first and last value in (tsCol, tieCol) order plus min/max/count.
    * `tieCol` MUST be a per-row unique id — it makes first/last
    * deterministic when two rows share a timestamp (the contract
    * `asofJoinBackward` leaves to the caller, made explicit here).
    *
    * One window shuffle on (key, day) computes open (running first) and
    * close (full-frame last) in the same pass, then one hash-agg folds
    * the bar — the per-group sort is bounded by the day's row count. */
  def ohlcDaily(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val day = to_date(col(tsCol)).as("day")
    val wAll = Window.partitionBy(col(keyCol), to_date(col(tsCol)))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), day, col(valueCol).as("_v"),
        first(col(valueCol)).over(wAll).as("_open"),
        last(col(valueCol)).over(wAll).as("_close"))
      .groupBy(keyCol, "day")
      .agg(min(col("_open")).as("open"), max(col("_v")).as("high"),
        min(col("_v")).as("low"), min(col("_close")).as("close"),
        count(lit(1)).as("n"))
  }

  /** Rolling Pearson correlation between two aligned series: `df` holds
    * one row per `orderCol` tick with both series as columns; each row
    * gets `corr` over the trailing `lookback` ticks (inclusive), emitted
    * only once ≥ `minPeriods` pairs are in frame.
    *
    * The series is ONE logical sequence, so the window is unpartitioned —
    * correct only because the input is an AGGREGATED grain (e.g. one row
    * per hour), whose cardinality is calendar-bounded (10 years of hours
    * = 87k rows), not data-bounded; the heavy lifting (collapsing raw
    * events to the grain) must happen upstream where it parallelizes.
    * For per-entity rolling correlation, partition the window by the
    * entity key instead. */
  def rollingCorr(
      df: DataFrame,
      orderCol: String,
      xCol: String,
      yCol: String,
      lookback: Int = 24,
      minPeriods: Int = 12): DataFrame = {
    val w = Window.orderBy(orderCol).rowsBetween(-(lookback - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    df.withColumn("n_pairs",
        count(when(both, lit(1))).over(w))
      .withColumn("roll_corr",
        when(col("n_pairs") >= minPeriods,
          round(corr(col(xCol), col(yCol)).over(w), 6)))
      .where(col("n_pairs") >= minPeriods)
  }

  /** Cross-correlation lag scan: Pearson r between `x(t)` and
    * `y(t + lag · stepSeconds)` for every lag in [−maxLag, maxLag] —
    * "does x lead y, and by how much?" over an aligned time grid
    * (`orderCol` must be a timestamp on that grid).
    *
    * Implementation: the 2·maxLag+1 lag dimension cross-joins the grid
    * (broadcast — it is lag-count rows), then ONE equi-join realigns y
    * by shifted instant and one hash-agg per lag folds the correlation
    * moments. The join is on exact shifted timestamps, so missing grid
    * points simply drop pairs (n reports how many aligned). Series
    * grain is calendar-bounded (the rollingCorr contract); the shuffle
    * carries (instant, value) pairs only. */
  def crossCorrLags(
      df: DataFrame,
      orderCol: String,
      xCol: String,
      yCol: String,
      maxLag: Int,
      stepSeconds: Long): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val lags = df.sparkSession.range(-maxLag, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val xs = df.select(unix_timestamp(col(orderCol)).as("_tx"),
      col(xCol).as("_x"))
    val ys = df.select(unix_timestamp(col(orderCol)).as("_ty"),
      col(yCol).as("_y"))
    xs.crossJoin(broadcast(lags))
      .join(ys, col("_ty") === col("_tx") + col("lag") * lit(stepSeconds))
      .where(col("_x").isNotNull && col("_y").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        when(var_pop(col("_x")) > 0 && var_pop(col("_y")) > 0,
          round(covar_pop(col("_x"), col("_y")) /
            sqrt(var_pop(col("_x")) * var_pop(col("_y"))), 6)).as("r"))
  }

  /** CUSUM change-point detection over a (key, order, value) series —
    * the control chart that catches SUSTAINED small shifts a per-point
    * z-score never flags: standardize against the per-key baseline (the
    * first `baselineN` points), then the one-sided statistics
    * `S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − slack)` / `S⁻ₜ = max(0, S⁻ₜ₋₁ − zₜ − slack)`,
    * flagged when either crosses `threshold`.
    *
    * The textbook recursion (a max-reset per step) looks
    * window-inexpressible; it is not: with `Cₜ = Σᵢ≤ₜ(zᵢ − slack)`,
    * `S⁺ₜ = Cₜ − min(0, minⱼ≤ₜ Cⱼ)` — a running sum and a running min,
    * i.e. TWO ordered window passes per key, no recursion, no UDF
    * (ditto S⁻ with running max of `Σ(zᵢ + slack)`). Both engines fold
    * the windows in frame order over identical 6dp-rounded z inputs, so
    * the float paths agree. Keys with a zero-σ baseline are excluded
    * (their z is undefined — use [[anomalyZScores]]' σ = 0 contract for
    * flat-baseline deviation alarms). */
  def cusumChangePoints(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      baselineN: Int = 7,
      slack: Double = 0.5,
      threshold: Double = 4.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val wOrd = Window.partitionBy(keyCol).orderBy(orderCol)
    val rn = row_number().over(wOrd)
    val numbered = df.where(v.isNotNull).withColumn("_rn", rn)
    val base = numbered.where(col("_rn") <= baselineN)
      .groupBy(col(keyCol))
      .agg(round(avg(v), 6).as("_mu"),
        round(stddev_samp(v), 6).as("_sigma"))
      .where(col("_sigma") > 0)
    val prefix = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val z = round((v - col("_mu")) / col("_sigma"), 6)
    // running sums materialize as columns FIRST — a running-min OF a
    // running-sum is two window layers, not one nested expression
    val sums = numbered.join(base, keyCol)
      .withColumn("_z", z)
      .withColumn("_cpos", sum(col("_z") - lit(slack)).over(prefix))
      .withColumn("_cneg", sum(col("_z") + lit(slack)).over(prefix))
    sums
      .withColumn("s_pos", round(
        col("_cpos") - least(lit(0.0), min(col("_cpos")).over(prefix)), 6))
      .withColumn("s_neg", round(
        greatest(lit(0.0), max(col("_cneg")).over(prefix)) - col("_cneg"), 6))
      .withColumn("zscore", col("_z"))
      .withColumn("change_flag",
        col("s_pos") >= threshold || col("s_neg") >= threshold)
      .drop("_rn", "_mu", "_sigma", "_z", "_cpos", "_cneg")
  }

  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * pipeline must beat before shipping a model: per key, forecast each
    * point with the value one `season` back and with yesterday's value
    * (naive-1), score both on the SAME evaluation rows (those where both
    * forecasts exist — comparing on different row sets is the classic
    * backtest bug), and report MAE for each plus the improvement ratio.
    *
    * Two `lag` reads off ONE ordered window pass per key, one hash-agg.
    * `orderCol` rows are assumed consecutive at the series grain (gaps
    * make lag(k) reach further back in time — run
    * [[gapFillDaily]] first if that matters). */
  def seasonalNaiveBacktest(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      season: Int = 7): DataFrame = {
    val v = col(valueCol).cast("double")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val scored = df.where(v.isNotNull)
      .withColumn("_f1", lag(v, 1).over(w))
      .withColumn("_fs", lag(v, season).over(w))
      .where(col("_f1").isNotNull && col("_fs").isNotNull)
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(avg(abs(v - col("_f1"))), 6).as("mae_naive1"),
        round(avg(abs(v - col("_fs"))), 6).as("mae_seasonal"))
      .withColumn("improvement",
        when(col("mae_seasonal") > 0,
          round(col("mae_naive1") / col("mae_seasonal"), 6)))
  }

  /** Holt linear (double exponential) smoothing per key — the
    * level+trend forecaster one rung above [[ewma]] (which cannot follow
    * a trending series) and below seasonal models ([[seasonalDecompose]]
    * handles that axis). Textbook recurrence with the standard init
    * (l₁ = v₁, b₁ = v₂ − v₁):
    * `l ← α·v + (1−α)(l+b)`, `b ← β(l−l_prev) + (1−β)b`, both
    * 9dp-rounded per step ([[graft.ops.Graph.pageRank]]'s determinism
    * contract — the fold is sequential in both engines, rounding pins
    * the floats). Returns per key: n, final level/trend, the
    * `horizon`-step-ahead forecast `l + h·b`, and the in-sample
    * one-step MAE. Keys with < 2 points drop (no init possible).
    *
    * Scale shape: the recurrence is inherently sequential PER KEY, so
    * the series is collected to one array per key and folded in a single
    * codegen-adjacent `aggregate` HOF — the [[rollingCorr]] bounded-grain
    * contract (daily grain: years fit in KBs; the 100 TB table collapses
    * to that grain in one hash-agg before this op). Across keys the fold
    * is embarrassingly parallel. The grain contract is ENFORCED, not
    * assumed: any key whose series exceeds `seriesCap` points fails the
    * job loud (executor-side `assert_true`, so it triggers wherever the
    * oversized group lands) instead of silently buffering an unbounded
    * array — a raw-event table must be aggregated to its calendar grain
    * (daily: 36.5k points/century, default cap 100k) upstream. */
  def holtLinear(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      alpha: Double = 0.5,
      beta: Double = 0.3,
      horizon: Int = 7,
      seriesCap: Int = 100000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(beta >= 0 && beta <= 1, "beta must be in [0, 1]")
    require(horizon >= 1, "horizon must be >= 1")
    require(seriesCap >= 2, "seriesCap must be >= 2")
    val series = df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("_s"))
      .filter(size(col("_s")) >= 2)
      // assert_true yields null when the cap holds — the filter keeps
      // every row but cannot be pruned, so the guard always evaluates
      .filter(assert_true(size(col("_s")) <= seriesCap,
        concat(lit(s"holtLinear: a key holds > $seriesCap points — " +
          "aggregate the series to a bounded (daily/hourly) grain " +
          "upstream or raise seriesCap deliberately (key: "),
          col(keyCol).cast("string"), lit(")"))).isNull)
    // l' appears inside b's update — duplicated subexpression, same as
    // the oracle's recursive CTE spells it
    val lNext = s"round($alpha * x.v + (1 - $alpha) * (acc.l + acc.b), 9)"
    val folded = expr(
      s"""aggregate(slice(_s, 2, size(_s) - 1),
         |  struct(CAST(element_at(_s, 1).v AS DOUBLE) AS l,
         |         CAST(element_at(_s, 2).v - element_at(_s, 1).v AS DOUBLE) AS b,
         |         CAST(0.0 AS DOUBLE) AS sae, 0 AS n),
         |  (acc, x) -> struct(
         |    $lNext AS l,
         |    round($beta * ($lNext - acc.l) + (1 - $beta) * acc.b, 9) AS b,
         |    acc.sae + abs(x.v - (acc.l + acc.b)) AS sae,
         |    acc.n + 1 AS n),
         |  acc -> acc)""".stripMargin)
    series.withColumn("_f", folded)
      .select(col(keyCol), size(col("_s")).as("n"),
        round(col("_f.l"), 6).as("level"),
        round(col("_f.b"), 6).as("trend"),
        round(col("_f.l") + lit(horizon) * col("_f.b"), 6).as("forecast"),
        round(col("_f.sae") / col("_f.n"), 6).as("mae"))
  }

  /** Robust outlier flags via the modified z-score (Iglewicz–Hoaglin):
    * per key, `Mz = 0.6745 · (v − median) / MAD` with
    * `MAD = median(|v − median|)`; rows with |Mz| ≥ `threshold`
    * (default 3.5) flag — plus the MAD = 0 degenerate case (over half
    * the group identical: ANY deviation flags, with null `mz`), the
    * same contract as `anomalyZScores`' σ = 0 arm. Median/MAD are
    * 6dp-rounded BEFORE the division (the cross-engine float contract).
    *
    * Scale note: this is the EXACT interpolated-median formulation — two
    * grouped percentile aggregates, each buffering its group's values —
    * kept because it is oracle-checkable bit-for-bit. At 100 TB swap the
    * exact medians for `Sketches.histogramQuantiles` (mergeable, bounded
    * state) or `percentile_approx`; the flagging arithmetic is unchanged. */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    // Column-API percentile (not a SQL-string interpolation) so column
    // names needing backticks — dots, spaces, hyphens — work like they do
    // in the rest of the DataFrame API
    val med = df.where(v.isNotNull)
      .groupBy(col(keyCol))
      .agg(round(percentile(col(valueCol), lit(0.5)), 6).as("med"))
    val withMed = df.where(v.isNotNull).join(med, keyCol)
    val mad = withMed.groupBy(col(keyCol))
      .agg(round(percentile(abs(v - col("med")), lit(0.5)), 6).as("mad"))
    withMed.join(mad, keyCol)
      .withColumn("mz",
        when(col("mad") > 0,
          round(lit(0.6745) * (v - col("med")) / col("mad"), 6)))
      .filter((col("mad") > 0 && abs(col("mz")) >= threshold) ||
        (col("mad") === 0 && v =!= col("med")))
  }

  /** Interpolated quantile per key from a fixed-width histogram — the
    * per-key twin of [[Sketches.histogramQuantiles]]: per-key
    * min/max/count, `bins` fixed-width bins, cumulative over the ≤`bins`
    * grid, linear interpolation inside the selected bin. Mergeable
    * bounded state (bin counts), never a per-group value buffer. */
  private def histQuantile(
      df: DataFrame,
      keyCol: String,
      v: Column,
      p: Double,
      bins: Int,
      out: String): DataFrame = {
    require(p > 0 && p < 1, "p must be in (0, 1)")
    val b = df.groupBy(col(keyCol)).agg(
      min(v).cast("double").as("_lo"), max(v).cast("double").as("_hi"),
      count(v).as("_n"))
    val binned = df.select(col(keyCol), v.cast("double").as("_v"))
      .join(b, keyCol)
      .select(col(keyCol), when(col("_hi") === col("_lo"), lit(0))
        .otherwise(least(lit(bins - 1),
          floor((col("_v") - col("_lo")) /
            ((col("_hi") - col("_lo")) / bins)).cast("int"))).as("_bin"))
      .groupBy(col(keyCol), col("_bin")).agg(count(lit(1)).as("_cnt"))
    val wc = Window.partitionBy(keyCol).orderBy("_bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val sel = binned.withColumn("_cum", sum(col("_cnt")).over(wc))
      .join(b, keyCol)
      .filter(col("_cum") >= lit(p) * col("_n"))
      .groupBy(col(keyCol))
      .agg(min_by(struct(col("_bin"), col("_cnt"), col("_cum"), col("_lo"),
        col("_hi"), col("_n")), col("_bin")).as("_s"))
    sel.select(col(keyCol),
      round(when(col("_s._hi") === col("_s._lo"), col("_s._lo"))
        .otherwise(col("_s._lo") + ((col("_s._hi") - col("_s._lo")) / bins) *
          (col("_s._bin") +
            (lit(p) * col("_s._n") - (col("_s._cum") - col("_s._cnt"))) /
              col("_s._cnt"))), 6).as(out))
  }

  private def histMedian(
      df: DataFrame,
      keyCol: String,
      v: Column,
      bins: Int,
      out: String): DataFrame = histQuantile(df, keyCol, v, 0.5, bins, out)

  /** Winsorize-then-standardize per key — the robust feature-scaling
    * preprocessor: clip values to the [`pLo`, `pHi`] histogram-quantile
    * band (tails are measurement junk or whales, and a plain z-score
    * lets one whale set the scale), then z-score the CLIPPED values
    * against their own mean/σ_pop. Quantiles come from [[histQuantile]]
    * (mergeable `bins`-counter state, the 100 TB posture — never a
    * per-group sort or value buffer); mean and σ are 6dp-rounded BEFORE
    * the division (the [[madOutliers]] float contract). σ = 0 after
    * clipping (a degenerate constant band) yields null z. Appends
    * `clipped` and `z` to every input row.
    *
    * Accuracy caveat inherent to fixed-width histograms: the band edges
    * interpolate inside ONE bin of the full per-key [min, max] range, so
    * a single extreme whale widens every bin and the estimated quantile
    * can be off by up to a bin width of THAT range — still a
    * range/`bins` reduction of the whale, which is what winsorizing
    * needs, but not a tight tail quantile. Extreme-dynamic-range keys
    * should pre-clip or move to the log domain first.
    *
    * Scale shape: two bounded histogram passes + one moment aggregate,
    * all joined back BY KEY (broadcastable when keys are few, plain
    * shuffle joins otherwise); the data-scale passes are hash-aggs. */
  def winsorizedStandardize(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95,
      bins: Int = 256): DataFrame = {
    require(pLo < pHi, "pLo must be < pHi")
    val v = col(valueCol).cast("double")
    val base = df.where(v.isNotNull)
    val qs = histQuantile(base, keyCol, col(valueCol), pLo, bins, "q_lo")
      .join(histQuantile(base, keyCol, col(valueCol), pHi, bins, "q_hi"),
        keyCol)
    val clipped = base.join(qs, keyCol)
      .withColumn("clipped", least(greatest(v, col("q_lo")), col("q_hi")))
    val moments = clipped.groupBy(col(keyCol)).agg(
      round(avg(col("clipped")), 6).as("_mean"),
      round(stddev_pop(col("clipped")), 6).as("_sd"))
    clipped.join(moments, keyCol)
      .withColumn("z",
        when(col("_sd") > 0,
          round((col("clipped") - col("_mean")) / col("_sd"), 6)))
      .drop("q_lo", "q_hi", "_mean", "_sd")
  }

  /** [[madOutliers]]' 100 TB posture, realized (its scaladoc's documented
    * swap): the same Iglewicz–Hoaglin flagging arithmetic with the exact
    * per-group percentile — which buffers every group value in one
    * aggregate — replaced by [[histMedian]]'s fixed-width histogram
    * median (two passes: value median, then residual median = MAD).
    * State per key is `bins` counters, mergeable across partitions; no
    * reducer ever holds a group's raw values. Estimates are
    * bin-interpolated (within bin-width of exact; `bins` trades accuracy
    * for state) and 6dp-rounded BEFORE the division, preserving the
    * exact twin's float contract, degenerate MAD = 0 arm included. */
  def madOutliersApprox(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      bins: Int = 256,
      threshold: Double = 3.5): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val v = col(valueCol).cast("double")
    val base = df.where(v.isNotNull)
    val med = histMedian(base, keyCol, col(valueCol), bins, "med")
    val withMed = base.join(med, keyCol)
    val mad = histMedian(withMed.select(col(keyCol),
        abs(v - col("med")).as("_resid")),
      keyCol, col("_resid"), bins, "mad")
    withMed.join(mad, keyCol)
      .withColumn("mz",
        when(col("mad") > 0,
          round(lit(0.6745) * (v - col("med")) / col("mad"), 6)))
      .filter((col("mad") > 0 && abs(col("mz")) >= threshold) ||
        (col("mad") === 0 && v =!= col("med")))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * for every ordered pair of adjacent events within a key,
    * `P(next = b | current = a)` with the supporting count — the
    * behavioral model behind next-action prediction, funnel synthesis,
    * and bot detection (a near-deterministic row is a script).
    *
    * Ordering within a key is (`tsCol`, `tieCol`) — the tie column makes
    * the sequence deterministic when timestamps collide; null timestamps
    * are excluded on both engines (ASC-null placement differs between
    * engines, so they must not reach the window).
    *
    * Scale: the only data-scale move is ONE hash shuffle by key for the
    * `lead` window; adjacent pairs then collapse through a map-side-
    * combined (from, to) hash aggregate, and row-normalization runs on
    * the ≤|types|² cell grid, never the data. */
  def transitionMatrix(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val cells = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy("from_type")
    cells.withColumn("p", round(col("n") / sum(col("n")).over(wFrom), 6))
  }

  /** Classical multiplicative seasonal decomposition of a daily series
    * with weekly seasonality: `value ≈ trend · seasonal(dow) · resid`.
    * Per (key, day): trend = 7-day CENTERED moving average (null until a
    * full ±3-day frame exists — partial frames would bias the edges),
    * seasonal = the day-of-week index — mean(value/trend) per dow,
    * normalized so the 7 indices average exactly 1 — and
    * resid = value / (trend · seasonal). Input must be at the daily
    * grain, gap-free per key ([[gapFillDaily]] is the prep); all outputs
    * 6dp-rounded at each derivation step (the cross-engine float
    * contract — both engines fold the 7-row frame in frame order).
    *
    * Scale shape: the series IS the bounded grain (keys × days — a
    * 100 TB event table collapses to it in one hash-agg before this op);
    * the moving average is a per-key ordered window, the dow index one
    * ≤ keys·7-row aggregate joined back, the normalizer a 7-row window
    * over that grid. */
  def seasonalDecompose(
      df: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val wT = Window.partitionBy(keyCol).orderBy(dateCol).rowsBetween(-3, 3)
    val based = df
      .withColumn("dow", dayofweek(col(dateCol)))
      .withColumn("trend",
        when(count(v).over(wT) === 7, round(avg(v).over(wT), 6)))
    val si = based.where(col("trend") > 0)
      .groupBy(col(keyCol), col("dow"))
      .agg(round(avg(v / col("trend")), 6).as("_si_raw"))
    val wK = Window.partitionBy(keyCol)
    val siNorm = si.withColumn("seasonal",
        round(col("_si_raw") * count(lit(1)).over(wK) /
          sum(col("_si_raw")).over(wK), 6))
      .drop("_si_raw")
    based.join(siNorm, Seq(keyCol, "dow"), "left")
      .withColumn("deseason",
        when(col("seasonal") > 0, round(v / col("seasonal"), 6)))
      .withColumn("resid",
        when(col("trend") > 0 && col("seasonal") > 0,
          round(v / (col("trend") * col("seasonal")), 6)))
  }

  /** Time-constrained ordered funnel (ClickHouse `windowFunnel`
    * semantics, EXISTS form): a user reaches level k when SOME strictly
    * time-increasing chain of events matches `steps(0..k-1)` with the
    * whole chain inside `window` of its FIRST event. Unlike the
    * min-first-occurrence funnel (greedy from the user's earliest step-1
    * event — which misses chains starting later), every step-1 event is
    * a candidate chain start. Returns one row per step: (step, step_name,
    * n_users) with n_users = users reaching ≥ that level — monotone
    * non-increasing.
    *
    * Correctness: for a FIXED start t0, taking the earliest feasible
    * event at each level is optimal (an earlier prefix completion only
    * widens later choices), so min-per-(user, t0) frontiers decide
    * existence exactly. Scale shape: per level, one range join of that
    * step's events onto the (user, t0, frontier-ts) table — both sides
    * hash-partition on user, candidates bounded by per-user activity
    * (events-per-user × starts-per-user, the sessionized-data shape),
    * then a min-aggregate collapses back to ≤ one row per (user, t0).
    * Never a k-way self-join. */
  def windowFunnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      window: Column): DataFrame = {
    require(steps.size >= 2, "need >= 2 steps")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val ev = df.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    // each frontier feeds TWO consumers (the next level's join and its
    // own level count): materialize per level or the recompute doubles
    // per step (the Graph.hits lesson)
    var frontier = ev.filter(col("et") === steps.head)
      .select(col("u"), col("ts").as("t0"), col("ts").as("l"))
      .localCheckpoint(false)
    // a GLOBAL count-distinct per level (not a grouped one): a level no
    // user reaches still emits its row with n_users = 0
    def levelRow(i: Int, st: String, f: DataFrame): DataFrame =
      f.agg(count_distinct(col("u")).as("n_users"))
        .select(lit(i).as("step"), lit(st).as("step_name"), col("n_users"))
    var levels = levelRow(1, steps.head, frontier)
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      frontier = ev.filter(col("et") === st).as("e")
        .join(frontier.as("f"),
          col("e.u") === col("f.u") && col("e.ts") > col("f.l") &&
            col("e.ts") <= col("f.t0") + window)
        .groupBy(col("f.u").as("u"), col("f.t0").as("t0"))
        .agg(min(col("e.ts")).as("l"))
        .localCheckpoint(false)
      levels = levels.unionByName(levelRow(i + 1, st, frontier))
    }
    levels
  }
}
