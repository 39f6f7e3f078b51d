package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the survival/robust-stats additions: Kaplan–Meier,
  * cross-correlation lag scan, Benford audit, MAD outliers. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  // ───── kaplanMeier ─────

  test("kaplanMeier: textbook small cohort") {
    // durations (event): 1(y) 2(y) 2(n) 3(y) 4(n)
    val df = Seq((1, true), (2, true), (2, false), (3, true), (4, false))
      .toDF("dur", "ev")
    val got = Models.kaplanMeier(df, "dur", "ev").orderBy("t")
      .select("t", "n_subjects", "d", "n_risk", "survival")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // t=1: n=5, d=1 → 0.8; t=2: n=4, d=1 → 0.8·0.75 = 0.6
    // t=3: n=2, d=1 → 0.3; t=4: n=1, d=0 → 0.3
    assert(got.toSeq == Seq((1, 1L, 1L, 5L, 0.8), (2, 2L, 1L, 4L, 0.6),
      (3, 1L, 1L, 2L, 0.3), (4, 1L, 0L, 1L, 0.3)))
  }

  test("kaplanMeier: total wipeout pins survival to exactly 0, not null") {
    // at t=2 every remaining subject churns → S=0 from there on
    val df = Seq((1, false), (2, true), (2, true)).toDF("dur", "ev")
    val got = Models.kaplanMeier(df, "dur", "ev").orderBy("t")
      .select("survival").as[Double].collect()
    assert(got(0) == 1.0) // t=1 censored only
    assert(got(1) == 0.0) // d = n_risk
  }

  // ───── crossCorrLags ─────

  test("crossCorrLags: shifted copy peaks at its lag with r = 1") {
    // y(t) = x(t − 2h): x leads y by 2 hours → corr(x(t), y(t+2h)) = 1
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val xs = (0 until 24).map(i => i.toDouble * 3 % 7) // aperiodic-ish
    val rows = (0 until 24).map { i =>
      val y = if (i >= 2) Some(xs(i - 2)) else None
      (new Timestamp(base + i * 3600L * 1000), Some(xs(i)), y)
    }
    val df = rows.toDF("hr", "x", "y")
    val res = Temporal.crossCorrLags(df, "hr", "x", "y", maxLag = 3,
      stepSeconds = 3600L)
    val byLag = res.collect()
      .map(r => r.getInt(0) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(byLag(2) == Some(1.0)) // y two hours later matches x exactly
    assert(byLag.keySet == (-3 to 3).toSet)
    assert(byLag(0).exists(_ < 1.0))
  }

  test("crossCorrLags: constant series yields null r, pair counts honest") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = (0 until 10)
      .map(i => (new Timestamp(base + i * 3600L * 1000), 5.0, i.toDouble))
      .toDF("hr", "x", "y")
    val got = Temporal.crossCorrLags(df, "hr", "x", "y", maxLag = 1,
      stepSeconds = 3600L).orderBy("lag").collect()
    assert(got.forall(_.isNullAt(2))) // var_pop(x) = 0 everywhere
    assert(got.map(_.getLong(1)).toSeq == Seq(9L, 10L, 9L))
  }

  // ───── benfordAudit ─────

  test("benfordAudit: digits from decimal, scientific, and sub-1 renderings") {
    val df = Seq(123.0, 1.5e8, 0.00072, -456.0, 9.0, 0.0).toDF("v")
    val got = Profile.benfordAudit(df, "v")
      .select("digit", "n").as[(Int, Long)].collect().toMap
    // 123→1, 1.5e8→1, 0.00072→7, -456→4, 9→9; 0 excluded
    assert(got == Map(1 -> 2L, 7 -> 1L, 4 -> 1L, 9 -> 1L))
  }

  test("benfordAudit: shares sum to 1 and expected shares are Benford") {
    val df = (1 to 900).map(_.toDouble).toDF("v")
    val rows = Profile.benfordAudit(df, "v").collect()
    // each of the 9 shares is 6dp-rounded → up to 9·5e-7 drift
    val shareSum = rows.map(_.getAs[Double]("obs_share")).sum
    assert(math.abs(shareSum - 1.0) < 5e-6)
    val b1 = rows.find(_.getAs[Int]("digit") == 1).get
    assert(b1.getAs[Double]("benford_share") == 0.30103)
  }

  // ───── madOutliers ─────

  test("madOutliers: a far point flags, the bulk doesn't") {
    val vals = Seq.tabulate(20)(i => ("k", 10.0 + (i % 5))) :+ (("k", 1000.0))
    val df = vals.zipWithIndex.map { case ((k, v), i) => (i, k, v) }
      .toDF("id", "k", "v")
    val got = Temporal.madOutliers(df, "k", "v").collect()
    assert(got.length == 1 && got(0).getAs[Double]("v") == 1000.0)
    assert(got(0).getAs[Double]("mz") > 3.5)
  }

  test("madOutliers: MAD = 0 group — any deviation flags with null mz") {
    val df = Seq((1, "k", 5.0), (2, "k", 5.0), (3, "k", 5.0), (4, "k", 7.0))
      .toDF("id", "k", "v")
    val got = Temporal.madOutliers(df, "k", "v").collect()
    assert(got.length == 1 && got(0).getAs[Double]("v") == 7.0)
    assert(got(0).isNullAt(got(0).fieldIndex("mz")))
  }

  // ───── cusumChangePoints ─────

  test("cusum: sustained small shift accumulates to a flag a z-test misses") {
    // baseline ~N(10, 1)-ish deterministic wiggle, then a +1.5σ step:
    // each post-shift z is ~1.5 (never anomalous alone), CUSUM piles up
    val vals = (1 to 10).map(i => 10.0 + (i % 3) - 1) ++ // 9,10,11 wiggle
      (11 to 20).map(_ => 12.5)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "t", "v")
    val got = Temporal.cusumChangePoints(df, "k", "t", "v", baselineN = 10,
      slack = 0.5, threshold = 4.0).orderBy("t").collect()
    assert(got.length == 20)
    // pre-shift rows never flag; the shift flags within a few points
    assert(got.take(10).forall(!_.getAs[Boolean]("change_flag")))
    assert(got.drop(12).exists(_.getAs[Boolean]("change_flag")))
    // s_pos is monotone nondecreasing through the sustained shift
    val sPos = got.drop(10).map(_.getAs[Double]("s_pos"))
    assert(sPos.zip(sPos.tail).forall { case (a, b) => b >= a })
  }

  test("cusum: downward shifts drive s_neg, zero-sigma baselines drop out") {
    val shifted = ((1 to 6).map(i => ("k", i, 10.0 + (i % 3) - 1)) ++
      (7 to 14).map(i => ("k", i, 7.0))) ++
      (1 to 14).map(i => ("flat", i, 5.0)) // σ = 0 baseline
    val got = Temporal.cusumChangePoints(shifted.toDF("k", "t", "v"),
      "k", "t", "v", baselineN = 6, slack = 0.5, threshold = 4.0)
    assert(got.filter(col("k") === "flat").count() == 0)
    val last = got.filter(col("k") === "k").orderBy(col("t").desc).head()
    assert(last.getAs[Double]("s_neg") > 4.0)
    assert(last.getAs[Boolean]("change_flag"))
  }

  // ───── seasonalNaiveBacktest ─────

  test("backtest: a perfectly weekly series gives seasonal MAE 0, naive-1 > 0") {
    val df = (0 until 28).map(i => ("k", i, (i % 7).toDouble + 1))
      .toDF("k", "t", "v")
    val r = Temporal.seasonalNaiveBacktest(df, "k", "t", "v", season = 7).head()
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mae_naive1") > 0)
    assert(r.isNullAt(r.fieldIndex("improvement"))) // 0 denominator → null
    assert(r.getAs[Long]("n") == 21L) // both lags defined from row 8 on
  }

  test("backtest: both forecasts score on the same evaluation rows") {
    // 10 points: lag7 defined for rows 8..10 only — n must be 3, and
    // mae_naive1 must be computed over those SAME 3 rows
    val df = (0 until 10).map(i => ("k", i, if (i == 1) 100.0 else 1.0))
      .toDF("k", "t", "v")
    val r = Temporal.seasonalNaiveBacktest(df, "k", "t", "v", season = 7).head()
    assert(r.getAs[Long]("n") == 3L)
    // the i=1 spike affects lag1 at i=2 ONLY — outside the eval rows, so
    // naive-1 MAE stays 0 (all constant in the eval window)
    assert(r.getAs[Double]("mae_naive1") == 0.0)
  }
}
