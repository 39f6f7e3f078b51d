package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the round-4 analytic additions: market-basket
  * association, sweep-line concurrency, windowed EWMA, χ² independence,
  * WOE/IV binning, OHLC bars, rolling correlation. */
class AssociationStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ───── copurchaseStats ─────

  test("copurchaseStats: counts, support, confidence, lift on a known basket set") {
    // baskets: {A,B}, {A,B,C}, {A,C}, {B} → N=4
    val df = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (2, "C"),
      (3, "A"), (3, "C"), (4, "B")).toDF("bk", "it")
    val got = Association.copurchaseStats(df, "bk", "it", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // AB in 2 of 4 baskets; n_A=3, n_B=3 → lift = 2·4/(3·3)
    assert(got(("A", "B")) == ((2L, 3L, 3L, 0.5, 0.666667, 0.888889)))
    // AC in 2; n_C=2 → conf 2/3, lift 2·4/(3·2)
    assert(got(("A", "C")) == ((2L, 3L, 2L, 0.5, 0.666667, 1.333333)))
    // BC co-occurs once only → filtered by minPairCount=2
    assert(!got.contains(("B", "C")))
  }

  test("copurchaseStats: duplicate basket rows don't inflate counts; cap drops mega-baskets") {
    val df = Seq((1, "A"), (1, "A"), (1, "B"), // dup (1,A)
      (2, "A"), (2, "B"), (2, "C")).toDF("bk", "it")
    val uncapped = Association.copurchaseStats(df, "bk", "it", minPairCount = 1)
    assert(uncapped.filter(col("item_a") === "A" && col("item_b") === "B")
      .select("n_ab").as[Long].head() == 2L) // dup collapsed, both baskets count
    // cap=2 drops basket 2 (3 items); N, margins, and pairs all shrink
    val capped = Association.copurchaseStats(df, "bk", "it", minPairCount = 1,
      maxBasketSize = Some(2))
    val ab = capped.filter(col("item_a") === "A" && col("item_b") === "B").head()
    assert(ab.getAs[Long]("n_ab") == 1L && ab.getAs[Long]("n_a") == 1L)
    assert(capped.count() == 1) // only the {A,B} pair of basket 1 survives
  }

  // ───── maxConcurrency ─────

  test("maxConcurrency: peak open intervals per key, half-open semantics") {
    val df = Seq(
      ("k1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("k1", ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")),
      ("k1", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // starts as #1 ends
      ("k2", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("k", "s", "e")
    val got = Temporal.maxConcurrency(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getTimestamp(2))).toMap
    // k1: at 10:30 two open; at 11:00 the first closes exactly as the third
    // opens (half-open ⇒ still 2); peak first reached at 10:30
    assert(got("k1") == ((2L, ts("2024-01-01 10:30:00"))))
    assert(got("k2") == ((1L, ts("2024-01-01 10:00:00"))))
  }

  test("maxConcurrency drops null and empty/inverted intervals") {
    val df = Seq(
      ("k", Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 10:00:00"))), // empty
      ("k", Some(ts("2024-01-01 10:00:00")), None), // open-ended → dropped
      ("k", Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))))
      .toDF("k", "s", "e")
    val got = Temporal.maxConcurrency(df, "k", "s", "e").collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
  }

  // ───── ewma ─────

  test("ewma: adjust=True weighted average over the trailing window") {
    val df = Seq(("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0))
      .toDF("k", "t", "v")
    val got = Temporal.ewma(df, "k", "t", "v", alpha = 0.5, lookback = 2)
      .orderBy("t").select("ewma").as[Double].collect()
    assert(got(0) == 10.0) // single point = itself
    // (20 + 10·0.5)/(1 + 0.5) = 16.666667; (30 + 20·0.5)/1.5 = 26.666667
    assert(got(1) == 16.666667 && got(2) == 26.666667)
  }

  test("ewma: lookback bounds the memory — old points fall out of frame") {
    val df = Seq(("k", 1, 1000.0), ("k", 2, 1.0), ("k", 3, 1.0)).toDF("k", "t", "v")
    val got = Temporal.ewma(df, "k", "t", "v", alpha = 0.5, lookback = 2)
      .orderBy("t").select("ewma").as[Double].collect()
    assert(got(2) == 1.0) // the 1000 spike is out of the 2-row frame
  }

  // ───── chiSquareIndependence ─────

  test("chiSquare: independent columns give chi2 ≈ 0, dof matches") {
    // perfectly independent 2×2: every cell = 25
    val rows = for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25)
      yield (a, b)
    val got = Models.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
    val first = got.head()
    assert(first.getAs[Double]("chi2") == 0.0)
    assert(first.getAs[Long]("dof") == 1L)
    assert(got.count() == 4)
    assert(got.select("expected").as[Double].collect().forall(_ == 25.0))
  }

  test("chiSquare: perfectly dependent columns give chi2 = N, zero cells emitted") {
    // a==b always: chi2 of a 2×2 diagonal = N — HALF the mass sits in the
    // never-observed off-diagonal cells, which must appear in the grid
    val rows = Seq.fill(30)(("x", "x")) ++ Seq.fill(30)(("y", "y"))
    val got = Models.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
    assert(got.count() == 4) // full grid, not just the 2 observed cells
    assert(got.head().getAs[Double]("chi2") == 60.0)
    val offDiag = got.filter(col("a") =!= col("b")).collect()
    assert(offDiag.forall(r =>
      r.getAs[Long]("observed") == 0L && r.getAs[Double]("expected") == 15.0))
  }

  // ───── woeIv ─────

  test("woeIv: monotone feature→label gives positive-woe high bins, negative low") {
    val rows = (0 until 100).map(i => (i.toDouble, i >= 50))
    val got = Models.woeIv(rows.toDF("f", "y"), "f", "y", nBins = 2)
      .orderBy("bin").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("woe") < 0 && got(1).getAs[Double]("woe") > 0)
    assert(got(0).getAs[Long]("n") == 50L && got(0).getAs[Long]("n_pos") == 0L)
    // smoothing keeps the empty-side bins finite
    assert(!got(0).getAs[Double]("woe").isInfinite)
    val iv = got(0).getAs[Double]("iv")
    assert(iv > 0 && got(1).getAs[Double]("iv") == iv) // total repeated per row
  }

  test("woeIv: constant feature collapses to one bin with woe ≈ 0") {
    val rows = Seq((5.0, true), (5.0, false), (5.0, true))
    val got = Models.woeIv(rows.toDF("f", "y"), "f", "y", nBins = 10).collect()
    assert(got.length == 1 && got(0).getAs[Int]("bin") == 0)
  }

  // ───── ohlcDaily ─────

  test("ohlcDaily: open/close by time with unique-id tiebreak") {
    val df = Seq(
      (1L, "k", ts("2024-01-01 09:00:00"), 10.0),
      (2L, "k", ts("2024-01-01 12:00:00"), 99.0),
      (3L, "k", ts("2024-01-01 17:00:00"), 7.0),
      (4L, "k", ts("2024-01-01 17:00:00"), 20.0), // same ts as id=3: id orders
      (5L, "k", ts("2024-01-02 09:00:00"), 1.0))
      .toDF("id", "k", "t", "v")
    val got = Temporal.ohlcDaily(df, "k", "t", "v", tieCol = "id")
      .orderBy("day").collect()
    assert(got.length == 2)
    val d1 = got(0)
    assert(d1.getAs[Double]("open") == 10.0 && d1.getAs[Double]("close") == 20.0)
    assert(d1.getAs[Double]("high") == 99.0 && d1.getAs[Double]("low") == 7.0)
    assert(d1.getAs[Long]("n") == 4L)
    assert(got(1).getAs[Double]("open") == 1.0 && got(1).getAs[Double]("close") == 1.0)
  }

  // ───── rollingCorr ─────

  test("rollingCorr: perfectly linear pair gives r = 1, minPeriods gates output") {
    val df = (1 to 10).map(i => (i, i.toDouble, 2.0 * i + 1)).toDF("t", "x", "y")
    val got = Temporal.rollingCorr(df, "t", "x", "y", lookback = 5, minPeriods = 3)
    assert(got.count() == 8) // first 2 rows lack 3 pairs
    assert(got.select("roll_corr").as[Double].collect().forall(_ == 1.0))
  }

  test("rollingCorr: null rows don't count toward minPeriods") {
    val df = Seq((1, Some(1.0), Some(1.0)), (2, None, Some(2.0)),
      (3, Some(3.0), Some(2.0)), (4, Some(4.0), Some(5.0)))
      .toDF("t", "x", "y")
    val got = Temporal.rollingCorr(df, "t", "x", "y", lookback = 4, minPeriods = 3)
    assert(got.count() == 1) // only t=4 has 3 non-null pairs in frame
  }
}
