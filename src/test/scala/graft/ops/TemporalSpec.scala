package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoinBackward: latest right at or before each left time, per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // after r@09:00 -> 9.0
      (2L, "u1", ts("2024-01-01 12:00:00")), // equal-time r@12:00 -> 12.0 (inclusive)
      (3L, "u1", ts("2024-01-01 08:00:00")), // before any right -> null
      (4L, "u2", ts("2024-01-01 10:00:00")), // other key, r@07:00 -> 7.0
      (5L, "u3", ts("2024-01-01 10:00:00"))) // key with no right rows -> null
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 9.0),
      ("u1", ts("2024-01-01 12:00:00"), 12.0),
      ("u2", ts("2024-01-01 07:00:00"), 7.0))
      .toDF("k", "rt", "pay")
    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "t", "rt", Seq("pay"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(1L -> Some(9.0), 2L -> Some(12.0), 3L -> None,
      4L -> Some(7.0), 5L -> None))
  }

  test("asofJoinForward: earliest right at or after each left time, per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // next right @12:00 -> 12.0
      (2L, "u1", ts("2024-01-01 12:00:00")), // equal-time -> 12.0 (inclusive)
      (3L, "u1", ts("2024-01-01 13:00:00")), // after all rights -> null
      (4L, "u2", ts("2024-01-01 06:00:00")), // other key, r@07:00 -> 7.0
      (5L, "u3", ts("2024-01-01 10:00:00"))) // key with no right rows -> null
      .toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 9.0),
      ("u1", ts("2024-01-01 12:00:00"), 12.0),
      ("u2", ts("2024-01-01 07:00:00"), 7.0))
      .toDF("k", "rt", "pay")
    val got = Temporal.asofJoinForward(left, right, Seq("k"), "t", "rt", Seq("pay"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(1L -> Some(12.0), 2L -> Some(12.0), 3L -> None,
      4L -> Some(7.0), 5L -> None))
  }

  test("asofJoinBackward keeps every left row exactly once") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t") // dup times
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "pay")
    val got = Temporal.asofJoinBackward(left, right, Seq("k"), "t", "rt", Seq("pay"))
    assert(got.count() == 2)
    assert(got.filter(col("pay") === 1.0).count() == 2)
  }

  test("asofJoinBackward rejects left columns colliding with payload or internal tags") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"), 0.0)).toDF("id", "k", "t", "pay")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "pay")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoinBackward(left, right, Seq("k"), "t", "rt", Seq("pay"))
    }
    assert(e.getMessage.contains("pay"))
    val left2 = Seq((1L, "u1", ts("2024-01-01 10:00:00"), 0)).toDF("id", "k", "t", "_side")
    intercept[IllegalArgumentException] {
      Temporal.asofJoinBackward(left2, right, Seq("k"), "t", "rt", Seq("pay"))
    }
  }

  test("rangeJoinBinned equals the naive theta join on half-open intervals") {
    // deterministic pseudo-random points/intervals spanning many bins
    val points = (1 to 400).map { i =>
      (i.toLong, s"u${i % 5}", ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"))
    }.toDF("pid", "k", "t")
    val intervals = (1 to 60).map { j =>
      val st = ts(f"2024-01-01 ${(j * 5) % 24}%02d:${(j * 13) % 60}%02d:00")
      (s"u${j % 5}", st, new Timestamp(st.getTime + (j % 4 + 1) * 45 * 60 * 1000L))
    }.toDF("k", "lo", "hi")
    val binned = Temporal.rangeJoinBinned(points, intervals, Seq("k"), "t", "lo", "hi", 1800)
      .select("pid", "k", "lo", "hi")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("pid", "k", "lo", "hi")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // boundary semantics: a point at lo matches, a point at hi does not
    val p2 = Seq((1L, "x", ts("2024-01-01 10:00:00")),
      (2L, "x", ts("2024-01-01 11:00:00"))).toDF("pid", "k", "t")
    val i2 = Seq(("x", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("k", "lo", "hi")
    val hits = Temporal.rangeJoinBinned(p2, i2, Seq("k"), "t", "lo", "hi", 3600)
      .select("pid").as[Long].collect().toSeq
    assert(hits == Seq(1L))
  }

  test("pointInTimeJoin: facts pick the version covering their date; pre-validity -> null") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (1L, "old", d("2020-01-01"), d("2021-01-01")),
      (1L, "new", d("2021-01-01"), null.asInstanceOf[java.sql.Date]),
      (2L, "only", d("2020-06-01"), null.asInstanceOf[java.sql.Date])
    ).toDF("k", "attr", "vf", "vt")
    val facts = Seq(
      (10L, 1L, d("2020-05-05")), // in [2020, 2021) -> old
      (11L, 1L, d("2021-01-01")), // boundary: from is inclusive -> new
      (12L, 1L, d("2019-12-31")), // before every version -> null
      (13L, 2L, d("2022-02-02"))  // open row -> only
    ).toDF("fid", "fk", "ts")
    val got = Temporal.pointInTimeJoin(facts, dim, "fk", "k", "ts", "vf", "vt")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("attr"))).toMap
    assert(got == Map(10L -> Some("old"), 11L -> Some("new"),
      12L -> None, 13L -> Some("only")))
    // every fact survives exactly once (validity intervals don't overlap)
    assert(Temporal.pointInTimeJoin(facts, dim, "fk", "k", "ts", "vf", "vt").count() == 4)
  }

  test("gapFillDaily: per-key spine, forward fill, leading gap stays null") {
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    val obs = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0), // 2 gap days between
      ("b", d("2024-01-10"), 9.0)  // single-day key: no spine growth
    ).toDF("k", "day", "v")
    val got = Temporal.gapFillDaily(obs, "k", "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((Option(r.get(2)), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.size == 5, s"a spans 4 days + b spans 1: $got")
    assert(got(("a", "2024-01-01")) == ((Some(1.0), 1.0, false)))
    assert(got(("a", "2024-01-02")) == ((None, 1.0, true)))
    assert(got(("a", "2024-01-03")) == ((None, 1.0, true)))
    assert(got(("a", "2024-01-04")) == ((Some(4.0), 4.0, false)))
    assert(got(("b", "2024-01-10")) == ((Some(9.0), 9.0, false)))
    // keys never bleed into each other's date ranges
    assert(!got.contains(("b", "2024-01-01")))
  }

  test("anomalyZScores: spike flagged against its own trailing baseline only") {
    import java.sql.Date
    val d = (i: Int) => Date.valueOf(f"2024-01-$i%02d")
    // key a: flat 10s then a spike; key b: flat — never flagged
    val rows = (1 to 8).map(i => ("a", d(i), 10.0)) ++
      Seq(("a", d(9), 100.0)) ++
      (10 to 12).map(i => ("a", d(i), 10.0)) ++
      (1 to 9).map(i => ("b", d(i), 5.0))
    val df = rows.toDF("k", "day", "v")
    val got = Temporal.anomalyZScores(df, "k", "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    // the spike over a FLAT baseline is the σ = 0 degenerate flag (null
    // z); post-spike 10s are NOT flagged — one spike in the trailing
    // window inflates σ so much that |z| < 2 (the control-chart blind
    // spot, deliberate). Key b is flat (v == μ) and never flags.
    assert(got.toSeq == Seq(("a", "2024-01-09", None)), got.mkString(","))
  }

  test("anomalyZScores: fewer than minPrior points never flags") {
    import java.sql.Date
    val df = Seq(
      ("k", Date.valueOf("2024-01-01"), 1.0),
      ("k", Date.valueOf("2024-01-02"), 1.0),
      ("k", Date.valueOf("2024-01-03"), 100.0)).toDF("k", "day", "v")
    assert(Temporal.anomalyZScores(df, "k", "day", "v").count() == 0)
  }

  test("transitionMatrix: adjacent-pair counts and row-normalized probabilities") {
    val df = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "A", 1L),
      ("u1", ts("2024-01-01 10:01:00"), "B", 2L),
      ("u1", ts("2024-01-01 10:02:00"), "A", 3L),
      ("u1", ts("2024-01-01 10:03:00"), "B", 4L),
      ("u2", ts("2024-01-01 09:00:00"), "A", 5L),
      ("u2", ts("2024-01-01 09:05:00"), "A", 6L))
      .toDF("u", "t", "e", "id")
    val got = Temporal.transitionMatrix(df, "u", "t", "e", "id")
      .orderBy("from_type", "to_type").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("A", "A") -> ((1L, 0.333333)),
      ("A", "B") -> ((2L, 0.666667)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("transitionMatrix: equal timestamps order by the tie column, deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq(("u", t0, "X", 2L), ("u", t0, "Y", 1L), ("u", t0, "Z", 3L))
      .toDF("u", "t", "e", "id")
    // tie order by id: Y -> X -> Z
    val got = Temporal.transitionMatrix(df, "u", "t", "e", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("Y", "X"), ("X", "Z")))
  }

  test("seasonalDecompose: trend needs a full 7-day frame; indices mean 1") {
    // 21 contiguous days, value = dow-dependent pattern × flat level
    val days = (0 until 21).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val dow = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
        .getDayOfWeek.getValue % 7 + 1 // Spark convention: 1=Sunday
      ("k", d, 100.0 * (if (dow == 1) 2.0 else 1.0))
    }
    val df = days.toDF("k", "day", "v")
    val got = Temporal.seasonalDecompose(df, "k", "day", "v")
      .select("day", "trend", "seasonal", "resid")
      .collect().map(r => r.getDate(0).toString ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // first/last 3 days: no full centered frame -> null trend and resid
    assert(got("2024-01-01")._1.isEmpty && got("2024-01-21")._1.isEmpty)
    // interior: trend = (6*100 + 200)/7 for every full frame
    val t = math.rint(800.0 / 7 * 1e6) / 1e6
    assert(got("2024-01-10")._1.contains(t), got("2024-01-10").toString)
    // seasonal indices present for all rows and average to 1 across dows
    val sis = Temporal.seasonalDecompose(df, "k", "day", "v")
      .select("dow", "seasonal").distinct()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sis.size == 7)
    assert(math.abs(sis.values.sum / 7 - 1.0) < 1e-5, sis.toString)
    // Sunday's index ~2x a weekday's
    assert(sis(1) / sis(2) > 1.8, sis.toString)
    // residual of an interior day: v / (trend * seasonal), 6dp
    val r10 = got("2024-01-10")
    val expect = math.rint(100.0 / (r10._1.get * r10._2.get) * 1e6) / 1e6
    assert(r10._3.contains(expect), r10.toString)
  }

  test("winsorizedStandardize: tails clip to the quantile band, z-scores the clipped") {
    // 100 uniform values 1..100 + two 100x whales per key — a range the
    // 4096-bin histogram resolves (bin width ~5; the scaladoc caveat
    // covers the extreme-dynamic-range case where it cannot)
    val rows = (1 to 100).map(i => (i.toLong, "k", i.toDouble)) ++
      Seq((101L, "k", 1e4), (102L, "k", -1e4))
    val df = rows.toDF("id", "k", "v")
    val got = Temporal.winsorizedStandardize(df, "k", "v",
        pLo = 0.05, pHi = 0.95, bins = 4096)
      .select("id", "clipped", "z")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val clips = got.values.map(_._1)
    // whales are pinned to the band edges; band sits near the true
    // p05/p95 (within ~2 of the 4.88-unit bin width)
    assert(got(101L)._1 == clips.max && got(102L)._1 == clips.min)
    assert(clips.max < 110 && clips.min > -15, s"${clips.min}..${clips.max}")
    // interior mid-point survives untouched
    assert(got(50L)._1 == 50.0)
    // z of the clipped frame is mean-centered and every z is tame (an
    // unclipped z-score would put the whales at ~±7 and squash the rest)
    val zs = got.values.flatMap(_._2)
    assert(math.abs(zs.sum / zs.size) < 1e-3, zs.sum.toString)
    assert(zs.forall(z => math.abs(z) < 4), s"${zs.min}..${zs.max}")
    // all-identical values per key: sd = 0 -> null z, clipped = value
    val const = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0))
      .toDF("id", "k", "v")
    val cg = Temporal.winsorizedStandardize(const, "k", "v")
      .select("clipped", "z").collect()
    assert(cg.forall(r => r.getDouble(0) == 5.0 && r.get(1) == null))
  }

  test("madOutliersApprox: flags agree with the exact twin on separated data") {
    // per key: 100 values tightly clustered + 2 extreme outliers — any
    // sane median/MAD estimate flags exactly the outliers
    val rows = for {
      k <- Seq("a", "b"); i <- 1 to 102
    } yield {
      val base = if (k == "a") 100.0 else 500.0
      val v = if (i <= 100) base + (i % 10) else base * 50 * i
      (s"$k$i", k, v)
    }
    val df = rows.toDF("id", "k", "v")
    def flagged(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getString(0)).toSet
    val exact = flagged(Temporal.madOutliers(df, "k", "v"))
    val approx = flagged(Temporal.madOutliersApprox(df, "k", "v", bins = 256))
    assert(exact == approx, s"exact $exact vs approx $approx")
    assert(exact == Set("a101", "a102", "b101", "b102"), exact.toString)
    // estimates are within a bin width of the exact median
    val medEx = Temporal.madOutliers(df, "k", "v")
      .select("k", "med").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val medAp = Temporal.madOutliersApprox(df, "k", "v", bins = 256)
      .select("k", "med").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    medEx.foreach { case (k, m) =>
      val binW = (if (k == "a") 100.0 * 50 * 102 - 100.0
                  else 500.0 * 50 * 102 - 500.0) / 256
      assert(math.abs(medAp(k) - m) <= binW, s"$k: ${medAp(k)} vs $m")
    }
    // degenerate: all-identical values -> MAD 0, nothing flags
    val const = Seq(("c1", "c", 7.0), ("c2", "c", 7.0)).toDF("id", "k", "v")
    assert(Temporal.madOutliersApprox(const, "k", "v").count() == 0)
  }

  test("holtLinear: textbook recurrence, hand-computed; <2 points drop") {
    def d(i: Int) = java.sql.Date.valueOf(f"2024-01-${i}%02d")
    // linear series 10, 12, 14, 16: Holt locks on, trend -> 2, MAE -> 0
    val lin = (1 to 4).map(i => ("lin", d(i), 8.0 + 2 * i))
    val single = Seq(("one", d(1), 5.0))
    val df = (lin ++ single).toDF("k", "day", "v")
    val got = Temporal.holtLinear(df, "k", "day", "v",
        alpha = 0.5, beta = 0.3, horizon = 7)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(!got.contains("one")) // no init from a single point
    // hand-rolled: l1=10 b1=2; each step forecast is exact -> errors 0,
    // l tracks v exactly, b stays 2
    val (n, level, trend, fc, mae) = got("lin")
    assert(n == 4 && level == 16.0 && trend == 2.0, got.toString)
    assert(fc == 16.0 + 7 * 2.0 && mae == 0.0, got.toString)
    // a non-trivial fold: deviate one point and check one step by hand
    val df2 = Seq(("k", d(1), 10.0), ("k", d(2), 12.0), ("k", d(3), 20.0))
      .toDF("k", "day", "v")
    val g2 = Temporal.holtLinear(df2, "k", "day", "v", 0.5, 0.3, 1)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(5)))
      .head
    // step v2: l=12 b=2 err 0; step v3: f=14, e=6, l'=0.5*20+0.5*14=17,
    // b'=0.3*(17-12)+0.7*2=2.9; mae=(0+6)/2=3
    assert(g2 == ((17.0, 2.9, 3.0)), g2.toString)
  }

  test("holtLinear/ewma: bounded-grain contract fails loud past the cap") {
    def d(i: Int) = java.sql.Date.valueOf("2024-01-01").toLocalDate
      .plusDays(i.toLong)
    // 12 points against a cap of 10: the executor-side guard must fire
    val over = (1 to 12).map(i => ("k", java.sql.Date.valueOf(d(i)), i.toDouble))
      .toDF("k", "day", "v")
    val e = intercept[Exception] {
      Temporal.holtLinear(over, "k", "day", "v", seriesCap = 10).collect()
    }
    def rootChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(rootChain(e).exists(_.contains("bounded (daily/hourly) grain")),
      rootChain(e).mkString(" | "))
    // at the cap exactly: passes, values identical to the unguarded run
    val ok = Temporal.holtLinear(over, "k", "day", "v", seriesCap = 12)
    val base = Temporal.holtLinear(over, "k", "day", "v")
    assert(ok.collect().toSeq == base.collect().toSeq)
    // ewma's structural cap is driver-side: a > 1e6 lookback is rejected
    val e2 = intercept[IllegalArgumentException] {
      Temporal.ewma(over, "k", "day", "v", alpha = 0.3, lookback = 1000001)
    }
    assert(e2.getMessage.contains("unbounded buffer"))
  }

  test("windowFunnel: exists-semantics catches late chains greedy-min misses") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: early view, click 3h later (outside 2h) — but a SECOND view
      // 10:30 starts a chain that completes: exists-semantics level 3
      (1L, ts("2024-01-01 08:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 11:30:00"), "purchase"),
      // u2: full chain but purchase breaches the 2h window of its start
      (2L, ts("2024-01-01 08:00:00"), "view"),
      (2L, ts("2024-01-01 08:30:00"), "click"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      // u3: click before view only — never reaches level 2
      (3L, ts("2024-01-01 07:00:00"), "click"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      // u4: no step-1 event at all
      (4L, ts("2024-01-01 08:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.windowFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        expr("INTERVAL 2 HOURS"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1) == (("view", 3L)), got.toString)     // u1, u2, u3
    assert(got(2) == (("click", 2L)), got.toString)    // u1, u2
    assert(got(3) == (("purchase", 1L)), got.toString) // u1 only
  }
}
