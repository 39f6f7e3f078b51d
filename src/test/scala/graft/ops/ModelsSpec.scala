package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("logregFit/Score: separable data — positives above 0.5, negatives below") {
    // y = 1 iff x1 is large; 3 GD steps from zero must already order the
    // classes correctly on a linearly-separable set
    val f = Seq(
      (1L, 1.0, 0.9), (2L, 1.0, 0.8), (3L, 1.0, 0.95), (4L, 1.0, 0.7),
      (5L, 0.0, 0.1), (6L, 0.0, 0.2), (7L, 0.0, 0.05), (8L, 0.0, 0.3)
    ).toDF("id", "y", "x1")
    val w = Models.logregFit(f, "y", Seq("x1"))
    val scored = Models.logregScore(f, w, Seq("x1"))
      .select("id", "y", "prob", "pred").collect()
    scored.foreach { r =>
      val (y, prob, pred) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert((y == 1.0) == pred, s"id=${r.getLong(0)} prob=$prob")
      if (y == 1.0) assert(prob > 0.5) else assert(prob < 0.5)
    }
    // weights frame is exactly one row (b, w1)
    val wr = w.collect()
    assert(wr.length == 1 && wr.head.schema.fieldNames.toSeq == Seq("b", "w1"))
  }

  test("confusionMatrix: cell counts, margin shares, accuracy; nulls excluded") {
    val df = Seq(
      Some("en") -> Some("en"), Some("en") -> Some("en"),
      Some("en") -> Some("de"),
      Some("de") -> Some("de"),
      Some("de") -> Some("en"),
      None -> Some("en"), Some("en") -> None // dropped
    ).map { case (a, p) => (a.orNull, p.orNull) }.toDF("actual", "predicted")
    val got = Models.confusionMatrix(df, "actual", "predicted")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // 5 labeled rows: en→en 2, en→de 1, de→de 1, de→en 1
    assert(got(("en", "en"))._1 == 2L && got(("en", "de"))._1 == 1L &&
      got(("de", "de"))._1 == 1L && got(("de", "en"))._1 == 1L)
    // row shares: en row total 3, de row total 2
    assert(got(("en", "en"))._2 == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(got(("de", "de"))._2 == 0.5)
    // col shares: en column total 3, de column total 2
    assert(got(("en", "en"))._3 == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(got(("en", "de"))._3 == 0.5)
    // accuracy = (2 + 1) / 5 on every row
    assert(got.values.forall(_._4 == 0.6), got.toString)
  }

  test("logregFit: step count changes weights (iters is honored)") {
    val f = Seq((1L, 1.0, 0.9), (2L, 0.0, 0.1)).toDF("id", "y", "x1")
    val w1 = Models.logregFit(f, "y", Seq("x1"), iters = 1).collect().head
    val w3 = Models.logregFit(f, "y", Seq("x1"), iters = 3).collect().head
    assert(w1.getDouble(1) != w3.getDouble(1))
  }

  test("linearTrend: recovers exact slope/intercept on noiseless lines") {
    val pts = (0 until 20).flatMap { i =>
      Seq(("up", i.toDouble, 2.0 * i + 1.0), ("flat", i.toDouble, 5.0))
    }.toDF("k", "x", "y")
    val got = Models.linearTrend(pts, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("up") == ((20L, 2.0, 1.0)))
    assert(got("flat")._2 == 0.0 && got("flat")._3 == 5.0)
  }

  test("linearTrend: null pairs excluded from n and moments") {
    val pts = Seq(("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", None, Some(9.0)), ("a", Some(9.0), None))
      .toDF("k", "x", "y")
    val r = Models.linearTrend(pts, Seq("k"), col("x"), col("y")).collect().head
    assert(r.getLong(1) == 2L && r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
  }

  test("targetEncode: leave-one-out with m-smoothing; singleton = prior") {
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 0.0),
      ("b", 0.0),
      ("c", 1.0), ("c", 0.0)
    ).toDF("cat", "y")
    val prior = 3.0 / 6
    def rd(x: Double) = math.rint(x * 1e6) / 1e6
    val got = Models.targetEncode(df, "cat", "y", m = 2.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // a, y=1: (2 - 1 + 2*0.5) / (3 - 1 + 2) = 2/4
    assert(got(("a", 1.0)) == rd((2.0 - 1 + 2 * prior) / 4))
    assert(got(("a", 0.0)) == rd((2.0 - 0 + 2 * prior) / 4))
    // singleton b: (0 - 0 + 2*0.5) / (1 - 1 + 2) = exactly the prior
    assert(got(("b", 0.0)) == prior)
    // c, y=1: (1 - 1 + 2*0.5) / (2 - 1 + 2) = 1/3
    assert(got(("c", 1.0)) == rd((1.0 - 1 + 2 * prior) / 3))
    // the row's own label is excluded: same-cat rows with different y
    // encode differently (plain mean encoding would give them the same)
    assert(got(("a", 1.0)) != got(("a", 0.0)))
  }

  test("naiveBayes: hand-computed Laplace arithmetic on a 4-doc corpus") {
    // class 1 says "good good spark", class 0 says "bad bad spark":
    // tokens good/bad are fully class-indicative, spark is neutral
    val df = Seq(
      (1L, 1, "good good spark"), (2L, 1, "good spark"),
      (3L, 0, "bad bad spark"), (4L, 0, "bad spark")
    ).toDF("doc_id", "y", "text")
    val m = Models.naiveBayesFit(df, "text", col("y"), vocabSize = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // in-vocab token totals: class1 = 5 (good*3, spark*2), class0 = 5,
    // V = 3; llr(good) = ln(4/8) - ln(1/8), llr(bad) symmetric opposite,
    // llr(spark) = 0; prior = ln(2/2) = 0
    val lnG = math.log(4.0 / 8) - math.log(1.0 / 8)
    assert(math.abs(m("good")._1 - lnG) < 1e-12)
    assert(math.abs(m("bad")._1 + lnG) < 1e-12)
    assert(math.abs(m("spark")._1) < 1e-12)
    assert(m.values.forall(_._2 == 0.0)) // log prior on every row
    val model = Models.naiveBayesFit(df, "text", col("y"), vocabSize = 16)
    val got = Models.naiveBayesScore(df, model, "doc_id", "text")
      .select("doc_id", "log_odds", "pred")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    // doc 1 = 2*llr(good): both sides classified correctly
    assert(math.abs(got(1L)._1 - math.rint(2 * lnG * 1e6) / 1e6) < 1e-12)
    assert(got(1L)._2 == 1 && got(2L)._2 == 1)
    assert(got(3L)._2 == 0 && got(4L)._2 == 0)
  }

  test("naiveBayes: OOV-only doc scores exactly the log prior") {
    val train = Seq(
      (1L, 1, "alpha beta"), (2L, 0, "gamma delta"), (3L, 1, "alpha")
    ).toDF("doc_id", "y", "text")
    val model = Models.naiveBayesFit(train, "text", col("y"), vocabSize = 8)
    val test0 = Seq((9L, "zzz qqq")).toDF("doc_id", "text")
    val lp = math.log(2.0 / 1.0) // 2 positive docs, 1 negative
    val r = Models.naiveBayesScore(test0, model, "doc_id", "text")
      .select("log_odds").collect().head.getDouble(0)
    assert(r == math.rint(lp * 1e6) / 1e6)
  }

  test("naiveBayesServe: projection path ≡ join path, incl. null/empty docs") {
    val docs = Seq(
      (1L, 1, "good good spark fast"), (2L, 1, "good spark"),
      (3L, 0, "bad bad slow spark"), (4L, 0, "bad spark slow"),
      (5L, 1, null.asInstanceOf[String]), (6L, 0, "")
    ).toDF("doc_id", "y", "text")
    val model = Models.naiveBayesFit(docs, "text", col("y"), vocabSize = 16)
    val joinPath = Models.naiveBayesScore(docs, model, "doc_id", "text")
      .select("doc_id", "log_odds", "pred").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val servePath = Models.naiveBayesServe(docs, model, "text")
      .select("doc_id", "log_odds", "pred").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(joinPath == servePath)
  }

  test("bradleyTerry: 2:1 head-to-head converges to the 2/3 vs 1/3 ratings") {
    // closed form: u_A/u_B = W_A/W_B = 2 after ONE MM step (same shared
    // denominator n/(r_A + r_B)), and the normalized point is stationary
    val pairs = Seq(("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val got = Models.bradleyTerry(pairs, "winner", "loser", iters = 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("A")._1 == 2L && got("B")._1 == 1L)
    assert(got("A")._2 == 3L && got("B")._2 == 3L)
    assert(math.abs(got("A")._3 - 2.0 / 3) < 1e-9)
    assert(math.abs(got("B")._3 - 1.0 / 3) < 1e-9)
  }

  test("bradleyTerry: transitive chain orders A > B > C; sum-normalized") {
    val pairs = Seq(
      ("A", "B"), ("A", "B"), ("B", "A"),
      ("B", "C"), ("B", "C"), ("C", "B"),
      ("A", "C"), ("A", "C"), ("A", "C")
    ).toDF("winner", "loser")
    val got = Models.bradleyTerry(pairs, "winner", "loser", iters = 50)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("A") > got("B") && got("B") > got("C"))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("bradleyTerry: maxItems bound fails loud") {
    val pairs = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("w", "l")
    intercept[IllegalArgumentException] {
      Models.bradleyTerry(pairs, "w", "l", maxItems = 2)
    }
  }

  test("naiveBayes: vocabSize caps the model and OOV tokens are skipped") {
    // "rare" appears once; vocabSize=2 keeps the two frequent tokens only
    val df = Seq(
      (1L, 1, "hot hot hot rare"), (2L, 0, "cold cold cold")
    ).toDF("doc_id", "y", "text")
    val m = Models.naiveBayesFit(df, "text", col("y"), vocabSize = 2)
    assert(m.count() == 2)
    assert(m.select("token").collect().map(_.getString(0)).toSet ==
      Set("hot", "cold"))
  }

  test("passAtK matches the combinatorial definition and its guards") {
    // p1: n=5, c=2 → pass@1 = 1 − C(3,1)/C(5,1) = 0.4;
    //               pass@3 = 1 − C(3,3)/C(5,3) = 0.9; pass@5: n−c<5 → 1
    // p2: n=5, c=0 → all zero (product telescopes to 1)
    // p3: n=4 < 5 → pass@5 undefined (null); pass@1 = 1 − 2/4 = 0.5
    val attempts =
      (Seq.fill(2)(true) ++ Seq.fill(3)(false)).map(("p1", _)) ++
        Seq.fill(5)(("p2", false)) ++
        (Seq.fill(2)(true) ++ Seq.fill(2)(false)).map(("p3", _))
    val df = attempts.toDF("problem", "ok")
    val got = Models.passAtK(df, "problem", col("ok"), Seq(1, 3, 5))
      .orderBy("problem")
      .select("problem", "n", "c", "pass_at_1", "pass_at_3", "pass_at_5")
      .collect()
    val p1 = got(0)
    assert((p1.getLong(1), p1.getLong(2)) == (5L, 2L))
    assert(p1.getDouble(3) == 0.4 && p1.getDouble(4) == 0.9 &&
      p1.getDouble(5) == 1.0)
    val p2 = got(1)
    assert(p2.getDouble(3) == 0.0 && p2.getDouble(4) == 0.0 &&
      p2.getDouble(5) == 0.0)
    val p3 = got(2)
    assert(p3.getDouble(3) == 0.5 && !p3.isNullAt(4) && p3.isNullAt(5))
  }

  test("bootstrapCI: ordered bounds around the mean, partition-invariant") {
    val df = (0L until 300L).map(i => ("g", i, 100L + i % 50))
      .toDF("g", "id", "v")
    val r = Models.bootstrapCI(df, "g", "id", "v", b = 40).head()
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi) // 300 iid rows: mean inside its CI
    assert(r.getAs[Long]("n_resamples") <= 40L)
    // deterministic under repartition (the hash-draw contract)
    val r2 = Models.bootstrapCI(df.repartition(7), "g", "id", "v", b = 40)
      .head()
    assert(r2.getAs[Double]("boot_lo") == lo &&
      r2.getAs[Double]("boot_hi") == hi)
  }

  test("splitConformal: coverage meets the target on exchangeable data, " +
    "tiny calibration sets flag unbounded") {
    // y and pred differ by a bounded deterministic residual
    val df = (0L until 400L).map { i =>
      ("g", i, 100L + i % 37, 100L + i % 37 + (i * 7 % 11) - 5)
    }.toDF("g", "id", "y", "pred")
    val r = Models.splitConformal(df, "g", "id", "y", "pred", 9, 10).head()
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == 400L)
    assert(r.getAs[Int]("unbounded") == 0)
    assert(r.getAs[Double]("coverage") >= 0.85) // target 0.9, finite-sample
    assert(r.getAs[Double]("target") == 0.9)
    // 3 rows: k = ceil(4·0.9) = 4 > n_cal≈1-2 → unbounded, full coverage
    val tiny = Seq(("g", 1L, 5L, 9L), ("g", 2L, 5L, 1L), ("g", 3L, 5L, 7L))
      .toDF("g", "id", "y", "pred")
    val t = Models.splitConformal(tiny, "g", "id", "y", "pred", 9, 10)
      .collect()
    if (t.nonEmpty && t.head.getAs[Int]("unbounded") == 1)
      assert(t.head.getAs[Double]("coverage") == 1.0)
  }

  test("fleissKappa: hand-computed 3-rater panel, unbalanced items excluded") {
    // item 1: AAA (P_1 = 1), item 2: ABB (P_2 = 1/3), item 3: AA (2 raters
    // only → excluded). P̄ = 2/3, p_A = 4/6, p_B = 2/6, P_e = 20/36,
    // κ = (2/3 − 5/9)/(1 − 5/9) = 0.25
    val df = Seq(
      ("g", 1L, "A"), ("g", 1L, "A"), ("g", 1L, "A"),
      ("g", 2L, "A"), ("g", 2L, "B"), ("g", 2L, "B"),
      ("g", 3L, "A"), ("g", 3L, "A")
    ).toDF("grp", "item", "label")
    val r = Models.fleissKappa(df, "grp", "item", "label", nRaters = 3).head()
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("n_unbalanced") == 1L)
    assert(r.getAs[Long]("n_categories") == 2L)
    assert(r.getAs[Double]("pbar") == 0.666667)
    assert(r.getAs[Double]("pe") == 0.555556)
    assert(r.getAs[Double]("kappa") == 0.25)
    // perfect single-category agreement: P_e = 1 → κ undefined (null)
    val one = Seq(("g", 1L, "A"), ("g", 1L, "A"), ("g", 1L, "A"))
      .toDF("grp", "item", "label")
    val r1 = Models.fleissKappa(one, "grp", "item", "label", nRaters = 3).head()
    assert(r1.getAs[Double]("pbar") == 1.0 && r1.getAs[Double]("pe") == 1.0)
    assert(r1.isNullAt(r1.fieldIndex("kappa")))
  }

  test("krippendorffAlpha: variable panels, unpairable/oversize surfaced") {
    // u1: aa (agree), u2: ab (disagree), u3: bbb (agree), u4: single
    // rating (unpairable), u5: 6 ratings (oversize, excluded)
    val rows = Seq(
      ("g", 1L, "a"), ("g", 1L, "a"),
      ("g", 2L, "a"), ("g", 2L, "b"),
      ("g", 3L, "b"), ("g", 3L, "b"), ("g", 3L, "b"),
      ("g", 4L, "a")
    ) ++ (1 to 6).map(_ => ("g", 5L, "a"))
    val r = Models.krippendorffAlpha(rows.toDF("grp", "item", "label"),
      "grp", "item", "label").head()
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Long]("n_unpairable") == 1L)
    assert(r.getAs[Long]("n_oversize") == 1L)
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Long]("n_categories") == 2L)
    // A = 12·(4−2) for u2 only; α = 1 − 6·24/(12·(49−25)) = 0.5
    assert(r.getAs[Double]("alpha") == 0.5)
    // degenerate: one label everywhere → denominator 0 → null
    val same = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "a"),
      ("g", 2L, "a")).toDF("grp", "item", "label")
    val d = Models.krippendorffAlpha(same, "grp", "item", "label").head()
    assert(d.isNullAt(d.fieldIndex("alpha")))
  }

  test("rbo: identical lists give 1-p^k, disjoint give 0") {
    val a = (1 to 10).map(r => (1L, r.toLong + 100, r))
      .toDF("qid", "cid", "rnk")
    val r = Models.rbo(a, a, k = 10, p = 0.9).head()
    // truncated RBO of identical lists: (1-p)·Σ p^(d-1) = 1 - p^10
    assert(math.abs(r.getAs[Double]("rbo") - (1 - math.pow(0.9, 10))) < 1e-6)
    assert(r.getAs[Double]("overlap_k") == 1.0)
    val b = (1 to 10).map(r => (1L, r.toLong + 500, r))
      .toDF("qid", "cid", "rnk")
    val z = Models.rbo(a, b, k = 10, p = 0.9).head()
    assert(z.getAs[Double]("rbo") == 0.0 && z.getAs[Double]("overlap_k") == 0.0)
  }

  test("bhFdr: step-up rescues low ranks that fail individually") {
    // r1 fails its own threshold (.02 > .0125) but r3 passes (.03 <=
    // .0375), so k* = 3 sweeps r1 and r2 in — the BH signature
    val df = Seq((1L, 0.02), (2L, 0.024), (3L, 0.03), (4L, 0.9))
      .toDF("id", "p")
    val got = Models.bhFdr(df, "id", "p", q = 0.05).orderBy("rank").collect()
    assert(got.map(_.getAs[Int]("discovery")).toSeq == Seq(1, 1, 1, 0))
    // nothing passes → no discoveries (kstar null path)
    val none = Seq((1L, 0.5), (2L, 0.8)).toDF("id", "p")
    val g2 = Models.bhFdr(none, "id", "p", q = 0.05).collect()
    assert(g2.forall(_.getAs[Int]("discovery") == 0))
  }

  test("temperatureScaling: overconfident logits want T max, calibrated T min") {
    // half the confident predictions are wrong → flattening (large T) wins
    val over = (1 to 20).map { i =>
      val z = if (i % 2 == 0) 4.0 else -4.0
      val y = if (i % 4 < 2) 1 else 0 // uncorrelated with z
      (i.toLong, z, y)
    }.toDF("id", "z", "y")
    val g1 = Models.temperatureScaling(over, "id", "z", "y")
      .filter(col("is_best") === 1).head()
    assert(g1.getAs[Double]("t") == 4.0)
    // perfectly separated labels → sharpening (smallest T) wins
    val sep = (1 to 20).map { i =>
      val z = if (i % 2 == 0) 4.0 else -4.0
      (i.toLong, z, if (z > 0) 1 else 0)
    }.toDF("id", "z", "y")
    val g2t = Models.temperatureScaling(sep, "id", "z", "y")
      .filter(col("is_best") === 1).head()
    assert(g2t.getAs[Double]("t") == 0.25)
  }

  test("groupAdvantage: hand-checked normalization, zero-std and best-of-n") {
    // group 1: rewards 1,2,3,6 -> mean 3, var (4+1+0+9)/4 = 3.5
    // group 2: constant rewards -> std 0 -> advantage 0 for all
    // group 3: tied max -> lowest id wins best-of-n
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0), (1L, 13L, 6.0),
      (2L, 20L, 5.0), (2L, 21L, 5.0),
      (3L, 30L, 7.0), (3L, 31L, 7.0), (3L, 32L, 4.0)
    ).toDF("g", "id", "r")
    val got = Models.groupAdvantage(df, "g", "id", "r")
      .orderBy("g", "id").collect()
    val std1 = math.sqrt(3.5)
    assert(got(0).getAs[Double]("mean_r") == 3.0)
    assert(got(0).getAs[Double]("std_r") ==
      BigDecimal(std1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(0).getAs[Double]("advantage") ==
      BigDecimal(-2.0 / std1).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(3).getAs[Int]("is_best") == 1) // reward 6 wins group 1
    // zero-std group: advantage exactly 0 (never -0.0), one best
    assert(got(4).getAs[Double]("advantage") == 0.0)
    assert(got(5).getAs[Double]("advantage") == 0.0)
    assert(got(4).getAs[Int]("is_best") == 1) // lowest id on full tie
    assert(got(5).getAs[Int]("is_best") == 0)
    // tied max: id 30 beats 31
    assert(got(6).getAs[Int]("is_best") == 1)
    assert(got(7).getAs[Int]("is_best") == 0)
    assert(got.forall(_.getAs[Long]("group_size") > 0))
  }

  test("temperatureScaling: saturated logits keep every NLL finite") {
    // raw LLM logits at T=0.25: |z|/T = 160 ≫ 37 saturates σ to exactly
    // 0/1, where unclamped log() nulls the NLL — rows would silently
    // vanish from sum() but not count(), biasing mean_nll and breaking
    // is_best; the [ε, 1−ε] clamp keeps the wrong-label NLL huge but
    // finite. z=40, y=0 is WRONG at every T, so no T may show NLL 0.
    val sat = (1 to 8).map(i => (i.toLong, 40.0, 0)).toDF("id", "z", "y")
    val got = Models.temperatureScaling(sat, "id", "z", "y").collect()
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("mean_nll"))))
    assert(got.forall(_.getAs[Long]("n") == 8L))
    assert(got.forall(_.getAs[Double]("mean_nll") > 1.0))
    // exactly one best row survives the min-struct flag
    assert(got.count(_.getAs[Int]("is_best") == 1) == 1)
  }

  test("dpoPairs: best-vs-worst with deterministic ties, margin gate, degenerate groups dropped") {
    import spark.implicits._
    val r = Seq(
      // p1: clean separation — chosen 11 (9.0), rejected 13 (2.0)
      ("p1", 11L, 9.0), ("p1", 12L, 5.0), ("p1", 13L, 2.0),
      // p2: all-tied scores — chosen = highest id, rejected = lowest id,
      // margin 0 -> gated out at minMargin 1
      ("p2", 21L, 4.0), ("p2", 22L, 4.0),
      // p3: singleton -> dropped (n < 2)
      ("p3", 31L, 7.0),
      // p4: tie at the TOP — chosen breaks to higher id 42; margin 3
      ("p4", 41L, 6.0), ("p4", 42L, 6.0), ("p4", 43L, 3.0)
    ).toDF("prompt", "rid", "score")
    val got = Models.dpoPairs(r, "prompt", "rid", "score", minMargin = 1.0)
      .orderBy("prompt")
      .select("prompt", "n_responses", "chosen_id", "chosen_score",
        "rejected_id", "rejected_score", "margin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("p1", 3L, 11L, 9.0, 13L, 2.0, 7.0),
      ("p4", 3L, 42L, 6.0, 43L, 3.0, 3.0)))
  }
}
