package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the model-governance additions: Welch t-test, PSI
  * drift, calibration (fixed + quantile bins), rank AUC. */
class ModelGovernanceSpec extends SparkSpec {
  import spark.implicits._

  // ───── welchTTest ─────

  test("welchTTest: identical arms give t = 0, insignificant") {
    val df = (1 to 50).flatMap(i => Seq((0, i.toDouble), (1, i.toDouble)))
      .toDF("arm", "v")
    val r = Models.welchTTest(df, "arm", "v").head()
    assert(r.getAs[Long]("n_a") == 50L && r.getAs[Long]("n_b") == 50L)
    assert(r.getAs[Double]("t_stat") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("welchTTest: clearly shifted arms flag significant with the right sign") {
    val df = ((1 to 100).map(i => (0, 10.0 + i % 5)) ++
      (1 to 100).map(i => (1, 20.0 + i % 5))).toDF("arm", "v")
    val r = Models.welchTTest(df, "arm", "v").head()
    assert(r.getAs[Double]("t_stat") < -3.5) // arm a is LOWER
    assert(r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("df_welch") > 100.0) // equal vars → df ≈ n−2
  }

  test("welchTTest: null metrics drop from their arm's moments") {
    val df = Seq((0, Some(1.0)), (0, None), (0, Some(3.0)),
      (1, Some(2.0)), (1, Some(4.0))).toDF("arm", "v")
    val r = Models.welchTTest(df, "arm", "v").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 3.0)
  }

  // ───── psiDrift ─────

  test("psiDrift: identical distributions give psi ≈ 0") {
    val ref = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val r = Models.psiDrift(ref, ref, "v").head()
    assert(math.abs(r.getAs[Double]("psi")) < 1e-5)
  }

  test("psiDrift: shifted distribution drifts, out-of-range clamps to edge bins") {
    val ref = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val cur = (1 to 1000).map(i => 200.0 + i % 10).toDF("v") // all beyond hi
    val rows = Models.psiDrift(ref, cur, "v").orderBy("bin").collect()
    assert(rows.length == 10) // spine keeps every bin
    // every current value clamps into the top bin
    assert(rows.last.getAs[Long]("n_cur") == 1000L)
    assert(rows.init.forall(_.getAs[Long]("n_cur") == 0L))
    assert(rows.head.getAs[Double]("psi") > 0.25) // "drifted" territory
  }

  // ───── calibration ─────

  test("calibrationReport: perfectly calibrated bins, fixed [0,1] edges") {
    // bin k gets probability (k+0.5)/10 and exactly that share positive
    val rows = for (b <- 0 until 10; i <- 0 until 20)
      yield ((b + 0.5) / 10.0, if (i < (b * 2 + 1)) 1.0 else 0.0)
    val got = Models.calibrationReport(rows.toDF("prob", "y"), "prob", "y")
      .orderBy("bin").collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getAs[Double]("mean_prob") == r.getAs[Double]("pos_rate"))
    }
  }

  test("calibrationByQuantile: narrow-band scores still spread over bins") {
    // all probs in [0.40, 0.45): fixed deciles would give ONE bin
    val rows = (0 until 200).map(i => (0.40 + (i % 50) * 0.001, (i % 2).toDouble))
    val fixed = Models.calibrationReport(rows.toDF("prob", "y"), "prob", "y")
    assert(fixed.count() == 1)
    val byQ = Models.calibrationByQuantile(rows.toDF("prob", "y"), "prob", "y")
    assert(byQ.count() >= 9) // quantile cuts spread the band
  }

  // ───── aucRank ─────

  test("aucRank: perfect separation gives AUC 1, reversed gives 0") {
    val perfect = ((1 to 50).map(i => (0.9 + i * 1e-4, 1.0)) ++
      (1 to 50).map(i => (0.1 + i * 1e-4, 0.0))).toDF("s", "y")
    assert(Models.aucRank(perfect, "s", "y").head().getAs[Double]("auc") == 1.0)
    val reversed = perfect.withColumn("y", lit(1.0) - col("y"))
    val r = Models.aucRank(reversed, "s", "y").head()
    assert(r.getAs[Double]("auc") == 0.0 && r.getAs[Double]("gini") == -1.0)
  }

  test("aucRank: all-tied scores give AUC exactly 0.5 via midranks") {
    val df = ((1 to 30).map(_ => (0.7, 1.0)) ++ (1 to 70).map(_ => (0.7, 0.0)))
      .toDF("s", "y")
    val r = Models.aucRank(df, "s", "y").head()
    assert(r.getAs[Double]("auc") == 0.5)
    assert(r.getAs[Long]("n_pos") == 30L && r.getAs[Long]("n_neg") == 70L)
  }

  test("aucRank: single-class input yields null auc, not a crash") {
    val df = (1 to 10).map(i => (i / 10.0, 1.0)).toDF("s", "y")
    val r = Models.aucRank(df, "s", "y").head()
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  // ───── ksTest ─────

  test("ksTest: identical samples give D = 0 and no drift") {
    val df = (1 to 200).map(i => (i % 17).toDouble).toDF("v")
    val r = Models.ksTest(df, df, "v").head()
    assert(r.getAs[Double]("d_stat") == 0.0)
    assert(!r.getAs[Boolean]("drifted"))
    assert(r.getAs[Long]("n_ref") == 200L && r.getAs[Long]("n_cur") == 200L)
  }

  test("ksTest: disjoint supports give D = 1 at the reference max") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (101 to 200).map(_.toDouble).toDF("v")
    val r = Models.ksTest(ref, cur, "v").head()
    assert(r.getAs[Double]("d_stat") == 1.0)
    assert(r.getAs[Double]("d_at") == 100.0)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("ksTest: a median shift drifts; the critical value scales as sqrt((n+m)/nm)") {
    val ref = (1 to 500).map(_.toDouble).toDF("v")
    val cur = (251 to 750).map(_.toDouble).toDF("v")
    val r = Models.ksTest(ref, cur, "v").head()
    assert(math.abs(r.getAs[Double]("d_stat") - 0.5) < 0.01)
    val expect = 1.358 * math.sqrt(1000.0 / (500.0 * 500.0))
    assert(math.abs(r.getAs[Double]("crit_05") - expect) < 1e-6)
    assert(r.getAs[Boolean]("drifted"))
  }

  test("wilsonPassRate: small perfect sample stays uncertain, big sample tightens past it") {
    val df = (Seq.fill(3)(("a", true)) ++
      Seq.fill(940)(("b", true)) ++ Seq.fill(60)(("b", false)))
      .toDF("src", "ok")
    val out = Models.wilsonPassRate(df, "src", "ok")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val z2 = 1.96 * 1.96
    // a: 3/3 — rate 1.0 but the lower bound is only 1/(1 + z²/n) ≈ 0.44
    assert(out("a")._3 == 1.0 && out("a")._5 == 1.0, out.toString)
    assert(math.abs(out("a")._4 - 1.0 / (1.0 + z2 / 3)) < 1e-6, out.toString)
    // b: 940/1000 — lower RATE, but its lower bound BEATS the 3/3 source
    assert(out("b")._3 == 0.94, out.toString)
    assert(out("b")._4 > out("a")._4, out.toString)
    assert(out("b")._4 > 0.92 && out("b")._5 < 0.96, out.toString)
  }
}
