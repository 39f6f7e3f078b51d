package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the information-theory / segmentation additions:
  * mutual information, per-group JSD, RFM quintile segmentation. */
class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  // ───── mutualInformation ─────

  test("mutualInformation: independent columns give mi = 0") {
    val rows = for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25)
      yield (a, b)
    val got = Models.mutualInformation(rows.toDF("a", "b"), "a", "b")
    val r = got.head()
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("pmi") == 0.0) // every cell at independence
    // uniform 2-value marginals → H = ln 2 on both axes, NMI undefined→0/…
    assert(r.getAs[Double]("h_a") == math.rint(math.log(2) * 1e6) / 1e6)
  }

  test("mutualInformation: perfectly dependent columns give mi = h = ln|A|") {
    val rows = Seq.fill(30)(("x", "x")) ++ Seq.fill(30)(("y", "y"))
    val r = Models.mutualInformation(rows.toDF("a", "b"), "a", "b").head()
    val ln2 = math.rint(math.log(2) * 1e6) / 1e6
    assert(r.getAs[Double]("mi") == ln2)
    assert(r.getAs[Double]("h_a") == ln2 && r.getAs[Double]("h_b") == ln2)
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  // ───── jsdByGroup ─────

  test("jsdByGroup: a group matching the corpus mix has jsd ≈ 0") {
    // two groups with IDENTICAL category distributions → corpus = both
    val rows = for (g <- Seq("s1", "s2"); c <- Seq("en", "de");
                    _ <- 1 to (if (c == "en") 30 else 10)) yield (g, c)
    val got = Models.jsdByGroup(rows.toDF("g", "c"), "g", "c")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd")).toMap
    assert(got.values.forall(math.abs(_) < 1e-9))
  }

  test("jsdByGroup: a divergent group scores higher; missing categories carry mass") {
    val rows = Seq.fill(50)(("s1", "en")) ++ // s1 emits ONLY en
      (Seq.fill(25)(("s2", "en")) ++ Seq.fill(25)(("s2", "de")))
    val got = Models.jsdByGroup(rows.toDF("g", "c"), "g", "c")
      .collect().map(r => (r.getString(0), r.getAs[Double]("jsd"),
        r.getAs[Double]("corpus_share"))).sortBy(_._1)
    val (s1, s2) = (got(0), got(1))
    assert(s1._2 > s2._2) // the en-only source deviates more
    assert(s1._2 > 0 && s1._2 < math.log(2) + 1e-9) // bounded by ln 2
    assert(s1._3 == 0.5 && s2._3 == 0.5)
  }

  // ───── rfmSegments ─────

  test("rfmSegments: monotone dimensions score monotone quintiles") {
    // customer i: i orders of 100·i each, last order on Feb i — bigger i
    // is more frequent, bigger spend, AND more recent
    val orders = (1 to 25).flatMap { i =>
      (1 to i).map { _ =>
        (i.toLong, java.sql.Date.valueOf(f"2024-02-$i%02d"), 100.0 * i)
      }
    }.toDF("cust", "d", "amt")
    val got = Models.rfmSegments(orders, "cust", "d", "amt")
      .orderBy("cust").collect()
    // customer 25: most orders, highest spend, most recent → 555
    assert(got.last.getAs[String]("rfm") == "555")
    // customer 1: single old cheap order → 111
    assert(got.head.getAs[String]("rfm") == "111")
    // scores stay within 1..5
    got.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5)
      }
    }
  }

  test("psiFromCounts: zero drift on identical counts, positive otherwise") {
    val same = (0 until 10).map(b => (b, 100L, 100L))
      .toDF("bin", "n_ref", "n_cur")
    assert(Models.psiFromCounts(same, 10).head().getAs[Double]("psi") == 0.0)
    val moved = (0 until 10).map(b => (b, 100L, if (b < 5) 190L else 10L))
      .toDF("bin", "n_ref", "n_cur")
    assert(Models.psiFromCounts(moved, 10).head().getAs[Double]("psi") > 0.25)
  }

  // ───── kmvSetOps ─────

  test("kmvSetOps: small groups (under k) report exact union/intersection") {
    // |A|=30, |B|=40, |A∩B|=20 — well under k=64, so the sketches are
    // complete and the "estimates" must equal the exact counts
    val rows = (1 to 30).map(i => ("a", i)) ++ (11 to 50).map(i => ("b", i))
    val r = Sketches.kmvSetOps(rows.toDF("g", "v"), "g", col("v"), k = 64)
      .head()
    assert(r.getAs[Double]("union_est") == 50.0)
    assert(r.getAs[Double]("inter_est") == 20.0)
    assert(r.getAs[Long]("exact_union") == 50L && r.getAs[Long]("exact_inter") == 20L)
    assert(r.getAs[Double]("union_rel_err") == 0.0)
  }

  test("kmvSetOps: large overlapping groups estimate within ~25% at k=64") {
    val rows = (1 to 2000).map(i => ("a", i)) ++ (1001 to 3000).map(i => ("b", i))
    val r = Sketches.kmvSetOps(rows.toDF("g", "v"), "g", col("v"), k = 64)
      .head()
    assert(r.getAs[Long]("exact_union") == 3000L)
    assert(r.getAs[Long]("exact_inter") == 1000L)
    assert(r.getAs[Double]("union_rel_err") < 0.25,
      s"union err ${r.getAs[Double]("union_rel_err")}")
    assert(r.getAs[Double]("inter_rel_err") < 0.5,
      s"inter err ${r.getAs[Double]("inter_rel_err")}") // ρ adds variance
  }

  test("kmvSetOps: disjoint groups — zero intersection estimate, null rel err") {
    val rows = (1 to 500).map(i => ("a", i)) ++ (1001 to 1500).map(i => ("b", i))
    val r = Sketches.kmvSetOps(rows.toDF("g", "v"), "g", col("v"), k = 32)
      .head()
    assert(r.getAs[Long]("exact_inter") == 0L)
    assert(r.isNullAt(r.fieldIndex("inter_rel_err")))
    // the Jaccard numerator CAN only count shared hashes — none exist
    assert(r.getAs[Double]("inter_est") == 0.0)
  }

  // ───── profileDiff ─────

  test("profileDiff: identical snapshots diff to zero deltas") {
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "u")
    val rows = Profile.profileDiff(df, df, Seq("v", "u")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("distinct_ratio") == 1.0)
      assert(r.getAs[Double]("avg_delta") == 0.0)
      assert(r.getAs[Double]("null_rate_ref") == r.getAs[Double]("null_rate_cur"))
    }
  }

  test("profileDiff: null-rate jump and range shift surface per column") {
    val ref = (1 to 100).map(i => (Some(i.toDouble), i.toLong)).toDF("v", "u")
    val cur = (1 to 100).map(i =>
      (if (i % 2 == 0) None else Some(i + 1000.0), i.toLong)).toDF("v", "u")
    val v = Profile.profileDiff(ref, cur, Seq("v", "u"))
      .filter(col("col_name") === "v").head()
    assert(v.getAs[Double]("null_rate_ref") == 0.0)
    assert(v.getAs[Double]("null_rate_cur") == 0.5)
    assert(v.getAs[Double]("min_cur") > v.getAs[Double]("max_ref"))
  }
}
