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
}
