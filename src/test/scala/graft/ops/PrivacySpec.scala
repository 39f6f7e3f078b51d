package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // cohorts: (a, x) size 3 / 2 distinct, (a, y) size 1 / 1 distinct,
  // (b, x) size 2 / 1 distinct; one null sensitive in (a, x)
  private def df = Seq(
    ("a", "x", Some("s1")), ("a", "x", Some("s2")), ("a", "x", None),
    ("a", "y", Some("s1")),
    ("b", "x", Some("s3")), ("b", "x", Some("s3"))
  ).map { case (q1, q2, s) => (q1, q2, s.orNull) }.toDF("q1", "q2", "s")

  test("kAnonymityAudit: cohort sizes, distinct-l, risk, violation flags") {
    val got = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), col("s"), k = 2, l = 2)
      .select("q1", "q2", "group_size", "l_distinct", "risk", "violates_k",
        "violates_l")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5), r.getInt(6)))
      .toMap
    // null sensitive counts toward size but not l_distinct
    assert(got(("a", "x")) == ((3L, 2L, math.rint(1.0 / 3 * 1e6) / 1e6, 0, 0)))
    // singleton cohort: k-violating AND l-violating
    assert(got(("a", "y")) == ((1L, 1L, 1.0, 1, 1)))
    // size 2 but only one sensitive value: l-violating only
    assert(got(("b", "x")) == ((2L, 1L, 0.5, 0, 1)))
  }

  test("kAnonymitySummary: dataset k, violating cohorts, rows at risk") {
    val r = Privacy.kAnonymitySummary(df, Seq("q1", "q2"), col("s"), k = 2, l = 2)
      .select("dataset_k", "n_cohorts", "n_under_k", "n_under_l",
        "rows_at_risk")
      .collect().head
    assert(r.getLong(0) == 1L) // weakest cohort
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L) // (a, y)
    assert(r.getLong(3) == 2L) // (a, y) and (b, x)
    assert(r.getLong(4) == 1L) // only (a, y)'s single row is under k
  }

  test("kAnonymityAudit: k = 1 never flags; all-distinct sensitive passes l") {
    val got = Privacy.kAnonymityAudit(
        Seq(("a", "s1"), ("a", "s2")).toDF("q1", "s"),
        Seq("q1"), col("s"), k = 1, l = 2)
      .select("group_size", "l_distinct", "violates_k", "violates_l")
      .collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L)
    assert(got.getInt(2) == 0 && got.getInt(3) == 0)
  }

  test("tCloseness: hand-computed total-variation distances per cohort") {
    // global: s1 ×4, s2 ×4 → p_g = (0.5, 0.5)
    // cohort a: (s1 ×3, s2 ×1) → 0.5·(|.75−.5| + |.25−.5|) = 0.25
    // cohort b: (s1 ×1, s2 ×3) → 0.25
    // cohort c: (s2 only ×0)… c = (s1 ×0, s2 ×0) impossible; use d below
    // cohort d: (s1 ×0, s2 ×... ) — absent-value mass: d = (s2, s2) →
    //   0.5·(|1−.5| + (1 − .5)) = 0.5
    val df = Seq(
      ("a", "s1"), ("a", "s1"), ("a", "s1"), ("a", "s2"),
      ("b", "s1"), ("b", "s2"), ("b", "s2"), ("b", "s2")
    ).toDF("q", "v")
    val got = Privacy.tCloseness(df, Seq("q"), org.apache.spark.sql
        .functions.col("v"), t = 0.2)
      .orderBy("q").select("q", "group_size", "t_dist", "violates_t")
      .collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.25, 0.25))
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 1))
    // a cohort missing a global value entirely carries its whole mass
    val df2 = Seq(("a", "s1"), ("a", "s1"), ("d", "s2"), ("d", "s2"))
      .toDF("q", "v")
    val got2 = Privacy.tCloseness(df2, Seq("q"), org.apache.spark.sql
        .functions.col("v"), t = 0.2)
      .orderBy("q").select("t_dist").collect().map(_.getDouble(0))
    // each cohort: own value p_c=1 vs p_g=.5 (diff .5) + missing .5 → t=.5
    assert(got2.toSeq == Seq(0.5, 0.5))
  }

  test("entropyLDiversity: nats entropy, effective values, ln(l) gate") {
    val df = Seq(
      ("q1", "a"), ("q1", "a"), ("q1", "b"), ("q1", "b"),       // H = ln 2
      ("q2", "a"), ("q2", "a"), ("q2", "a"),                    // H = 0
      ("q3", "a"), ("q3", "b"), ("q3", "c"), ("q3", "d")        // H = ln 4
    ).toDF("q", "v")
    val got = Privacy.entropyLDiversity(df, Seq("q"), col("v"), l = 3)
      .orderBy("q")
      .select("q", "group_size", "l_distinct", "entropy", "eff_values",
        "violates_entropy_l")
      .collect()
    assert(got(0).getDouble(3) == 0.693147 && got(0).getDouble(4) == 2.0)
    assert(got(0).getInt(5) == 1) // ln 2 < ln 3
    assert(got(1).getDouble(3) == 0.0 && got(1).getDouble(4) == 1.0 &&
      got(1).getInt(5) == 1)
    assert(got(2).getLong(2) == 4L && got(2).getDouble(3) == 1.386294 &&
      got(2).getInt(5) == 0) // ln 4 > ln 3
  }

  test("dpNoisyCount: seeded Laplace noise replays the inverse-CDF formula") {
    val df = Seq.tabulate(40)(i => (if (i % 5 == 0) "a" else "b", i))
      .toDF("g", "x")
    def expected(key: String, trueCount: Long, eps: Double): (Double, Long) = {
      val u = (graft.ops.Hashing.longHash60(key) % 1000000000L).toDouble / 1e9
      val v = u - 0.5
      val noise = BigDecimal(-1.0 / eps * math.signum(v) *
        math.log(1.0 - 2.0 * math.abs(v)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (noise, math.max(0L, math.round(trueCount + noise)))
    }
    val got = Privacy.dpNoisyCount(df, Seq("g"), epsilon = 1.0, salt = "dp")
      .orderBy("g").collect()
    val (na, ra) = expected("a|dp", 8L, 1.0)
    val (nb, rb) = expected("b|dp", 32L, 1.0)
    assert(got(0).getAs[Long]("released") == ra)
    assert(got(1).getAs[Long]("released") == rb)
    // neither the raw count nor the noise is in the release frame
    // (released − noise reconstructs the true count)
    assert(!got(0).schema.fieldNames.contains("_true"))
    assert(!got(0).schema.fieldNames.contains("noise"))
    // the noise channel lives in the RESTRICTED audit view only
    val audit = Privacy.dpNoiseAudit(
        df.groupBy("g").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("_c")),
        Seq("g"), epsilon = 1.0, salt = "dp")
      .orderBy("g").collect()
    assert(audit(0).getAs[Double]("noise") == na)
    assert(audit(1).getAs[Double]("noise") == nb)
    // reproducible: a second run releases identical numbers
    val again = Privacy.dpNoisyCount(df, Seq("g"), epsilon = 1.0, salt = "dp")
      .orderBy("g").collect()
    assert(again.map(_.getAs[Long]("released")).toSeq ==
      got.map(_.getAs[Long]("released")).toSeq)
  }

  test("requireBoundedCohorts: exceeding the state bound fails loud") {
    val wide = (1 to 50).map(i => (s"c$i", i.toLong)).toDF("cohort", "_n")
    val e = intercept[IllegalArgumentException] {
      Privacy.requireBoundedCohorts(wide, Seq("cohort"), maxCohorts = 10L)
    }
    assert(e.getMessage.contains("maxCohorts=10"))
    // within the bound the store passes through unchanged
    val ok = Privacy.requireBoundedCohorts(wide, Seq("cohort"), 100L)
    assert(ok.count() == 50L)
  }

  test("luhnPanScan: checksum gates candidates, masking keeps last 4") {
    val df = Seq(
      (1L, "pay with 4111111111111111 or 4111111111111112 today"),
      (2L, "ref 12345 and order 9999 but no card"),
      (3L, "two cards 5500005555555559 and 340000000000009!")
    ).toDF("id", "text")
    val got = Privacy.luhnPanScan(df, "id", "text").orderBy("id")
      .select("id", "n_candidates", "n_valid", "masked", "has_pan")
      .collect()
    // doc 1: both 16-digit runs are candidates, only the real one passes
    assert(got.length == 2) // doc 2 has no 13-19 digit run at all
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L &&
      got(0).getLong(2) == 1L && got(0).getString(3) == "****1111" &&
      got(0).getInt(4) == 1)
    assert(got(1).getLong(0) == 3L && got(1).getLong(2) == 2L &&
      got(1).getString(3) == "****0009;****5559")
  }
}
