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
}
