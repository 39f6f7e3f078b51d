package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: one row per column with null/distinct/range stats") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), 20.0), (Some(2L), 30.0), (None, 40.0))
      .toDF("k", "v")
    val p = Profile.numericProfile(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(p("k") == ((3L, 1L, 2L, 1.0, 2.0, 1.67)))
    assert(p("v") == ((4L, 0L, 4L, 10.0, 40.0, 25.0)))
  }

  test("numericProfile: empty frame yields zero counts, not nulls") {
    val df = Seq.empty[(Long, Double)].toDF("k", "v")
    val p = Profile.numericProfile(df, Seq("k", "v")).collect()
    assert(p.length == 2)
    p.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
  }
}
