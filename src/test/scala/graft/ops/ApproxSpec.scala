package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The approximate siblings of the exact aggregates (q30/q32): at 100 TB
  * you run HLL / KLL-style sketches, not exact count-distinct / exact
  * percentiles. No DuckDB oracle (sketch outputs are engine-specific);
  * correctness = bounded error vs the exact answer.
  */
class ApproxSpec extends SparkSpec {

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct within 5% of exact (default rsd)") {
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey").as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("approx_percentile within 2% of exact percentile") {
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"$approx vs $exact")
  }
}
