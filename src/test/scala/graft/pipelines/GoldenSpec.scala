package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end golden regression (SURVEY.md §5.4): pins the flagship E1
  * pipeline's output on the fixed sf0.001 input, independently of the
  * DuckDB-oracle gate. If cleansing, melt, lookup, or aggregation
  * semantics drift, these exact values move. */
class GoldenSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val out =
    TimesheetPipeline.flagship(spark, "/root/testdata/sf0.001").cache()

  // the shared session outlives this suite: a cached flagship would make
  // PlanShapeSpec see an InMemoryTableScan instead of the real plan
  override def afterAll(): Unit = { out.unpersist(); super.afterAll() }

  test("flagship sf0.001: pinned cardinality and totals") {
    assert(out.count() == 7936L)
    val agg = out.agg(
      round(sum("ore"), 2).as("total_ore"),
      countDistinct("surname").as("n_surnames"),
      min("data").as("min_d"), max("data").as("max_d")).head()
    // total hours survive melt+cleanse+agg end to end
    assert(agg.getDouble(0) > 0)
    assert(agg.getLong(1) == 51L) // 50 authors + "unknown"
    // pin the exact values so any drift is loud
    assert(agg.getDouble(0) == 45105.0, s"total_ore=${agg.getDouble(0)}")
    assert(agg.getDate(2).toString == "1994-12-26", agg.getDate(2).toString)
  }

  test("flagship sf0.001: first row pinned exactly") {
    val r = out.orderBy("data", "surname").head()
    assert(r.getDate(0).toString == "1994-12-26")
    assert(out.filter(col("data") === "1994-12-26" &&
      col("surname") === "rossi48" && col("commessa") === "SHEET-O" &&
      col("ore") === 10.0).count() == 1)
  }
}
