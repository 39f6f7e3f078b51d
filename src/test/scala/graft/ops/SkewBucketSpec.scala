package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec

class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on a skewed dataset (inner and left)") {
    // 90% of big-side rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 42, i))
      .toDF("k", "payload")
    val small = Seq((42, "hot"), (1, "a"), (3, "c"), (99, "unmatched"))
      .toDF("k", "label")
    for (how <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), how)
      val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8, how = how)
      assert(salted.count() == plain.count(), how)
      assert(salted.exceptAll(plain).count() == 0, how)
      assert(plain.exceptAll(salted).count() == 0, how)
    }
  }

  test("setJoinSumSalted == setJoinSum on skewed keys") {
    val df = (1 to 3000)
      .map(i => (if (i % 20 == 0) i % 5 else 0, s"c${i % 13}", i * 0.5))
      .toDF("k", "c", "v")
    val plain = Aggregates.setJoinSum(df, Seq("k"), "c", "v")
    val salted = Skew.setJoinSumSalted(df, Seq("k"), "c", "v", buckets = 8)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without a shuffle") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh JVM has an empty in-memory catalog but the warehouse dirs
    // survive on disk; clear them or saveAsTable hits LOCATION_ALREADY_EXISTS
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Sinks.writeBucketed(orders, "o_orderkey", 4, "b_orders")
    Sinks.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey", 4, "b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), "o_orderkey")
      .groupBy("o_orderkey")
      .agg(sum("l_quantity").as("q"), max("o_totalprice").as("p"))
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"bucketed join should be shuffle-free, found ${shuffles.size}:\n$plan")
    // and it is still correct
    assert(joined.count() ==
      lineitem.select(countDistinct("l_orderkey")).head().getLong(0))
  }
}
