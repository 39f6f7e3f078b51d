package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("consistentSample: referential integrity across tables with no join") {
    val parents = (1L to 500L).toDF("pk")
    val children = (1L to 2000L).map(i => (i, i % 500 + 1)).toDF("ck", "fk")
    val keptParents = Sampling.consistentSample(parents, "pk", 20)
    val keptChildren = Sampling.consistentSample(children, "fk", 20)
    // every sampled child's parent key survives the parent's own filter
    val orphans = keptChildren
      .join(keptParents, col("fk") === col("pk"), "left_anti")
    assert(orphans.count() == 0)
    // and the sample is real: strictly between empty and everything
    val np = keptParents.count()
    assert(np > 0 && np < 500)
  }

  test("consistentSample: deterministic across runs and monotone in pct") {
    val df = (1L to 1000L).toDF("k")
    val a = Sampling.consistentSample(df, "k", 15).collect().map(_.getLong(0)).toSet
    val b = Sampling.consistentSample(df, "k", 15).collect().map(_.getLong(0)).toSet
    assert(a == b)
    val wider = Sampling.consistentSample(df, "k", 40)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("consistentSample: pct 0 keeps nothing, pct 100 keeps everything") {
    val df = (1L to 100L).toDF("k")
    assert(Sampling.consistentSample(df, "k", 0).count() == 0)
    assert(Sampling.consistentSample(df, "k", 100).count() == 100)
    intercept[IllegalArgumentException] {
      Sampling.consistentSample(df, "k", 101)
    }
  }
}
