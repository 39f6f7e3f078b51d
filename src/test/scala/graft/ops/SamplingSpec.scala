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

  test("clusterBalancedSample: exact per-cell quotas, full coverage, deterministic") {
    // 3 well-separated 2-d centroids; 60 vectors land 20/30/10 by
    // construction (id % 6: 0-1 -> cell 0, 2-4 -> cell 1, 5 -> cell 2)
    val cents = Array(Array(0.0, 10.0), Array(10.0, 0.0), Array(-10.0, -10.0))
    val vecs = (0L until 60L).map { i =>
      val c = if (i % 6 <= 1) cents(0) else if (i % 6 <= 4) cents(1) else cents(2)
      (i, Array(c(0) + (i % 3) * 0.1f, c(1) - (i % 5) * 0.1f).map(_.toFloat))
    }.toDF("cid", "cvec")
    val out = Sampling.clusterBalancedSample(vecs, cents, perCell = 15)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // full coverage: every input row comes back exactly once, flagged
    assert(rows.map(_._1).sorted.toSeq == (0L until 60L))
    val byCell = rows.groupBy(_._2)
    assert(byCell.keySet == Set(0L, 1L, 2L))
    assert(byCell(0L).length == 20 && byCell(1L).length == 30 && byCell(2L).length == 10)
    // quotas exact: kept = min(perCell, |cell|) per cell
    assert(byCell(0L).count(_._3) == 15) // 20 -> clipped to 15
    assert(byCell(1L).count(_._3) == 15) // 30 -> clipped to 15
    assert(byCell(2L).count(_._3) == 10) // 10 -> all kept
    // deterministic: a second run keeps the identical id set
    val again = Sampling.clusterBalancedSample(vecs, cents, perCell = 15)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
    // quota 0 keeps nothing; huge quota keeps everything
    assert(Sampling.clusterBalancedSample(vecs, cents, perCell = 0)
      .filter(col("kept")).count() == 0)
    assert(Sampling.clusterBalancedSample(vecs, cents, perCell = 1000)
      .filter(!col("kept")).count() == 0)
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
