package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: estimates track exact counts across cardinality regimes") {
    // three groups spanning the small-range (linear counting) and raw
    // estimator regimes for m = 256
    val rows =
      (1 to 40).map(i => ("small", s"v$i")) ++
        (1 to 800).map(i => ("mid", s"v$i")) ++
        (1 to 20000).map(i => ("large", s"v$i"))
    val df = rows.toDF("g", "v")
    val got = Sketches.hllDistinct(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Map("small" -> 40.0, "mid" -> 800.0, "large" -> 20000.0)
    exact.foreach { case (g, n) =>
      val err = math.abs(got(g) - n) / n
      // 256 registers → ~6.5% standard error; 4 sigma guard
      assert(err < 0.26, s"$g: est ${got(g)} vs $n (err $err)")
    }
  }

  test("hllDistinct: partitioning-invariant (mergeable-sketch property)") {
    val df = (1 to 3000).map(i => ("g", s"item$i")).toDF("g", "v")
    val one = Sketches.hllDistinct(df.coalesce(1), "g", col("v"))
      .head().getDouble(1)
    val many = Sketches.hllDistinct(df.repartition(7), "g", col("v"))
      .head().getDouble(1)
    assert(one == many, s"$one vs $many")
  }

  test("hllDistinct: degenerate inputs — empty frame, single value, null group") {
    val empty = Seq.empty[(String, String)].toDF("g", "v")
    assert(Sketches.hllDistinct(empty, "g", col("v")).count() == 0)
    val one = Sketches.hllDistinct(Seq(("g", "only")).toDF("g", "v"), "g", col("v"))
      .head().getDouble(1)
    // one distinct value → linear counting regime, ln(256/255)*256 ≈ 1.002
    assert(math.abs(one - 1.0) < 0.01, one.toString)
  }

  test("registers: streaming micro-batches converge to the batch sketch") {
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = Sketches.registers(ms.toDF().toDF("g", "v"), "g", col("v"))
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      ms.addData(("g", "a"), ("g", "b"), ("g", "c"))
      q.processAllAvailable()
      ms.addData(("g", "c"), ("g", "d"), ("g", "e"))
      q.processAllAvailable()
      val streamed = spark.table("hllregs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val batch = Sketches.registers(
          Seq("a", "b", "c", "c", "d", "e").map(("g", _)).toDF("g", "v"),
          "g", col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("hllDistinct: duplicates don't move the estimate") {
    val base = (1 to 500).map(i => ("g", s"x$i"))
    val dups = base ++ base ++ base
    val a = Sketches.hllDistinct(base.toDF("g", "v"), "g", col("v"))
      .head().getDouble(1)
    val b = Sketches.hllDistinct(dups.toDF("g", "v"), "g", col("v"))
      .head().getDouble(1)
    assert(a == b)
  }

  test("cms: one-sided — estimate >= exact count for every key") {
    // 40 keys with zipf-ish frequencies into a width-16 sketch: collisions
    // guaranteed, so some estimates overshoot; none may undershoot
    val rows = (1 to 40).flatMap(k => (1 to (41 - k)).map(_ => s"key$k"))
    val df = rows.toDF("v")
    val counters = Sketches.cmsCounters(df, col("v"), depth = 4, width = 16)
    val exact = df.groupBy("v").agg(count(lit(1)).as("exact"))
    val got = Sketches.cmsEstimate(counters, exact, "v", depth = 4, width = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 40)
    got.foreach { case (k, ex, est) =>
      assert(est >= ex, s"$k: est $est < exact $ex")
    }
    assert(got.exists { case (_, ex, est) => est > ex },
      "width 16 over 40 keys should collide somewhere")
  }

  test("cms: exact when the grid is collision-free, absent keys probe 0") {
    val df = (1 to 5).flatMap(k => (1 to k).map(_ => s"k$k")).toDF("v")
    val counters = Sketches.cmsCounters(df, col("v"), depth = 4, width = 4096)
    val keys = ((1 to 5).map(k => s"k$k") :+ "never-seen").toDF("v")
    val got = Sketches.cmsEstimate(counters, keys, "v", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 5).foreach(k => assert(got(s"k$k") == k))
    assert(got("never-seen") == 0L)
  }

  test("cms: counters are partitioning-invariant (mergeable)") {
    val df = (1 to 2000).map(i => s"v${i % 97}").toDF("v")
    val one = Sketches.cmsCounters(df.coalesce(1), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val many = Sketches.cmsCounters(df.repartition(7), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == many)
  }

  test("kmv: exact below k, within 3/sqrt(k) above, partitioning-invariant") {
    val rows = (1 to 30).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))
    val df = rows.toDF("g", "v")
    val got = Sketches.kmvDistinct(df, "g", col("v"), k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("small") == ((30L, 30.0)), "below k the sketch is exact")
    val (kept, est) = got("big")
    assert(kept == 64L)
    val err = math.abs(est - 5000.0) / 5000.0
    assert(err < 3.0 / math.sqrt(64.0), s"est $est err $err")
    val shuffled = Sketches.kmvDistinct(df.repartition(7), "g", col("v"), k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(shuffled("big") == est, "min-k of a union merges deterministically")
  }

  test("histogramQuantiles: tracks exact quantiles on a uniform column") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // uniform 1..10000 → true quantile ≈ p * 10000; bin width ~9.77 bounds
    // the interpolation error well under one bin
    Seq(0.5 -> 5000.0, 0.9 -> 9000.0, 0.99 -> 9900.0).foreach { case (p, want) =>
      assert(math.abs(got(p) - want) < 10.0, s"p=$p: ${got(p)} vs $want")
    }
    // partitioning-invariant (mergeable histogram)
    val again = Sketches.histogramQuantiles(
        df.repartition(7), col("v"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == again)
  }

  test("histogramQuantiles: constant column collapses to that value") {
    val df = Seq.fill(50)(42.0).toDF("v")
    val got = Sketches.histogramQuantiles(df, col("v"), Seq(0.5, 0.9))
      .collect().map(_.getDouble(1))
    assert(got.forall(_ == 42.0), got.mkString(","))
  }

  test("kmv: duplicates don't move the estimate") {
    val base = (1 to 300).map(i => ("g", s"x$i"))
    val a = Sketches.kmvDistinct(base.toDF("g", "v"), "g", col("v"))
      .head().getDouble(2)
    val b = Sketches.kmvDistinct((base ++ base).toDF("g", "v"), "g", col("v"))
      .head().getDouble(2)
    assert(a == b)
  }

  test("kmvSetOps: sketch algebra tracks exact set ops; group cap fails loud") {
    // 3 groups with known overlap: a = 1..200, b = 101..300, c = 1..50
    val rows = (1 to 200).map(i => ("a", i)) ++
      (101 to 300).map(i => ("b", i)) ++ (1 to 50).map(i => ("c", i))
    val df = rows.toDF("g", "v")
    val got = Sketches.kmvSetOps(df, "g", col("v"), k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size === 3) // all pairs, including the disjoint (b, c)
    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("exact_union") === 300L &&
      ab.getAs[Long]("exact_inter") === 100L)
    // k=64 → ~12.5% standard error; 4-sigma guard on the estimates
    assert(math.abs(ab.getAs[Double]("union_est") - 300.0) / 300.0 < 0.5)
    val bc = got(("b", "c"))
    assert(bc.getAs[Long]("exact_inter") === 0L)
    // the |groups|² guard: 11 groups over a cap of 10 must fail loud
    val many = (1 to 11).flatMap(g => (1 to 5).map(i => (s"g$g", i)))
      .toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvSetOps(many, "g", col("v"), k = 4, maxGroups = 10)
    }
    assert(e.getMessage.contains("quadratic in groups"))
  }

  test("qdigestQuantiles: exact at high k, bounded overestimate at low k") {
    // 160 values: v = i % 16, uniform over [0, 16) at levels = 4
    val df = (0 until 160).map(i => i % 16).toDF("v")
    // k >= n => tau = n/k <= 1 => only singleton merges; with uniform
    // counts 10 > tau nothing compresses: digest = exact histogram
    val exact = Sketches.qdigestQuantiles(df, col("v"),
        Seq(0.25, 0.5, 0.75), levels = 4, k = 200)
      .orderBy("p").collect()
    assert(exact.forall(_.getAs[Long]("err") == 0L))
    assert(exact.forall(_.getAs[Long]("n_nodes") == 16L))
    assert(exact.map(_.getAs[Long]("qd_est")).toSeq == Seq(3L, 7L, 11L))
    // tiny k => huge tau => everything folds toward the root: the
    // estimate can only OVERSHOOT (right endpoints absorb ranges),
    // never undershoot — the q-digest rank-error direction
    val coarse = Sketches.qdigestQuantiles(df, col("v"),
        Seq(0.25, 0.5, 0.75), levels = 4, k = 2)
      .orderBy("p").collect()
    assert(coarse.forall(_.getAs[Long]("err") >= 0L))
    assert(coarse.forall(r => r.getAs[Long]("n_nodes") <
      exact.head.getAs[Long]("n_nodes")))
    // out-of-domain values fail loud, not silently mis-binned
    val bad = Seq(17L).toDF("v")
    val ex = intercept[IllegalArgumentException] {
      Sketches.qdigestQuantiles(bad, col("v"), Seq(0.5), levels = 4, k = 4)
    }
    assert(ex.getMessage.contains("pre-quantized"))
  }

  test("qdigestFromCounts: empty histogram fails loud, not empty.last") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "cnt")
    val ex = intercept[IllegalArgumentException] {
      Sketches.qdigestFromCounts(empty, Seq(0.5), levels = 4, k = 4)
    }
    assert(ex.getMessage.contains("non-empty"), ex.getMessage)
    // all rows present but zero-counted is equally empty in rank terms
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("v", "cnt")
    val ez = intercept[IllegalArgumentException] {
      Sketches.qdigestFromCounts(zeros, Seq(0.5), levels = 4, k = 4)
    }
    assert(ez.getMessage.contains("n = 0"), ez.getMessage)
  }

  test("qdigestFromCounts: duplicate v rows SUM — union of shard histograms == whole") {
    // the documented merge law for leaf histograms: counts add. A
    // last-wins drop would desync node counts from n (the round-9
    // ADVICE finding)
    val whole = Seq((1L, 6L), (2L, 4L), (9L, 5L)).toDF("v", "cnt")
    val shardA = Seq((1L, 2L), (2L, 4L), (9L, 1L))
    val shardB = Seq((1L, 4L), (9L, 4L))
    val union = (shardA ++ shardB).toDF("v", "cnt")
    val probs = Seq(0.1, 0.5, 0.9)
    val a = Sketches.qdigestFromCounts(whole, probs, levels = 4, k = 3)
      .orderBy("p").collect().map(_.toSeq).toSeq
    val b = Sketches.qdigestFromCounts(union, probs, levels = 4, k = 3)
      .orderBy("p").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.head(1) == 15L) // n sums all rows — and nodes now agree
  }

  test("qdigestMergedQuantiles: digest-level merge never undershoots; exact at tau 0") {
    val vals = (0 until 200).map(i => (i * 7) % 16)
    val hist = (shard: Int) => vals.zipWithIndex
      .filter(_._2 % 4 == shard).map(_._1)
      .groupBy(identity).toSeq
      .map { case (v, xs) => (v.toLong, xs.size.toLong) }
      .toDF("v", "cnt")
    val shards = (0 to 3).map(hist)
    val probs = Seq(0.25, 0.5, 0.75, 0.99)
    val merged = Sketches.qdigestMergedQuantiles(shards, probs,
      levels = 4, k = 4).orderBy("p").collect()
    assert(merged.forall(_.getAs[Long]("n") == 200L))
    // never-undershoot survives the merge: counts only ever move UP the
    // tree, so every value still sits at a node covering it
    assert(merged.forall(_.getAs[Long]("err") >= 0L))
    // k > n on every side => no compression anywhere => merged digest
    // IS the exact histogram (node-identical to the whole build)
    val exactM = Sketches.qdigestMergedQuantiles(shards, probs,
      levels = 4, k = 999).orderBy("p").collect()
    val exactW = Sketches.qdigestQuantiles(vals.toDF("v"), col("v"), probs,
      levels = 4, k = 999).orderBy("p").collect()
    assert(exactM.map(_.toSeq).toSeq == exactW.map(_.toSeq).toSeq)
    assert(exactM.forall(_.getAs[Long]("err") == 0L))
  }
}
