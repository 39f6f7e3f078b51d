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

  test("temporalSplit: latest rows become test; ties break by id desc") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, "u1", ts("2024-01-01 08:00:00")),
      (2L, "u1", ts("2024-01-01 09:00:00")),
      (3L, "u1", ts("2024-01-01 10:00:00")),
      (4L, "u1", ts("2024-01-01 11:00:00")),
      (5L, "u1", ts("2024-01-01 12:00:00")), // latest -> the one test row
      (6L, "u2", ts("2024-01-01 10:00:00")), // tie on ts:
      (7L, "u2", ts("2024-01-01 10:00:00"))  // higher id wins the test slot
    ).toDF("id", "k", "t")
    val got = Sampling.temporalSplit(df, Seq("k"), "t", "id", testFrac = 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(5L) == "test")
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == "train"))
    // u2: ceil(2 * 0.2) = 1 test slot; the tie goes to id 7
    assert(got(7L) == "test" && got(6L) == "train")
    // boundary fractions
    val all = Sampling.temporalSplit(df, Seq("k"), "t", "id", 1.0)
    assert(all.filter(col("split") === "test").count() == 7)
    val none = Sampling.temporalSplit(df, Seq("k"), "t", "id", 0.0)
    assert(none.filter(col("split") === "test").count() == 0)
  }

  test("applyMixtureRates: floor + hash fractional; expected copies per cell") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => (i, "a")).toDF("id", "cell")
    val rates = Seq(("a", 2.4)).toDF("cell", "rate")
    val got = Sampling.applyMixtureRates(docs, rates, Seq("cell"), "id")
      .select("id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every doc gets 2 or 3 copies; the hash fraction lands near 40%
    assert(got.values.forall(c => c == 2 || c == 3))
    val threes = got.values.count(_ == 3)
    assert(threes > 50 && threes < 110, s"threes=$threes")
    // deterministic: a second run produces the identical assignment
    val again = Sampling.applyMixtureRates(docs, rates, Seq("cell"), "id")
      .select("id", "n_copies").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got)
    // rate below 1 downsamples: copies in {0, 1}
    val down = Sampling.applyMixtureRates(docs,
        Seq(("a", 0.3)).toDF("cell", "rate"), Seq("cell"), "id")
      .select("n_copies").collect().map(_.getInt(0))
    assert(down.forall(c => c == 0 || c == 1))
    // cells absent from the rate table drop
    assert(Sampling.applyMixtureRates(docs,
      Seq(("zzz", 1.0)).toDF("cell", "rate"), Seq("cell"), "id").count() == 0)
  }

  test("ipfMixture: fitted weights hit both uniform marginals") {
    import org.apache.spark.sql.functions._
    // skewed 2x2 mass grid: a/x dominates; raking must equalize both
    // row sums (a vs b) and column sums (x vs y) at total/2 = 50 each
    val rows = Seq.fill(60)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val df = rows.toDF("src", "lg")
    val got = Sampling.ipfMixture(df, "src", "lg", lit(1.0), iters = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val rowSum = got.toSeq.groupBy(_._1._1)
      .map { case (s, cs) => s -> cs.map(_._2._2).sum }
    val colSum = got.toSeq.groupBy(_._1._2)
      .map { case (c, cs) => c -> cs.map(_._2._2).sum }
    rowSum.values.foreach(v => assert(math.abs(v - 50.0) < 1e-6, rowSum))
    colSum.values.foreach(v => assert(math.abs(v - 50.0) < 1e-6, colSum))
    // masses preserved in the output
    assert(got(("a", "x"))._1 == 60.0 && got(("b", "y"))._1 == 10.0)
  }

  test("ipfMixture: empty cells stay zero; already-balanced grid is a no-op") {
    import org.apache.spark.sql.functions._
    // b never produces y: the dense grid contains the (b, y) cell at 0
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(10)(("b", "x"))).toDF("src", "lg")
    val got = Sampling.ipfMixture(df, "src", "lg", lit(1.0), iters = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(got.contains(("b", "y")) && got(("b", "y")) == 0.0)
    // perfectly balanced 2x2: weights == masses after any #iters
    val bal = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("src", "lg")
    Sampling.ipfMixture(bal, "src", "lg", lit(1.0), iters = 10)
      .collect().foreach(r => assert(r.getDouble(3) == 5.0, r.toString))
  }

  test("shufflePos: bijection on the full domain at small bits") {
    // bits=4 -> domain 256: every key maps to a distinct in-range pos
    val dom = 256L
    val keys = (0L until dom).toDF("k")
    for (epoch <- Seq(0, 1)) {
      val pos = keys.select(Sampling.shufflePos(col("k"), 7L, epoch, bits = 4))
        .collect().map(_.getLong(0))
      assert(pos.length == dom && pos.toSet.size == dom,
        s"epoch $epoch: not injective")
      assert(pos.forall(p => p >= 0 && p < dom), s"epoch $epoch: out of range")
    }
  }

  test("shufflePos: deterministic, epoch-distinct, seed-distinct, and shuffled") {
    val keys = (0L until 512L).toDF("k")
    def run(seed: Long, epoch: Int) =
      keys.select(col("k"), Sampling.shufflePos(col("k"), seed, epoch, bits = 8))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val a = run(42L, 0)
    assert(a.sameElements(run(42L, 0)), "re-run diverged")
    assert(!a.sameElements(run(42L, 1)), "epochs agree — not a shuffle")
    assert(!a.sameElements(run(43L, 0)), "seeds agree — not keyed")
    // genuinely scrambled: identity-order prefix broken
    assert(a.take(16).zipWithIndex.count { case (p, i) => p == i } <= 2)
  }

  test("shufflePos: out-of-domain key fails loud") {
    val bad = Seq(1L << 32).toDF("k")
    val e = intercept[Exception](
      bad.select(Sampling.shufflePos(col("k"), 1L, 0)).collect())
    assert(e.getMessage != null)
  }

  test("epochShuffle: one pos column per epoch, restricted-order injectivity on sparse keys") {
    // sparse keys (multiples of 37): positions still pairwise distinct
    val df = (0L until 200L).map(_ * 37).toDF("doc_id")
    val out = Sampling.epochShuffle(df, "doc_id", 11L, Seq(0, 1, 2))
    assert(out.columns.toSeq == Seq("doc_id", "pos_e0", "pos_e1", "pos_e2"))
    val rows = out.collect()
    (1 to 3).foreach { c =>
      val ps = rows.map(_.getLong(c))
      assert(ps.toSet.size == ps.length, s"col $c positions collide")
    }
  }
}
