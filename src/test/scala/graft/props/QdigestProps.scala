package graft.props

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Sketches

/** Invariants of the round-8 q-digest: the estimate may only OVERSHOOT
  * the exact quantile (every digest node's count sits at values ≤ its
  * right endpoint, so the first cum ≥ rank node can never answer
  * early), τ = n/k = 0 disables compression entirely (digest ≡ exact
  * histogram), and the digest is a pure function of the value multiset
  * (partitioning can never change it — the mergeability claim's
  * operational form). */
object QdigestProps extends Properties("graft.invariants.round8qd") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("round8qd-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh_").toString)
    .getOrCreate()

  private val genVals: Gen[List[Int]] =
    Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        3 -> Gen.choose(0, 63),      // bulk
        1 -> Gen.choose(48, 55),     // a hot span (skew)
        1 -> Gen.const(0))))         // a heavy head

  private val genProb: Gen[Double] = Gen.oneOf(0.1, 0.5, 0.9, 0.99)

  property("estimate never undershoots the exact quantile") =
    forAll(genVals, genProb, Gen.choose(2, 8)) { (vs, p, k) =>
      import spark.implicits._
      val df = vs.toDF("v")
      val r = Sketches.qdigestQuantiles(df, col("v"), Seq(p),
        levels = 6, k = k).head()
      r.getAs[Long]("err") >= 0L &&
        r.getAs[Long]("qd_est") <= 63L &&
        r.getAs[Long]("exact_q") == vs.sorted.apply(
          math.max(0, math.ceil(p * vs.size).toInt - 1)).toLong
    }

  property("tau = 0 (k > n) disables compression: digest is exact") =
    forAll(genVals, genProb) { (vs, p) =>
      import spark.implicits._
      val df = vs.toDF("v")
      val r = Sketches.qdigestQuantiles(df, col("v"), Seq(p),
        levels = 6, k = vs.size + 1).head()
      r.getAs[Long]("err") == 0L &&
        r.getAs[Long]("n_nodes") == vs.distinct.size.toLong
    }

  property("digest is partitioning-independent") =
    forAll(genVals, genProb, Gen.choose(2, 6)) { (vs, p, k) =>
      import spark.implicits._
      val a = Sketches.qdigestQuantiles(vs.toDF("v").repartition(7),
        col("v"), Seq(p), levels = 6, k = k).head()
      val b = Sketches.qdigestQuantiles(vs.toDF("v").repartition(2),
        col("v"), Seq(p), levels = 6, k = k).head()
      a.toSeq == b.toSeq
    }
}
