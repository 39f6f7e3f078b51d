package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zValue matches the reference interleave on random inputs") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong)) ++
      Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1), 21),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zOrdered: partitions cover disjoint z-ranges, tight in both dims") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(4000)((rnd.nextInt(1024), rnd.nextInt(1024)))
      .toDF("x", "y")
    val parts = Layout.zOrdered(df, "x", "y", numParts = 8, bits = 10)
      .select(spark_partition_id().as("pid"),
        Layout.zValue(col("x"), col("y"), 10).as("z"),
        col("x"), col("y"))
      .groupBy("pid")
      .agg(min("z").as("zmin"), max("z").as("zmax"),
        max("x").minus(min("x")).as("xspan"),
        max("y").minus(min("y")).as("yspan"),
        count(lit(1)).as("n"))
      .collect()
      .sortBy(_.getAs[Long]("zmin"))
    // range partitioning on z: consecutive partitions never overlap
    parts.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("zmax") <= b.getAs[Long]("zmin"))
      case _ =>
    }
    // z-locality: an average partition (1/8 of z-space) spans far less
    // than the full 0..1023 domain in each dimension; a random split
    // would span ~1023 in both. Generous bound — locality, not exactness.
    val avgX = parts.map(_.getAs[Int]("xspan").toDouble).sum / parts.length
    val avgY = parts.map(_.getAs[Int]("yspan").toDouble).sum / parts.length
    assert(avgX < 700 && avgY < 700, s"avg spans $avgX / $avgY")
  }

  test("hilbertValue: bijective on the grid, codegen == interpreted, neighbors adjacent") {
    import graft.expressions.HilbertIndex
    // order-3 curve: all 64 cells of the 8x8 grid, indexes are a
    // permutation of 0..63 and consecutive indexes are grid neighbors
    val pts = for (x <- 0 until 8; y <- 0 until 8) yield (x, y)
    val byD = pts.map { case (x, y) =>
      HilbertIndex.xy2d(x, y, 3) -> ((x, y))
    }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until 64L), "must be a bijection onto 0..63")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step to a grid neighbor: ($x1,$y1)->($x2,$y2)")
    case _ =>
    }
    // the codegen'd column path agrees with the interpreted walk
    val df = pts.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits = 3).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == HilbertIndex.xy2d(x, y, 3))
    }
  }

  test("hilbert locality beats morton at the seam") {
    // the Z curve's worst seam: crossing the half-grid boundary jumps
    // diagonally; Hilbert stays connected. Measure avg extent per
    // 16-index bucket over the full order-4 grid (16x16)
    import graft.expressions.HilbertIndex
    val pts = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    def avgExtent(index: (Int, Int) => Long): Double = {
      val buckets = pts.groupBy { case (x, y) => index(x, y) / 16 }
      val spans = buckets.values.map { cell =>
        (cell.map(_._1).max - cell.map(_._1).min) +
          (cell.map(_._2).max - cell.map(_._2).min)
      }
      spans.sum.toDouble / spans.size
    }
    val h = avgExtent((x, y) => HilbertIndex.xy2d(x, y, 4))
    val z = avgExtent((x, y) =>
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum.toLong)
    assert(h <= z, s"hilbert $h should not exceed morton $z")
    assert(h == 6.0, s"every 16-cell hilbert bucket is a 3+3-extent square: $h")
  }

  test("buildVocab: frequency-ranked contiguous ids, token tie-break") {
    val docs = Seq("b b b a a c", "a b d", "e a b").toDF("text")
    val got = TextAnalysis.buildVocab(docs, "text", size = 4)
      .as[(String, Long, Int)].collect().toSeq
    // freq: a=4, b=5, c=1, d=1, e=1 -> top4 = b(5), a(4), c(1), d(1)
    assert(got == Seq(("b", 5L, 0), ("a", 4L, 1), ("c", 1L, 2), ("d", 1L, 3)))
  }

  test("skippingEval: sorting by the filter column concentrates the hits") {
    val df = (0L until 100L).map(i => (i, (i * 37) % 100))
      .toDF("id", "v")
    val got = Layout.skippingEval(df,
        Seq("byv" -> col("v"), "natural" -> col("id")),
        value = col("v"), lo = 0L, hi = 9L, nFiles = 10)
      .orderBy("layout").collect()
    val byv = got(0)
    assert(byv.getString(0) == "byv")
    assert(byv.getLong(1) == 10L && byv.getLong(2) == 1L)
    assert(byv.getDouble(5) == 0.9 && byv.getDouble(6) == 0.1)
    val nat = got(1)
    // an uncorrelated layout opens (far) more files for the same rows
    assert(nat.getLong(2) > 1L && nat.getDouble(5) < 0.9)
    assert(nat.getLong(3) == 100L)
  }

  test("skippingEval: keys beyond the 2^40 contract fail loud") {
    // hash-width keys would overflow (key−min)·nFiles into negative
    // file ids and a silently-wrong report — the require must fire
    val wide = Seq((0L, 1L), (1L << 60, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Layout.skippingEval(wide, Seq("wide" -> col("k")),
        value = col("v"), lo = 0L, hi = 9L, nFiles = 10)
    }
    assert(e.getMessage.contains("2^40"))
    // pre-reduced keys stay in contract
    val ok = Layout.skippingEval(
      wide.select((col("k") % (1L << 20)).as("k"), col("v")),
      Seq("red" -> col("k")), value = col("v"), lo = 0L, hi = 9L,
      nFiles = 4).collect()
    assert(ok.head.getAs[Long]("rows_total") == 2L)
  }
}
