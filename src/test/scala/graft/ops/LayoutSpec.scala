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

  test("buildVocab: frequency-ranked contiguous ids, token tie-break") {
    val docs = Seq("b b b a a c", "a b d", "e a b").toDF("text")
    val got = TextAnalysis.buildVocab(docs, "text", size = 4)
      .as[(String, Long, Int)].collect().toSeq
    // freq: a=4, b=5, c=1, d=1, e=1 -> top4 = b(5), a(4), c(1), d(1)
    assert(got == Seq(("b", 5L, 0), ("a", 4L, 1), ("c", 1L, 2), ("d", 1L, 3)))
  }
}
