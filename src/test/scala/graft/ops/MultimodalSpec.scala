package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("decodeStub: deterministic L1-normalized 16-bin histogram") {
    val f = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f.toSeq == Multimodal.decodeStub("hello".getBytes("UTF-8")).toSeq)
    // 'h','e','l','l','o' all in 0x60-0x6f -> bin 6 gets everything
    assert(f(6) == 1.0f)
  }

  test("mediaTable + extractFeatures: typed plumbing end to end") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-5))
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    // nBytes matches the payload length of the source text
    val doc0 = media.filter(col("id") === rows.head.id).head()
    assert(doc0.payload.length == rows.head.nBytes)
  }

  test("resize: stride-samples payloads to <= maxBytes, small ones pass through") {
    // unit behavior of the stub
    assert(Multimodal.resizeStub(Array[Byte](1, 2, 3), 8).toSeq == Seq[Byte](1, 2, 3))
    val big = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.resizeStub(big, 4).toSeq == Seq[Byte](0, 3, 6, 9)) // stride 3
    // dataset-level plumbing
    val resized = Multimodal.resize(
      Multimodal.mediaTable(spark, "/root/testdata/sf0.001"), maxBytes = 64).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.nBytesOut <= 64))
    assert(resized.forall(r => r.payload.length == r.nBytesOut))
    assert(resized.forall(r => (r.nBytesIn <= 64) == (r.nBytesIn == r.nBytesOut)))
  }

  test("sampleFrames: n frames of fixed width, offsets span the payload") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001").toDF()
      .limit(3)
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 8).collect()
    assert(frames.length == 12)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length <= 8))
    val byId = frames.groupBy(_.getAs[Long]("id"))
    byId.values.foreach(fs => assert(fs.map(_.getAs[Int]("frame_no")).sorted.toSeq == Seq(0, 1, 2, 3)))
  }
}
