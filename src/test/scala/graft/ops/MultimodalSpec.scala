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

  test("PGM: encode → decode round-trips dims and every pixel; comments skipped") {
    val b = Multimodal.encodePgm(42L)
    val (w, h, px) = Multimodal.decodePgm(b)
    assert(w == 8 + 42 % 9 && h == 8 + 42 % 7)
    assert(px.length == w * h)
    assert(px.zipWithIndex.forall { case (p, i) => p == ((42L * 7 + i * 13) % 256) })
    // a PGM written by another tool: comment line + extra whitespace
    val weird = ("P5\n# made by netpbm\n 3\t2\n255\n".getBytes("US-ASCII")
      ++ Array[Byte](0, 1, 2, 3, 4, 5))
    val (w2, h2, px2) = Multimodal.decodePgm(weird)
    assert((w2, h2) == ((3, 2)) && px2.toSeq == Seq(0, 1, 2, 3, 4, 5))
  }

  test("PNG: a REAL compressed codec round-trip — zlib container bytes, every pixel recovered") {
    val b = Multimodal.encodePng(42L)
    // genuine PNG container: 8-byte signature then IHDR
    assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G',
      b.take(8).map(x => f"${x & 0xff}%02x").mkString(" "))
    assert(new String(b.slice(12, 16), "US-ASCII") == "IHDR")
    val (w, h, px) = Multimodal.decodePng(b)
    assert(w == 8 + 42 % 9 && h == 8 + 42 % 7)
    assert(px.length == w * h)
    assert(px.zipWithIndex.forall { case (p, i) => p == ((42L * 5 + i * 11) % 256) })
    // compression is real: a flat image deflates well below raw size
    val flat = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(flat.length < 64 * 64 / 4, s"${flat.length} bytes — not compressed?")
  }

  test("PNG: half resize re-encodes through the real codec; resized pixels match the source grid") {
    val b = Multimodal.encodePng(13L)
    val (w, h, px) = Multimodal.decodePng(b)
    val rb = Multimodal.resizePngHalf(b)
    // the resized artifact is itself a REAL PNG
    assert((rb(0) & 0xff) == 0x89 && rb(1) == 'P')
    val (w2, h2, px2) = Multimodal.decodePng(rb)
    assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2)
    assert(px2.zipWithIndex.forall { case (p, j) =>
      p == px(2 * (j / w2) * w + 2 * (j % w2))
    })
  }

  test("aHash: deterministic mean-threshold bits; identical images collide, different images differ") {
    val (w, h, px) = Multimodal.decodePgm(Multimodal.encodePgm(5L))
    val bits = Multimodal.aHashBits(w, h, px)
    assert(bits.length == 64 && bits.forall(c => c == '0' || c == '1'))
    // hand-check bit 0: grid cell (0,0) samples source pixel 0
    val g = (0 until 64).map { k =>
      px(((k / 8) * h / 8) * w + ((k % 8) * w / 8))
    }
    val mean = g.sum.toDouble / 64.0
    assert((bits.charAt(0) == '1') == (g.head > mean))
    assert(bits == Multimodal.aHashBits(w, h, px)) // deterministic
    val (w2, h2, px2) = Multimodal.decodePgm(Multimodal.encodePgm(6L))
    assert(Multimodal.aHashBits(w2, h2, px2) != bits)
  }

  test("PGM: half resize keeps every second pixel in both axes, stays a valid PGM") {
    val b = Multimodal.encodePgm(7L) // 15 x 8
    val (w, h, px) = Multimodal.decodePgm(b)
    val (w2, h2, px2) = Multimodal.decodePgm(Multimodal.resizePgmHalf(b))
    assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2)
    for (y <- 0 until h2; x <- 0 until w2)
      assert(px2(y * w2 + x) == px(2 * y * w + 2 * x))
  }

  test("WAV: RIFF chunk walk recovers rate and every PCM sample; skips unknown chunks") {
    val b = Multimodal.encodeWav(13L)
    val (rate, samples) = Multimodal.decodeWav(b)
    assert(rate == 8000 && samples.length == 200 + 13 % 100)
    assert(samples.zipWithIndex.forall { case (s, i) =>
      s == ((13L * 31 + i * 17) % 65536) - 32768
    })
    // a LIST chunk (odd-sized, word-aligned) between fmt and data must be skipped
    val withList = java.nio.ByteBuffer
      .allocate(b.length + 8 + 4) // "LIST" + size + 3 bytes + pad
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    withList.put(b, 0, 36) // RIFF..WAVE..fmt chunk (12 + 24)
    withList.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // content + alignment pad
    withList.put(b, 36, b.length - 36) // data chunk
    val (rate2, samples2) = Multimodal.decodeWav(withList.array())
    assert(rate2 == rate && samples2.toSeq == samples.toSeq)
  }

  test("Y4M: header params + FRAME markers parse; luma sums match the formula") {
    val id = 5L
    val (w, h, sums) = Multimodal.decodeY4m(Multimodal.encodeY4m(id))
    assert(w == 4 + (id % 4) * 2 && h == 4 + (id % 3) * 2)
    assert(sums.length == 2 + (id % 3))
    for (k <- sums.indices) {
      val want = (0 until w * h).map(j => (id * 11 + k * 7 + j * 5) % 256).sum
      assert(sums(k) == want)
    }
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

  test("encodeWavPcm/resampleWavHalf: real container round trip at half rate") {
    val orig = Multimodal.encodeWav(7L)
    val (r0, s0) = Multimodal.decodeWav(orig)
    val (r1, s1) = Multimodal.decodeWav(Multimodal.resampleWavHalf(orig))
    assert(r1 == r0 / 2)
    assert(s1.length == (s0.length + 1) / 2)
    // decimation keeps exactly the even-index samples
    s1.indices.foreach(i => assert(s1(i) == s0(2 * i)))
    // the re-encoded container is a VALID RIFF file the reader accepts:
    // header fields round-trip (size words, fmt, data length)
    val reEnc = Multimodal.encodeWavPcm(r1, s1)
    val (r2, s2) = Multimodal.decodeWav(reEnc)
    assert(r2 == r1 && s2.toSeq == s1.toSeq)
    assert(reEnc.length == 44 + 2 * s1.length)
  }

  test("encodeWavPcm: arbitrary derived samples survive, incl. negatives") {
    val samples = Array(0, 1, -1, 32767, -32768, 1234, -4321)
    val (rate, got) = Multimodal.decodeWav(Multimodal.encodeWavPcm(4000, samples))
    assert(rate == 4000 && got.toSeq == samples.toSeq)
  }

  test("shot detection: cuts exactly at the synthesized scene boundaries") {
    for (id <- Seq(3L, 7L, 14L, 42L)) {
      val (w, h, planes) = Multimodal.decodeY4mLuma(Multimodal.encodeY4mShots(id))
      assert(w == 4 + (id % 3) * 2 && h == 4 + (id % 2) * 4)
      assert(planes.length == 6 + (id % 5))
      val expectedCuts = (1 until planes.length)
        .filter(k => (id * 13 + k * 17) % 5 == 0).toSet
      val detected = (1 until planes.length).filter { k =>
        val diff = (0 until w * h)
          .map(j => math.abs(planes(k)(j) - planes(k - 1)(j))).sum
        diff > 30L * w * h
      }.toSet
      assert(detected == expectedCuts, s"id=$id")
      // non-cut pairs carry small-but-nonzero inter-frame motion
      (1 until planes.length).filterNot(expectedCuts).foreach { k =>
        val diff = (0 until w * h)
          .map(j => math.abs(planes(k)(j) - planes(k - 1)(j))).sum
        assert(diff > 0 && diff <= 30L * w * h, s"id=$id k=$k diff=$diff")
      }
    }
  }

  test("vadSegments: runs exactly cover the above-threshold samples") {
    for (id <- Seq(2L, 9L, 33L)) {
      val (_, s) = Multimodal.decodeWav(Multimodal.encodeWavBursts(id))
      val active = s.indices.filter(i => math.abs(s(i)) > 100).toSet
      // reconstruct segments independently and compare against a direct
      // run over the decoded samples
      var runs = List.empty[(Int, Int)]
      var i = 0
      while (i < s.length) {
        if (active(i)) {
          val st = i
          while (i < s.length && active(i)) i += 1
          runs = (st, i - 1) :: runs
        } else i += 1
      }
      val expected = runs.reverse
      assert(expected.nonEmpty && expected.flatMap(r => r._1 to r._2).toSet
        == active, s"id=$id")
      // silence blocks guarantee more than one segment per clip
      assert(expected.length >= 2, s"id=$id")
    }
  }

  test("shotDetect: frame grid covers every consecutive pair, ids route to clips") {
    val got = Multimodal.shotDetect(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 10)
      .select("doc_id", "frame", "is_cut").collect()
      .groupBy(_.getLong(0))
    got.foreach { case (id, rows) =>
      assert(rows.length == (6 + (id % 5)).toInt - 1, s"id=$id")
      val cuts = rows.filter(_.getInt(2) == 1).map(_.getInt(1)).toSet
      val expected = (1 until (6 + (id % 5)).toInt)
        .filter(k => (id * 13 + k * 17) % 5 == 0).toSet
      assert(cuts == expected, s"id=$id")
    }
  }

  test("GIF round trip is exact: LZW decode returns the formula pixels") {
    for (id <- Seq(0L, 3L, 17L, 255L, 1023L)) {
      val (w, h, px) = Multimodal.decodeGif(Multimodal.encodeGif(id))
      assert(w == 8 + (id % 10).toInt && h == 8 + (id % 8).toInt)
      px.zipWithIndex.foreach { case (v, i) =>
        assert(v == ((id * 7 + i * 13) % 256).toInt, s"id=$id i=$i")
      }
      // and the container really is a GIF (LZW), not a re-labeled bitmap
      val bytes = Multimodal.encodeGif(id)
      assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    }
  }

  test("jpeg: flat-block q=1.0 round trip is bit-exact; general lossy is not") {
    (0L to 60L).foreach { id =>
      val bytes = Multimodal.encodeJpeg(id)
      // a real JPEG container (FF D8 SOI marker), not a re-labeled bitmap
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val (w, h, px) = Multimodal.decodeJpeg(bytes)
      assert(w == 8 + (id % 50).toInt && h == 8 + (id % 40).toInt)
      px.zipWithIndex.foreach { case (v, i) =>
        val bx = (i % w) / 8
        val by = (i / w) / 8
        assert(v == ((id * 31 + bx * 7 + by * 13) * 29 % 256).toInt,
          s"id=$id i=$i")
      }
    }
    // the documented boundary of the hash-oracle trick: NON-flat blocks
    // (a per-pixel gradient) do NOT round-trip bit-exactly even at
    // q=1.0 — lossy DCT is only exact when the block is DC-only. This
    // is why q323's synthesis is block-flat and why raw-pixel oracles
    // are impossible for general JPEG content.
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 256).foreach(i => img.getRaster.setSample(i % 16, i / 16, 0,
      (i * 7) % 256))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodeJpeg(0L))) // warm path; now the gradient:
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    val (_, _, gpx) = Multimodal.decodeJpeg(bos.toByteArray)
    val diffs = gpx.zipWithIndex.count { case (v, i) =>
      v != img.getRaster.getSample(i % 16, i / 16, 0)
    }
    assert(diffs > 0, "gradient unexpectedly exact — tighten the scaladoc")
    assert(back != null)
  }

  test("jpegFeatures: distributed decode matches driver-side formula stats") {
    val got = Multimodal.jpegFeatures(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(5).collect()
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = 8 + (id % 50).toInt
      val h = 8 + (id % 40).toInt
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val exp = (0 until w * h).map(i =>
        ((id * 31 + ((i % w) / 8) * 7 + ((i / w) / 8) * 13) * 29 % 256)).sum
      assert(r.getAs[Long]("px_sum") == exp)
    }
  }

  test("goertzelPower: resonates at the matching period, not off-frequency") {
    // pure period-16 cosine: energy at the 16-sample bin dwarfs 8/32
    val tone = Array.tabulate(256)(i =>
      math.round(20000 * math.cos(2 * math.Pi * i / 16)).toInt)
    val Seq(c8, c16, c32) = Multimodal.goertzelPeriods.map(_._2)
    val e8 = Multimodal.goertzelPower(tone, c8)
    val e16 = Multimodal.goertzelPower(tone, c16)
    val e32 = Multimodal.goertzelPower(tone, c32)
    assert(e16 > 100 * e8 && e16 > 100 * e32, s"$e8 $e16 $e32")
    // silence → zero energy in every bin
    val silent = Array.fill(100)(0)
    assert(Multimodal.goertzelPeriods
      .forall(p => Multimodal.goertzelPower(silent, p._2) == 0.0))
  }

  test("GIF resize round trip: re-encoded half-scale pixels are exact") {
    for (id <- Seq(0L, 7L, 42L)) {
      val (w2, h2, px) = Multimodal.decodeGif(
        Multimodal.resizeGifHalf(Multimodal.encodeGif(id)))
      val w = 8 + (id % 10).toInt
      assert(w2 == (w + 1) / 2 && h2 == (8 + (id % 8).toInt + 1) / 2)
      px.zipWithIndex.foreach { case (v, j) =>
        val src = 2 * (j / w2) * w + 2 * (j % w2)
        assert(v == ((id * 7 + src * 13) % 256).toInt, s"id=$id j=$j")
      }
    }
  }

  test("gifFeatures: distributed decode matches driver-side formula stats") {
    val got = Multimodal.gifFeatures(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 5).orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val n = (8 + (id % 10).toInt) * (8 + (id % 8).toInt)
      val s = (0 until n).map(i => (id * 7 + i * 13) % 256).sum
      assert(r.getInt(3) == n && r.getLong(4) == s)
    }
  }

  test("laplacianSharpness: moments match a driver-side reference over real bytes") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 3L, 42L, 99L)
    val imgs = ids.toDF("id").as[Long]
      .map(id => Multimodal.PgmImage(id, Multimodal.encodePgmMixedSharpness(id)))
    val got = Multimodal.laplacianSharpness(imgs, threshold = 35000.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val (w, h, px) = Multimodal.decodePgm(Multimodal.encodePgmMixedSharpness(id))
      var s = 0L; var ss = 0L
      for (y <- 1 until h - 1; x <- 1 until w - 1) {
        val i = y * w + x
        val lap = 4L * px(i) - px(i - 1) - px(i + 1) - px(i - w) - px(i + w)
        s += lap; ss += lap * lap
      }
      val n = (w - 2).toLong * (h - 2)
      val r = got(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getLong(3) == n)
      assert(r.getLong(4) == s && r.getLong(5) == ss)
      assert(r.getDouble(6) == (n * ss - s * s).toDouble / (n.toDouble * n))
    }
  }

  test("laplacianSharpness: the gate separates the synthesized classes at the shipped threshold") {
    import spark.implicits._
    val imgs = (0L until 300L).toDF("id").as[Long]
      .map(id => Multimodal.PgmImage(id, Multimodal.encodePgmMixedSharpness(id)))
    val flags = Multimodal.laplacianSharpness(imgs, threshold = 35000.0)
      .select(col("doc_id"), col("sharp")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // every sharp-texture image passes; blurred ones are MOSTLY rejected
    // (a few flat-run images still wrap often enough to clear the bar —
    // 5/167 at sf0.01 scale, measured)
    assert(flags.collect { case (id, f) if id % 3 != 0 => f }.forall(_ == 1))
    val blurred = flags.collect { case (id, f) if id % 3 == 0 => f }
    assert(blurred.count(_ == 0) >= (blurred.length * 9) / 10,
      s"blur rejection too weak: ${blurred.count(_ == 0)}/${blurred.length}")
  }
}
