package graft

import graft.ext.Multimodal
import graft.ext.Multimodal._
import org.apache.spark.sql.functions._

/** Plumbing tests for the multimodal binary-column surface (decode is a
  * deterministic stub; schema/batching/shapes are real).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int): Seq[MediaRow] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.fill(64 + rnd.nextInt(256))(rnd.nextInt().toByte)
      MediaRow(i.toLong, kind, payload,
        MediaMeta(s"application/x-$kind", Some(640), Some(480), Some(16000), Some(1000L)))
    }
  }

  test("decodeAndFeaturize is deterministic and shape-stable") {
    val ds = spark.createDataset(fixture(48)).repartition(4)
    val dec = new DeterministicFakeDecoder(featureDim = 16)
    val a = decodeAndFeaturize(ds, dec).collect().sortBy(_.media_id)
    val b = decodeAndFeaturize(ds, dec).collect().sortBy(_.media_id)
    assert(a.length == 48)
    assert(a.forall(_.features.length == 16))
    assert(a.forall(d => d.width >= 16 && d.width <= 1920 && d.height >= 16))
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.width == y.width &&
        x.features.sameElements(y.features) })
  }

  test("only video rows produce multiple frames; sampleFrames strides correctly") {
    val ds = spark.createDataset(fixture(30))
    val dec = new DeterministicFakeDecoder()
    val decoded = decodeAndFeaturize(ds, dec).cache()
    assert(decoded.filter(d => d.kind != "video" && d.n_frames != 1).count() == 0)
    val frames = sampleFrames(decoded, everyK = 10)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("k"),
        max("frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val nf = decoded.filter(_.kind == "video").collect().map(d => d.media_id -> d.n_frames).toMap
    perVideo.foreach { case (id, (k, mx)) =>
      assert(k == (nf(id) + 9) / 10, s"media $id stride count")
      assert(mx < nf(id))
    }
    decoded.unpersist()
  }

  test("featureTable matches the embeddings-table column shape") {
    val ds = spark.createDataset(fixture(12))
    val ft = featureTable(decodeAndFeaturize(ds, new DeterministicFakeDecoder()))
    val fields = ft.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("vec_id") == "bigint")
    assert(fields("embedding") == "array<float>")
  }

  test("mediaAudit counts nulls and empties per kind") {
    val rows = fixture(9).map(r => if (r.media_id % 3 == 0) r.copy(payload = null) else r)
    val audit = mediaAudit(spark.createDataset(rows).toDF())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.values.map(_._1).sum == 9)
    assert(audit.values.map(_._2).sum == 3) // one null per kind in this fixture
  }

  test("media schema is stable") {
    assert(Multimodal.mediaSchema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
  }

  test("resize clamps into the bounding box preserving aspect ratio") {
    val decoded = Multimodal.decodeAndFeaturize(
      spark.createDataset(fixture(40)), new Multimodal.DeterministicFakeDecoder())
    val resized = Multimodal.resize(decoded, 256, 256).collect()
    assert(resized.nonEmpty)
    val orig = decoded.collect().map(d => d.media_id -> d).toMap
    resized.foreach { d =>
      assert(d.width <= 256 && d.height <= 256 && d.width >= 1 && d.height >= 1)
      val o = orig(d.media_id)
      if (o.width <= 256 && o.height <= 256) // already inside: untouched
        assert(d.width == o.width && d.height == o.height)
      else { // aspect ratio preserved within integer truncation
        val r0 = o.width.toDouble / o.height
        val r1 = d.width.toDouble / d.height
        assert(math.abs(r0 - r1) / r0 < 0.05, s"${o.width}x${o.height} -> ${d.width}x${d.height}")
      }
    }
  }

  test("audioWindows grids audio rows by metadata duration; tails clamp") {
    val ds = spark.createDataset(fixture(12)) // kinds cycle image/audio/video
    val w = Multimodal.audioWindows(ds, windowMs = 300, strideMs = 200).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val audioIds = fixture(12).filter(_.kind == "audio").map(_.media_id).toSet
    assert(w.map(_._1).toSet == audioIds) // only audio rows window
    // fixture duration is 1000 ms → starts 0,200,…,800; ends clamp to 1000
    w.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == Seq(0L, 200L, 400L, 600L, 800L))
      assert(sorted.map(_._4).toSeq == Seq(300L, 500L, 700L, 900L, 1000L))
      assert(sorted.map(_._2).toSeq == (0L until 5L))
    }
  }

  test("fromBinaryFiles: extension parses from the basename, not the full path") {
    val df = Seq(
      ("s3://bucket/v1.2/readme", Array[Byte](1)),       // dotted dir, no ext
      ("file:/data/v2.0/clip.MP4", Array[Byte](2)),      // ext after dotted dir
      ("/plain/song.flac", Array[Byte](3)),
      ("/no/extension/anywhere", Array[Byte](4))
    ).toDF("path", "content")
    val rows = Multimodal.fromBinaryFiles(df).collect()
      .map(r => r.kind -> r.meta.mime).toMap
    // note: collect keyed by kind works because all kinds are distinct here
    val byPath = Multimodal.fromBinaryFiles(df).collect()
    assert(byPath.count(_.kind == "binary") == 2)
    assert(rows("video") == "video/mp4")
    assert(rows("audio") == "audio/flac")
    assert(byPath.filter(_.kind == "binary")
      .forall(_.meta.mime == "application/octet-stream"))
  }

  test("perceptual near-dup: duplicated payloads pair at hamming 0; banding equals brute force") {
    import graft.ext.VectorOps
    // media corpus with PLANTED dups: two pairs of byte-identical payloads
    // under different ids — identical bytes decode to identical features
    val base = fixture(20)
    val rows = base ++ Seq(
      base(3).copy(media_id = 100L),
      base(7).copy(media_id = 101L))
    val feats = featureTable(decodeAndFeaturize(
      spark.createDataset(rows), new DeterministicFakeDecoder(16)))
    val pairs = VectorOps.perceptualDupPairs(feats, hammingMax = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 100L)) && pairs.contains((7L, 101L)),
      s"planted dups must pair at hamming 0, got $pairs")
    // banded plan ≡ brute force at the pigeonhole threshold, on a frame
    // with REAL near-dup structure: synthetic neighbors 3 sign-flips away
    val sigs = VectorOps.featureSimhash(feats).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unconditional sign flip on dims 0-2 (constant magnitude, so a value
    // near zero can't dodge the flip): exactly 3 signature bits differ
    val near = feats.selectExpr("vec_id + 1000 AS vec_id",
      """transform(embedding, (x, i) -> IF(i < 3,
        |  IF(x > 0D, CAST(-0.5 AS FLOAT), CAST(0.5 AS FLOAT)), x)) AS embedding""".stripMargin)
    val all = feats.unionByName(near)
    val banded = VectorOps.perceptualDupPairs(all, hammingMax = 7).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val allSigs = VectorOps.featureSimhash(all).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val brute = (for {
      (i, si) <- allSigs; (j, sj) <- allSigs if i < j
      h = java.lang.Long.bitCount(si ^ sj) if h <= 7
    } yield (i, j) -> h).toMap
    assert(banded == brute,
      s"banded ${banded.size} pairs vs brute ${brute.size}")
    assert(brute.nonEmpty, "synthetic 3-flip neighbors must produce pairs")
    // each original pairs with its 3-flip neighbor at exactly hamming 3
    sigs.keys.foreach { id =>
      assert(banded.get((id, id + 1000)).contains(3), s"vec $id neighbor")
    }
  }

  test("ShaSignatureDecoder: sign signature equals a direct SHA-256 nibble recompute") {
    // the m02 decode stand-in must be exactly recomputable from the
    // payload bytes by ANY engine with sha256 — pin feature values and
    // the induced e17 sign bits against a direct MessageDigest walk
    val ds = spark.createDataset(fixture(24))
    val dec = new ShaSignatureDecoder
    val out = decodeAndFeaturize(ds, dec).collect().sortBy(_.media_id)
    val byId = fixture(24).map(r => r.media_id -> r.payload).toMap
    out.foreach { d =>
      val dig = java.security.MessageDigest.getInstance("SHA-256")
        .digest(byId(d.media_id))
      (0 until 60).foreach { i =>
        val b = dig(i / 2) & 0xff
        val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
        assert(d.features(i) == (nib - 7.5f) / 8.0f,
          s"media ${d.media_id} feature $i")
        // the sign bit the e17 signature will take is nibble >= 8
        assert((d.features(i) > 0) == (nib >= 8))
      }
      assert(d.features.length == 60)
    }
    // identical payloads decode to identical features -> hamming-0 pairs
    val twin = spark.createDataset(Seq(
      MediaRow(100L, "image", byId(0L), MediaMeta("image/png", None, None, None, None)),
      MediaRow(101L, "image", byId(0L), MediaMeta("image/png", None, None, None, None))))
    val feats = featureTable(decodeAndFeaturize(ds.union(twin), dec))
    val pairs = graft.ext.VectorOps.perceptualDupPairs(feats, hammingMax = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((0L, 100L, 0)) && pairs.contains((0L, 101L, 0)) &&
      pairs.contains((100L, 101L, 0)), pairs.mkString(","))
  }

  test("end-to-end: binary files -> media table -> decode -> cosine top-k") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("media")
    val rnd = new scala.util.Random(7)
    val names = Seq("a.img", "b.img", "c.wav", "d.mp4", "notes.txt")
    names.foreach { n =>
      Files.write(dir.resolve(n), Array.fill(128 + rnd.nextInt(128))(rnd.nextInt().toByte))
    }
    val media = Multimodal.fromBinaryFiles(
      graft.sources.Formats.readBinaryFiles(spark, dir.toString)).cache()
    // extension → kind mapping, ids stable across re-reads
    val kinds = media.collect().map(r => r.kind).sorted.toSeq
    assert(kinds == Seq("audio", "binary", "image", "image", "video"))
    val again = Multimodal.fromBinaryFiles(
      graft.sources.Formats.readBinaryFiles(spark, dir.toString))
    assert(media.select("media_id").collect().map(_.getLong(0)).sorted.sameElements(
      again.select("media_id").collect().map(_.getLong(0)).sorted))
    // decoded features flow into the similarity surface (same shape as the
    // embeddings table) — brute-force cosine against the first asset
    val feats = Multimodal.featureTable(
      Multimodal.decodeAndFeaturize(media, new DeterministicFakeDecoder(16)))
    assert(feats.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    graft.functions.GraftFunctions.register(spark)
    val q = feats.orderBy("vec_id").limit(1)
      .select(col("embedding").as("qv"))
    val ranked = feats.crossJoin(broadcast(q))
      .selectExpr("vec_id", "cosine_similarity(embedding, qv) AS cos")
      .orderBy(desc("cos"), col("vec_id")).collect()
    assert(ranked.length == 5 && math.abs(ranked.head.getDouble(1) - 1.0) < 1e-6)
  }

  // Checked-in 2×2 RGB8 PNG (75 bytes): row 0 = red, green; row 1 =
  // blue, white. Hand-assembled IHDR/IDAT/IEND so the fixture is bytes,
  // not an encoder's output — the decode assertion is pixel-EXACT.
  private val png2x2: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00, 0x02,
    0x08, 0x02, 0x00, 0x00, 0x00, 0xfd, 0xd4, 0x9a, 0x73, 0x00, 0x00, 0x00,
    0x12, 0x49, 0x44, 0x41, 0x54, 0x78, 0xda, 0x63, 0xf8, 0xcf, 0xc0, 0xc0,
    0x00, 0xc2, 0x0c, 0xff, 0x81, 0x00, 0x00, 0x1f, 0xee, 0x05, 0xfb, 0xf1,
    0xab, 0xba, 0x77, 0x00, 0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae,
    0x42, 0x60, 0x82).map(_.toByte)

  private def lum(r: Int, g: Int, b: Int): Float =
    ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat

  test("ImageIoDecoder decodes the checked-in 2x2 PNG pixel-exactly; real luminance grid") {
    // pixel-exact decode through the same JDK reader the decoder uses
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png2x2))
    assert(img != null && img.getWidth == 2 && img.getHeight == 2)
    assert(img.getRGB(0, 0) == 0xffff0000 && img.getRGB(1, 0) == 0xff00ff00)
    assert(img.getRGB(0, 1) == 0xff0000ff && img.getRGB(1, 1) == 0xffffffff)
    // the 2×2 grid: one block per pixel — features ARE the luminances
    val d2 = new ImageIoDecoder(gridSize = 2).decode("image", png2x2)
    assert(d2.width == 2 && d2.height == 2 && d2.n_frames == 1)
    assert(d2.features.toSeq == Seq(
      lum(255, 0, 0), lum(0, 255, 0), lum(0, 0, 255), lum(255, 255, 255)))
    // a grid wider than the image clamps blocks to ≥1 pixel (replication)
    val d4 = new ImageIoDecoder(gridSize = 4).decode("image", png2x2)
    val Seq(r, g, b, w) = d2.features.toSeq
    assert(d4.features.toSeq == Seq(r, r, g, g, r, r, g, g,
      b, b, w, w, b, b, w, w))
    // garbage fails loudly, never a silent zero-vector
    val ex = intercept[IllegalArgumentException] {
      new ImageIoDecoder().decode("image", Array[Byte](1, 2, 3))
    }
    assert(ex.getMessage.contains("ImageIO"))
  }

  test("real pixels through the Spark plumbing: PNG+BMP decode -> resize -> featureTable") {
    // 8×8, left half black / right half white — block means are exactly
    // 0 and lum(white) under a 4×4 grid, so the feature path's values
    // are pinned, not just shaped
    val src = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      src.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val meta = MediaMeta("image/png", None, None, None, None)
    val ds = spark.createDataset(Seq(
      MediaRow(1L, "image", enc("png"), meta),
      MediaRow(2L, "image", enc("bmp"), meta),
      MediaRow(3L, "image", png2x2, meta))).repartition(2)
    val decoded = decodeAndFeaturize(ds, new ImageIoDecoder(gridSize = 4))
      .cache()
    val byId = decoded.collect().map(d => d.media_id -> d).toMap
    val expected = Seq.tabulate(16)(i =>
      if (i % 4 < 2) lum(0, 0, 0) else lum(255, 255, 255))
    assert(byId(1L).width == 8 && byId(1L).height == 8)
    assert(byId(1L).features.toSeq == expected)
    // the SAME pixels through a different REAL codec give the SAME
    // features — the format boundary is codec metadata, not content
    assert(byId(2L).features.toSeq == byId(1L).features.toSeq)
    assert(byId(3L).width == 2)
    // resize clamps genuine decoded dimensions (aspect preserved)
    val resized = resize(decoded, 4, 4).collect().map(d => d.media_id -> d).toMap
    assert(resized(1L).width == 4 && resized(1L).height == 4)
    assert(resized(3L).width == 2 && resized(3L).height == 2)
    // and the features flow into the similarity surface unchanged
    val feats = featureTable(decoded)
    assert(feats.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    assert(feats.count() == 3L)
  }

  test("AudioPcmDecoder: WAV roundtrip is sample-exact; window features are the integer definitions") {
    // known samples: one positive/negative alternation in window 0,
    // a constant run in window 1 — features computable by hand
    val smp: Array[Short] = (Array.fill(8)(Seq(100, -200)).flatten ++
      Array.fill(16)(300)).map(_.toShort)
    val wav = Multimodal.encodePcm16Wav(8000, smp)
    // container sanity: the JDK's own reader parses our header
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate == 8000f &&
      in.getFormat.getChannels == 1 &&
      in.getFormat.getSampleSizeInBits == 16)
    val d = new Multimodal.AudioPcmDecoder(16).decode("audio", wav)
    assert(d.width == 32 && d.height == 8000 && d.n_frames == 2)
    // window 0: 8×(100+200) = 2400 abs-sum, 15 sign changes; window 1:
    // 16×300 = 4800, 0 crossings
    assert(d.features.toSeq == Seq(2400f, 4800f, 15f, 0f))
    // full int16 range survives the encode → decode roundtrip exactly
    val edge: Array[Short] =
      Array(Short.MinValue, Short.MaxValue, 0, -1, 1, -32767, 32766, 5)
    val de = new Multimodal.AudioPcmDecoder(8).decode("audio",
      Multimodal.encodePcm16Wav(16000, edge))
    assert(de.width == 8 && de.n_frames == 1)
    assert(de.features(0) ==
      edge.map(v => math.abs(v.toLong)).sum.toFloat)
    // a short tail window grids like audioWindows' clamp (3 samples)
    val dt = new Multimodal.AudioPcmDecoder(16).decode("audio",
      Multimodal.encodePcm16Wav(8000, Array[Short](1, -1, 1)))
    assert(dt.n_frames == 1 && dt.features.toSeq == Seq(3f, 2f))
    // garbage fails loudly, never a silent zero-vector
    intercept[Exception] {
      new Multimodal.AudioPcmDecoder().decode("audio", Array[Byte](9, 9, 9))
    }
  }

  test("GifFramesDecoder: animated-GIF roundtrip is frame- and pixel-exact") {
    // 3 frames of 4x4 with known pixels, incl. the 0 and 255 extremes
    val frames = Array(
      Array.tabulate(16)(i => if (i == 1) 255 else i),        // sum 374
      Array.fill(16)(200),                                    // sum 3200
      Array.tabulate(16)(i => i * 17))                        // sum 2040
    val gif = Multimodal.encodeGrayGif(4, 4, 3, frames.flatten)
    val d = new Multimodal.GifFramesDecoder().decode("video", gif)
    assert(d.width == 4 && d.height == 4 && d.n_frames == 3,
      "the decoded frame COUNT must be the container's true count")
    assert(d.features.toSeq == Seq(374f, 3200f, 2040f),
      "per-frame pixel sums must survive the palette roundtrip exactly")
    // row-POSITION exactness (a sum can't see row permutation — the
    // interlace default this encoder explicitly disables): re-read the
    // raster through the same reader and compare row-major
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val f2 = reader.read(2)
    val rowMajor = for (y <- 0 until 4; x <- 0 until 4)
      yield f2.getRGB(x, y) & 0xff
    assert(rowMajor == Seq.tabulate(16)(_ * 17),
      "decoded raster must be row-major-identical, not just sum-equal")
    reader.dispose(); iis.close()
    // single-frame containers decode with n_frames = 1 (still images
    // stay on the ImageIoDecoder path; this pins the boundary)
    val one = new Multimodal.GifFramesDecoder().decode("video",
      Multimodal.encodeGrayGif(4, 4, 1, Array.fill(16)(9)))
    assert(one.n_frames == 1 && one.features.toSeq == Seq(144f))
    // garbage fails loudly
    intercept[Exception] {
      new Multimodal.GifFramesDecoder().decode("video", Array[Byte](1, 2))
    }
  }
}
