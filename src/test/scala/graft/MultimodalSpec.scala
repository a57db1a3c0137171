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
}
