package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val media = Multimodal.mediaTable(spark, TestSession.sfDir)

  test("media table: binary payload + typed metadata schema") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(media.count() == 500)
  }

  test("feature extraction drops the payload and emits fixed-dim vectors") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.forall(_.features.length == 8))
    assert(!feats.toDF().columns.contains("payload")) // heavy column gone
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(rows.map(_.fingerprint).toSeq == again.map(_.fingerprint).toSeq)
  }

  test("resize: undecodable payloads degrade to metadata-only update") {
    // fixture payloads are text bytes, not images — per-row degradation
    val resized = Multimodal.resize(media, 32, 32).collect()
    assert(resized.filter(_.kind == "image").forall(m => m.width == 32 && m.height == 32))
    assert(resized.filter(_.kind == "audio").forall(_.width != 32 || true))
  }

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageDecoder: real PNG decode, per-strip RGB mean-pool") {
    // left half pure white, right half pure black, 8x4 image, dim=2
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.ImageDecoder.features(bos.toByteArray, 2)
    assert(f.toSeq == Seq(1.0f, 0.0f))
  }

  test("ImageDecoder: throws on undecodable bytes") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageDecoder.features("not an image".getBytes, 4)
    }
  }

  test("resize: decodable PNG is really rescaled and re-encoded") {
    import TestSession.spark.implicits._
    val in = Seq(Multimodal.MediaRow(1L, "image", solidPng(8, 8, 0x4080c0),
      8, 8, 0)).toDS()
    val out = Multimodal.resize(in, 4, 4).collect()(0)
    assert(out.width == 4 && out.height == 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(back.getWidth == 4 && back.getHeight == 4)
    // a solid image stays solid under any interpolation
    assert((back.getRGB(2, 2) & 0xffffff) == 0x4080c0)
  }

  test("buildGrayPng round-trips source bytes through a real PNG") {
    val bytes = "abcdefgh".getBytes("UTF-8")
    val png = Multimodal.buildGrayPng(bytes, 4, 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val got = for (y <- 0 until 2; x <- 0 until 4)
      yield img.getRaster.getSample(x, y, 0)
    assert(got == bytes.map(_ & 0xff).toSeq)
  }

  test("frame sampling emits every stride-th chunk for video rows only") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2).collect()
    assert(frames.nonEmpty)
    val vids = media.collect().filter(_.kind == "video").map(_.media_id).toSet
    assert(frames.map(_.getLong(0)).toSet.subsetOf(vids))
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }

  test("WAV round trip: AudioSystem decodes buildPcm16Wav back to the exact samples") {
    val bytes = "hello WAV".getBytes("US-ASCII")
    val samples = Multimodal.decodeWavSamples(Multimodal.buildPcm16Wav(bytes))
    assert(samples.toSeq == bytes.map(b => ((b & 0xff) - 128) * 256).toSeq)
    // full signed range survives the container: 0 -> -32768, 255 -> 32512
    val edge = Multimodal.decodeWavSamples(
      Multimodal.buildPcm16Wav(Array(0.toByte, 255.toByte, 128.toByte)))
    assert(edge.toSeq == Seq(-32768, 32512, 0))
  }

  test("WavDecoder: per-strip mean |amplitude|, hand-computed") {
    // two strips: [-32768, -32768] and [32512, 32512] -> means 1.0 and
    // 32512/32768 exactly
    val wav = Multimodal.buildPcm16Wav(
      Array(0.toByte, 0.toByte, 255.toByte, 255.toByte))
    val f = Multimodal.WavDecoder.features(wav, 2)
    assert(f(0) == 1.0f)
    assert(f(1) == (32512.0 / 32768.0).toFloat)
  }

  test("audioStatsQuery: real decode stats match a local recompute") {
    val out = Multimodal.audioStatsQuery(spark, TestSession.sfDir).collect()
    assert(out.nonEmpty)
    val texts = Tables.load(spark, TestSession.sfDir, "documents")
      .filter(org.apache.spark.sql.functions.expr(
        "doc_id % 3 = 1 AND text IS NOT NULL AND length(text) > 0"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == texts.size)
    out.take(20).foreach { r =>
      val s = texts(r.getLong(0)).getBytes("UTF-8").map(b => ((b & 0xff) - 128) * 256)
      assert(r.getInt(1) == s.length)
      assert(r.getLong(2) == s.map(_.toLong).sum)
      assert(r.getInt(3) == s.min && r.getInt(4) == s.max)
      val zc = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(5) == zc)
    }
  }

  test("videoKeyframesQuery: frame 0 always keys; SAD threshold discriminates") {
    val rows = Multimodal.videoKeyframesQuery(spark, TestSession.sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getInt(1) == 0).foreach { r =>
      assert(r.isNullAt(2), "frame 0 has no predecessor, sad must be NULL")
      assert(r.getBoolean(3), "frame 0 must be a keyframe")
    }
    val later = rows.filter(_.getInt(1) > 0)
    assert(later.forall(!_.isNullAt(2)))
    val keyed = later.count(_.getBoolean(3))
    assert(keyed > 0 && keyed < later.length,
      s"threshold must discriminate: $keyed/${later.length} keyframes")
  }

  test("imageDhash: PNG round-trip hash equals the hash computed from source bytes") {
    val hashes = Multimodal.imageDhash(spark, TestSession.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.nonEmpty)
    val docs = Tables.load(spark, TestSession.sfDir, "documents")
      .filter("doc_id % 3 = 0 AND text IS NOT NULL AND length(text) > 0")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length == hashes.size)
    val (dw, dh) = (Multimodal.DhashW, Multimodal.DhashH)
    docs.take(25).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      def px(i: Int): Int = bytes(i % bytes.length) & 0xff
      var expected = 0L
      for (r <- 0 until dh; c <- 0 until dw / 2 - 1) {
        val left = px(r * dw + 2 * c) + px(r * dw + 2 * c + 1)
        val right = px(r * dw + 2 * c + 2) + px(r * dw + 2 * c + 3)
        if (right > left) expected |= 1L << (r * 8 + c)
      }
      assert(hashes(id) == expected,
        s"doc $id: decode-path hash ${hashes(id)} != byte-path $expected")
    }
  }

  test("imageNearDupPairs: banded candidates only, Hamming verified, exact dupes collide at 0") {
    val hashes = Multimodal.imageDhash(spark, TestSession.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Multimodal.imageNearDupPairs(spark, TestSession.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.nonEmpty, "fixture near-dup docs should collide perceptually")
    // EXACT equivalence with the brute-force ground truth: the banded
    // join must return precisely the pairs that share >= 1 of the 4
    // 14-bit bands AND sit within the Hamming bound — no false pairs,
    // no missed candidates (the all-pairs check is fine driver-side at
    // fixture scale; the operator itself must never do this)
    val ids = hashes.keys.toArray.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      x = hashes(a) ^ hashes(b)
      if (0 until 4).exists(band => ((x >> (band * 14)) & 0x3FFF) == 0)
      if java.lang.Long.bitCount(x) <= 6
    } yield (a, b) -> java.lang.Long.bitCount(x)).toMap
    assert(pairs == expected,
      s"banded pairs ${pairs.size} != brute-force ${expected.size}")
  }

  test("audioNearDupPairs: full driver-side mirror of shingle->minhash->band->verify") {
    val P = graft.operators.Dedup.P
    val docs = Tables.load(spark, TestSession.sfDir, "documents")
      .filter("text IS NOT NULL AND length(text) >= 16")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // landmarks from the SOURCE bytes (the WAV round trip is exact by
    // the buildPcm16Wav contract; the operator decodes the real WAV)
    val fps: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val bs = text.getBytes("UTF-8").map(_ & 0xff)
      val set = (0 to bs.length - 16).map { i =>
        (i until i + 16).foldLeft(0L)((acc, j) => (acc * 131L + bs(j)) % P)
      }.toSet
      id -> set
    }.toMap
    val sigs: Map[Long, IndexedSeq[Long]] = fps.map { case (id, set) =>
      id -> (0 until 8).map { s =>
        if (set.isEmpty) P
        else set.map(fp => ((2L * s + 3) * fp + (5L * s + 7)) % P).min
      }
    }
    val bandBuckets = sigs.toSeq.flatMap { case (id, sig) =>
      (0 until 4).map { b =>
        val bh = (((0L * 131 + sig(2 * b)) % P) * 131 + sig(2 * b + 1)) % P
        ((b, bh), id)
      }
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val cands = bandBuckets.flatMap(ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))).toSet
    val expected = cands.flatMap { case (a, b) =>
      val c = (fps(a) & fps(b)).size
      val (sa, sb) = (fps(a).size, fps(b).size)
      if (3L * c >= sa + sb) Some((a, b, c.toLong, (sa + sb - c).toLong)) else None
    }
    val got = graft.operators.Multimodal.audioNearDupPairs(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.nonEmpty, "fixture has char-level near-dups; expected audio pairs")
    assert(got == expected, s"operator ${got.size} pairs != mirror ${expected.size}")
    // every verified pair really is J >= 1/2
    got.foreach { case (_, _, c, u) => assert(2 * c >= u) }
  }

  test("videoNearDupPairs: full driver-side mirror over cyclic pixel-stream landmarks") {
    val P = graft.operators.Dedup.P
    val (w, h, nF, sl) = (32, 8, 3, 16)
    val streamLen = nF * w * h
    val docs = Tables.load(spark, TestSession.sfDir, "documents")
      .filter(s"doc_id % 3 = 2 AND text IS NOT NULL AND length(text) >= $sl")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    // the decoded DIB pixel stream is byte (t mod n): landmarks are the
    // cyclic 16-windows of the character codes
    val fps: Map[Long, Set[Long]] = docs.map { case (id, text) =>
      val bs = text.getBytes("US-ASCII").map(_ & 0xff)
      val n = bs.length
      val set = (0 to streamLen - sl).map { t =>
        (0 until sl).foldLeft(0L)((acc, j) => (acc * 131L + bs((t + j) % n)) % P)
      }.toSet
      id -> set
    }.toMap
    val sigs = fps.map { case (id, set) =>
      id -> (0 until 8).map { s =>
        if (set.isEmpty) P
        else set.map(fp => ((2L * s + 3) * fp + (5L * s + 7)) % P).min
      }
    }
    val buckets = sigs.toSeq.flatMap { case (id, sig) =>
      (0 until 4).map { b =>
        ((b, (((0L * 131 + sig(2 * b)) % P) * 131 + sig(2 * b + 1)) % P), id)
      }
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val cands = buckets.flatMap(ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))).toSet
    val expected = cands.flatMap { case (a, b) =>
      val c = (fps(a) & fps(b)).size
      val (sa, sb) = (fps(a).size, fps(b).size)
      if (3L * c >= sa + sb) Some((a, b, c.toLong, (sa + sb - c).toLong)) else None
    }
    val got = graft.operators.Multimodal.videoNearDupPairs(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.nonEmpty, "video class has near-dups; expected pairs")
    assert(got == expected, s"operator ${got.size} pairs != mirror ${expected.size}")
  }

  test("mediaDupClusters: union-find over the three modality edge sets, exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = pairs(Multimodal.imageNearDupPairs(spark, TestSession.sfDir)) ++
      pairs(Multimodal.audioNearDupPairs(spark, TestSession.sfDir)) ++
      pairs(Multimodal.videoNearDupPairs(spark, TestSession.sfDir))
    assert(edges.nonEmpty)
    // driver-side union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => (x, find(x))).toSet
    val got = Multimodal.mediaDupClusters(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"operator ${got.size} rows != union-find ${expected.size}")
    // a cluster spanning more than one modality's edges exists iff some
    // doc appears in two edge sources — sanity-check transitivity held
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, "cluster id must be the min doc_id")
    }
  }
}
