package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 optimization equivalence specs: every optimization that
  * changed an operator's INTERNALS (driver-resident loops with
  * distributed fallbacks, thread-cached codecs, shared tokenize passes)
  * is pinned result-identical to the form it replaced. */
class R12OptimizationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val dir = TestSession.sfDir

  // --- MediaCodec: thread-cached readers/writers == ImageIO -----------

  private def grayImg(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, (x * 7 + y * 13) % 251)
    img
  }

  test("MediaCodec.writePng is byte-identical to ImageIO.write(png)") {
    val img = grayImg(24, 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(graft.sources.MediaCodec.writePng(img).toSeq == bos.toByteArray.toSeq)
  }

  test("MediaCodec.writeJpeg is byte-identical to ImageIO.write(jpg)") {
    val img = grayImg(24, 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(graft.sources.MediaCodec.writeJpeg(img).toSeq == bos.toByteArray.toSeq)
  }

  private def pixels(img: java.awt.image.BufferedImage): Seq[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    for (y <- 0 until h; x <- 0 until w) yield img.getRGB(x, y)
  }

  test("MediaCodec.readImage decodes pixel-identically to ImageIO.read " +
    "for PNG and JPEG, and keeps the null-on-unrecognized contract") {
    val img = grayImg(24, 16)
    for (fmt <- Seq("png", "jpg")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val bytes = bos.toByteArray
      val viaImageIO = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val viaCodec = graft.sources.MediaCodec.readImage(bytes)
      assert(pixels(viaCodec) == pixels(viaImageIO), fmt)
    }
    assert(graft.sources.MediaCodec.readImage("not an image".getBytes) == null)
    assert(graft.sources.MediaCodec.readImage(null) == null)
  }

  test("MediaCodec readers survive reuse across many decodes and threads") {
    val img = grayImg(20, 12)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val expect = pixels(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png)))
    // r13 (ADVICE): a failed assert inside a spawned Thread kills only
    // that thread — collect failures and rethrow after join, so this
    // test can actually fail
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        try {
          for (_ <- 1 to 50)
            assert(pixels(graft.sources.MediaCodec.readImage(png)) == expect)
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }

  // --- BPE: driver-resident trainer == distributed trainer ------------

  test("bpeTrain driver path (vocab under cap) computes the identical " +
    "merge sequence and final vocabulary as the distributed path") {
    import graft.operators.TextAnalytics
    for (batch <- Seq(1, 4)) {
      val (mDriver, vDriver, rDriver) =
        TextAnalytics.bpeTrain(spark, dir, nMerges = 8, batch = batch)
      val (mDist, vDist, rDist) =
        TextAnalytics.bpeTrain(spark, dir, nMerges = 8, batch = batch,
          driverVocabCap = 0) // forces the distributed per-round loop
      assert(mDriver == mDist, s"merge sequence, batch=$batch")
      assert(rDriver == rDist)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getString(1), r.getLong(2))
      assert(vDriver.collect().map(key).sortBy(_._1).toSeq ==
        vDist.collect().map(key).sortBy(_._1).toSeq, s"vocab, batch=$batch")
    }
  }

  // --- perceptron: histogram-driver epochs == distributed epochs ------

  test("perceptron driver-histogram training equals the distributed " +
    "per-epoch fallback bit-for-bit") {
    import graft.operators.TextAnalytics
    val viaDriver = TextAnalytics.perceptronScoredFeats(spark, dir)
      .orderBy(col("doc_id")).collect().toSeq
    val viaDist = TextAnalytics.perceptronScoredFeats(spark, dir, histCap = 0)
      .orderBy(col("doc_id")).collect().toSeq
    assert(viaDriver == viaDist)
  }

  // --- connected components: driver union-find == star contraction ----

  test("connectedComponents driver union-find equals the distributed " +
    "star-contraction on chains, triangles and disjoint components") {
    import spark.implicits._
    // 1-2-3 chain, 10-11-12 triangle, 20-21 pair, plus a dupe edge
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 20L), (3L, 2L)).toDF("u", "v")
    val viaDriver = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaDist = graft.operators.Dedup.connectedComponents(pairs,
        driverEdgeCap = 0) // forces the star-contraction loop
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaDriver == viaDist)
    assert(viaDriver == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L)))
  }

  test("dupClusters via the driver union-find matches the distributed " +
    "path on the fixture") {
    import graft.operators.Dedup
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val a = Dedup.dupClusters(spark, dir).collect().map(key).toSeq
    val pairs = Dedup.jaccardPairs(spark, dir)
      .select(col("a_id").as("u"), col("b_id").as("v"))
    val b = Dedup.connectedComponents(pairs, driverEdgeCap = 0)
      .orderBy(col("doc_id")).collect().map(key).toSeq
    assert(a == b)
  }

  // --- shared tokenize passes: restructured queries, same results -----

  test("bpeTokenize's shared tokenize pass feeds the trainer the same " +
    "word frequencies as a fresh corpus scan (spot: totals line up)") {
    import graft.operators.TextAnalytics
    val out = TextAnalytics.bpeTokenize(spark, dir).agg(
      sum(col("n_words")), sum(col("n_subwords"))).collect()(0)
    val words = Tables.loadWide(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .filter(col("w") =!= "").count()
    assert(out.getLong(0) == words)
    assert(out.getLong(1) >= words) // every word is >= 1 subword
  }
}
