package graft

/** Scratch main (r12): quantify ImageIO.read/write per-call overhead on
  * the tiny frames the multimodal operators decode, vs a cached
  * per-thread reader/writer. Not part of the driver contract. */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val w = 24; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, (x * y) % 251)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val jpg = enc("jpg"); val png = enc("png")
    val n = 20000
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"$label: ${(System.nanoTime() - t0) / 1e3 / n}%.1f us/op")
    }
    time("ImageIO.read jpg") {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    }
    time("ImageIO.read png") {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    }
    val jr = javax.imageio.ImageIO.getImageReadersByFormatName("JPEG").next()
    time("cached reader jpg") {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(jpg))
      jr.setInput(iis)
      jr.read(0)
      iis.close()
    }
    val pr = javax.imageio.ImageIO.getImageReadersByFormatName("PNG").next()
    time("cached reader png") {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png))
      pr.setInput(iis)
      pr.read(0)
      iis.close()
    }
    time("ImageIO.write jpg") {
      javax.imageio.ImageIO.write(img, "jpg", new java.io.ByteArrayOutputStream())
    }
    val jw = javax.imageio.ImageIO.getImageWritersByFormatName("JPEG").next()
    time("cached writer jpg") {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      jw.setOutput(ios)
      jw.write(img)
      ios.close()
    }
    time("ImageIO.write png") {
      javax.imageio.ImageIO.write(img, "png", new java.io.ByteArrayOutputStream())
    }
    val pw = javax.imageio.ImageIO.getImageWritersByFormatName("PNG").next()
    time("cached writer png") {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      pw.setOutput(ios)
      pw.write(img)
      ios.close()
    }
  }
}
