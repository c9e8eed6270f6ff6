package graft

import graft.sources.GlyphOcr

/** Scratch profiler for the proportional-noisy decode path (not a spec).
  * Renders pages like the binary_ingest fixture does and times
  * parseProportional per font. */
object OcrProfileMain {
  def main(args: Array[String]): Unit = {
    val text = (1 to 8).map(i =>
      s"the quick brown fox jumps over the lazy dog $i times nearby").mkString("\n")
    // warm
    for (f <- Seq(GlyphOcr.FontRegular, GlyphOcr.FontBold)) {
      val b = GlyphOcr.renderProportionalNoisy(text, seed = 1, font = f)
      GlyphOcr.Parser.parseProportional(b)
    }
    for (f <- Seq(GlyphOcr.FontRegular, GlyphOcr.FontBold)) {
      val pages = (0 until 20).map(i =>
        GlyphOcr.renderProportionalNoisy(text, seed = 100 + i, font = f))
      val t0 = System.nanoTime()
      var bad = 0
      pages.foreach { b =>
        val r = GlyphOcr.Parser.parseProportional(b)
        if (r.contains('?')) bad += 1
      }
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"font=$f pages=20 total=${ms}%.1f ms avg=${ms / 20}%.2f ms bad=$bad")
    }
  }
}
