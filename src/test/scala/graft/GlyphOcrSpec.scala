package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GlyphOcr

/** Pure-JVM tests for the bitmap-glyph OCR (no Spark session). */
class GlyphOcrSpec extends AnyFunSuite {

  test("roundtrip: every supported character survives render -> recognize") {
    val all = GlyphOcr.supported.toSeq.sortBy(identity).mkString
    assert(GlyphOcr.Parser.parse(GlyphOcr.render(all)) == all.replaceAll(" +$", ""))
  }

  test("roundtrip property: random supported-charset strings (seeded)") {
    val cs = GlyphOcr.supported.toVector
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(80))(cs(rnd.nextInt(cs.size))).mkString
      assert(GlyphOcr.Parser.parse(GlyphOcr.render(s)) == s.replaceAll(" +$", ""),
        s"roundtrip failed for: '$s'")
    }
  }

  test("multi-line: bands recognized independently, short lines padded then right-trimmed") {
    val text = "first line\nx\nlonger third line"
    assert(GlyphOcr.Parser.parse(GlyphOcr.render(text)) == text)
  }

  test("unsupported characters render (and therefore read back) as '?'") {
    assert(GlyphOcr.Parser.parse(GlyphOcr.render("café — ok")) == "caf? ? ok")
  }

  test("supplementary-plane character is ONE '?' cell (codepoints, not UTF-16 units)") {
    // U+1D11E musical symbol: two code units, one codepoint — the oracle's
    // regexp_replace substitutes per codepoint, so render must too
    assert(GlyphOcr.Parser.parse(GlyphOcr.render("a𝄞b")) == "a?b")
  }

  test("empty text renders a blank cell that reads back empty") {
    assert(GlyphOcr.Parser.parse(GlyphOcr.render("")) == "")
  }

  test("off-grid image rejected") {
    val img = new java.awt.image.BufferedImage(7, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assertThrows[IllegalArgumentException](GlyphOcr.Parser.parse(out.toByteArray))
  }

  test("undecodable bytes rejected") {
    assertThrows[IllegalArgumentException](
      GlyphOcr.Parser.parse("not an image".getBytes("UTF-8")))
  }

  test("substituteSql mirrors the renderer's substitution charset") {
    // the regex class must treat exactly GlyphOcr.supported as supported
    val re = GlyphOcr.unsupportedClass.r
    for (c <- GlyphOcr.supported)
      assert(re.findFirstIn(c.toString).isEmpty, s"supported '$c' matched unsupported class")
    for (c <- "é—;=[]{}@#$%^&*+<>/\\\"~`\n\t")
      assert(re.findFirstIn(c.toString).isDefined, s"unsupported '$c' missed by class")
  }
}
