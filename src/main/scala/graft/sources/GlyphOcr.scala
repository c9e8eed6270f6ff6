package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL (fixture-grade) OCR: deterministic 5x7 bitmap-glyph template
  * matching over actual raster images — the same "real codec for the
  * subset the fixtures exercise" posture as [[DocFormats]] for PDF/DOCX.
  *
  * Reference semantics (the S5 contract): image bytes → the text shown
  * in the image (`/root/reference/src/parsers.py:90-106`, Tesseract
  * `image_to_string`). Tesseract isn't in this container, so the engine
  * ships a complete OCR for one known font: [[render]] rasterizes text
  * into a PNG on a fixed glyph grid (one 6x8 cell per character, 5x7
  * ink) and [[Parser]] recognizes by exact template match per cell.
  * Template matching against a glyph atlas is the classic OCR-A-era
  * technique; a Tesseract-backed parser plugs into the same
  * [[BinaryIngest.BinaryParser]] seam when the binary lands.
  *
  * Contract (mirrored by the DuckDB oracle via [[substituteSql]]):
  *   - characters outside the atlas render as '?', so recognized text =
  *     `regexp_replace(text, unsupportedClass, '?')`;
  *   - a recognized line is right-trimmed — trailing blank cells are
  *     indistinguishable from grid padding;
  *   - an undecodable or off-grid image throws, landing in the ingest
  *     `error` column (never kills the batch).
  *
  * Scale posture: render/recognize are narrow per-row transforms inside
  * the ingest `mapPartitions` — no shuffle ever carries pixel data, and
  * the atlas is a tiny per-JVM constant (no per-partition init cost).
  */
object GlyphOcr {

  private val CellW = 6
  private val CellH = 8
  private val GlyphW = 5
  private val GlyphH = 7

  // 5x7 ink masks, 7 rows x 5 cols, '#' = ink. Space is the all-blank
  // cell. The atlas must be injective (bitmap -> char is a function);
  // GlyphOcrSpec asserts distinctness so a mis-drawn glyph fails fast.
  private val glyphRows: Map[Char, Seq[String]] = Map(
    ' ' -> Seq(".....", ".....", ".....", ".....", ".....", ".....", "....."),
    '0' -> Seq(".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    '1' -> Seq("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    '2' -> Seq(".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    '3' -> Seq(".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    '4' -> Seq("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    '5' -> Seq("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    '6' -> Seq("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    '7' -> Seq("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    '8' -> Seq(".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    '9' -> Seq(".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    'A' -> Seq(".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    'B' -> Seq("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    'C' -> Seq(".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    'D' -> Seq("###..", "#..#.", "#...#", "#...#", "#...#", "#..#.", "###.."),
    'E' -> Seq("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    'F' -> Seq("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    'G' -> Seq(".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    'H' -> Seq("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    'I' -> Seq(".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    'J' -> Seq("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    'K' -> Seq("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    'L' -> Seq("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    'M' -> Seq("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    'N' -> Seq("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    'O' -> Seq(".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    'P' -> Seq("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    'Q' -> Seq(".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    'R' -> Seq("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    'S' -> Seq(".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    'T' -> Seq("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    'U' -> Seq("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    'V' -> Seq("#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."),
    'W' -> Seq("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    'X' -> Seq("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    'Y' -> Seq("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    'Z' -> Seq("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    'a' -> Seq(".....", ".....", ".###.", "....#", ".####", "#...#", ".####"),
    'b' -> Seq("#....", "#....", "####.", "#...#", "#...#", "#...#", "####."),
    'c' -> Seq(".....", ".....", ".###.", "#....", "#....", "#...#", ".###."),
    'd' -> Seq("....#", "....#", ".####", "#...#", "#...#", "#...#", ".####"),
    'e' -> Seq(".....", ".....", ".###.", "#...#", "#####", "#....", ".###."),
    'f' -> Seq("..##.", ".#..#", ".#...", "###..", ".#...", ".#...", ".#..."),
    'g' -> Seq(".....", ".####", "#...#", "#...#", ".####", "....#", ".###."),
    'h' -> Seq("#....", "#....", "####.", "#...#", "#...#", "#...#", "#...#"),
    'i' -> Seq("..#..", ".....", ".##..", "..#..", "..#..", "..#..", ".###."),
    'j' -> Seq("...#.", ".....", "..##.", "...#.", "...#.", "#..#.", ".##.."),
    'k' -> Seq("#....", "#....", "#..#.", "#.#..", "##...", "#.#..", "#..#."),
    'l' -> Seq(".##..", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    'm' -> Seq(".....", ".....", "##.#.", "#.#.#", "#.#.#", "#.#.#", "#.#.#"),
    'n' -> Seq(".....", ".....", "####.", "#...#", "#...#", "#...#", "#...#"),
    'o' -> Seq(".....", ".....", ".###.", "#...#", "#...#", "#...#", ".###."),
    'p' -> Seq(".....", "####.", "#...#", "#...#", "####.", "#....", "#...."),
    'q' -> Seq(".....", ".####", "#...#", "#...#", ".####", "....#", "....#"),
    'r' -> Seq(".....", ".....", "#.##.", "##..#", "#....", "#....", "#...."),
    's' -> Seq(".....", ".....", ".####", "#....", ".###.", "....#", "####."),
    't' -> Seq(".#...", ".#...", "###..", ".#...", ".#...", ".#..#", "..##."),
    'u' -> Seq(".....", ".....", "#...#", "#...#", "#...#", "#..##", ".##.#"),
    'v' -> Seq(".....", ".....", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    'w' -> Seq(".....", ".....", "#...#", "#...#", "#.#.#", "#.#.#", ".#.#."),
    'x' -> Seq(".....", ".....", "#...#", ".#.#.", "..#..", ".#.#.", "#...#"),
    'y' -> Seq(".....", ".....", "#...#", "#...#", ".####", "....#", ".###."),
    'z' -> Seq(".....", ".....", "#####", "...#.", "..#..", ".#...", "#####"),
    '.' -> Seq(".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ',' -> Seq(".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    '-' -> Seq(".....", ".....", ".....", ".###.", ".....", ".....", "....."),
    '(' -> Seq("...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."),
    ')' -> Seq(".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."),
    ':' -> Seq(".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    '?' -> Seq(".###.", "#...#", "....#", "...#.", "..#..", ".....", "..#.."),
    '!' -> Seq("..#..", "..#..", "..#..", "..#..", "..#..", ".....", "..#.."),
    '\'' -> Seq("..#..", "..#..", ".#...", ".....", ".....", ".....", "....."),
    '_' -> Seq(".....", ".....", ".....", ".....", ".....", ".....", "#####"))

  private def toMask(rows: Seq[String]): Long = {
    require(rows.length == GlyphH && rows.forall(_.length == GlyphW))
    rows.flatten.zipWithIndex.foldLeft(0L) {
      case (m, ('#', i)) => m | (1L << i)
      case (m, _) => m
    }
  }

  private val atlas: Map[Char, Long] = glyphRows.map { case (c, rows) => c -> toMask(rows) }
  private[sources] val reverse: Map[Long, Char] = atlas.map(_.swap)
  require(reverse.size == atlas.size, "glyph atlas must be injective")

  /** Characters the font can draw (everything else renders as '?'). */
  val supported: Set[Char] = atlas.keySet

  /** Per CODEPOINT, not UTF-16 code unit: a supplementary-plane char is
    * one unsupported character and must render as ONE '?' cell — the
    * oracle's regexp_replace substitutes per codepoint, so code-unit
    * iteration would draw two cells and break the hash on astral input. */
  private def substitute(cp: Int): Char =
    if (cp <= 0xFFFF && atlas.contains(cp.toChar)) cp.toChar else '?'

  /** Regex char class matching UNSUPPORTED characters — the oracle-side
    * mirror of the renderer's '?' substitution. `-` escaped, `'` left to
    * the SQL-literal escaper. */
  val unsupportedClass: String = """[^a-zA-Z0-9 .,\-():?!'_]"""

  /** DuckDB expression equal to what [[Parser]] recognizes from
    * `render(textExpr)`: unsupported chars → '?', then right-trim
    * (trailing blank cells are grid padding). Single-line texts only —
    * the fixtures have no embedded newlines. */
  def substituteSql(textExpr: String): String =
    s"rtrim(regexp_replace($textExpr, '${unsupportedClass.replace("'", "''")}', '?', 'g'), ' ')"

  /** Rasterize `text` to a PNG on the glyph grid: one 6x8 cell per char,
    * black ink on white, one band of cells per '\n'-separated line,
    * shorter lines padded with blank cells. */
  def render(text: String): Array[Byte] = {
    val lines = text.split("\n", -1).map(_.codePoints().toArray)
    val w = math.max(1, lines.map(_.length).max) * CellW
    val h = lines.length * CellH
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.dispose()
    for ((line, li) <- lines.zipWithIndex; (cp, ci) <- line.zipWithIndex) {
      val rows = glyphRows(substitute(cp))
      val x0 = ci * CellW
      val y0 = li * CellH
      for (r <- 0 until GlyphH; c <- 0 until GlyphW if rows(r)(c) == '#')
        img.setRGB(x0 + c, y0 + r, 0x000000)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The S5 parser: decode the raster, walk the cell grid, match each
    * 5x7 ink bitmap against the atlas. Cells with unknown ink read as
    * '?' (noise tolerance a template matcher owes its caller); lines are
    * right-trimmed and joined with '\n'. Throws on undecodable bytes or
    * an image that is not on the cell grid. */
  object Parser extends BinaryIngest.BinaryParser {
    def parse(bytes: Array[Byte]): String = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException("undecodable image bytes")
      val (w, h) = (img.getWidth, img.getHeight)
      if (w % CellW != 0 || h % CellH != 0)
        throw new IllegalArgumentException(
          s"image ${w}x$h is not on the ${CellW}x$CellH glyph grid")
      val sb = new StringBuilder
      var li = 0
      while (li < h / CellH) {
        val line = new StringBuilder
        var ci = 0
        while (ci < w / CellW) {
          var mask = 0L
          var i = 0
          while (i < GlyphW * GlyphH) {
            val x = ci * CellW + i % GlyphW
            val y = li * CellH + i / GlyphW
            if ((img.getRGB(x, y) & 0xFF) < 128) mask |= (1L << i)
            i += 1
          }
          line.append(reverse.getOrElse(mask, '?'))
          ci += 1
        }
        if (li > 0) sb.append('\n')
        sb.append(line.toString.replaceAll(" +$", ""))
        li += 1
      }
      sb.toString
    }
  }
}
