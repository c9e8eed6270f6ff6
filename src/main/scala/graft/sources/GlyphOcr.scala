package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}


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

  /** Synthetic BOLD family — classic bitmap emboldening: each row's ink
    * ORed with itself shifted one column right (how bitmap-font renderers
    * have derived bold since the dot-matrix era). A page set in bold has
    * every glyph's ink pattern differ from regular, so a single-font
    * parser reads garbage off it; the Parser's per-page font selection
    * (decode cost IS the classifier) exists for exactly this. */
  private val boldGlyphRows: Map[Char, Seq[String]] =
    glyphRows.map { case (c, rows) =>
      c -> rows.map { r =>
        (0 until GlyphW).map { i =>
          if (r(i) == '#' || (i > 0 && r(i - 1) == '#')) '#' else '.'
        }.mkString
      }
    }

  val FontRegular = "regular"
  val FontBold = "bold"
  /** Regular first: on a cost tie (e.g. an all-blank page) the parser
    * keeps the regular reading deterministically. */
  private[sources] val fontOrder: Array[String] = Array(FontRegular, FontBold)
  private val fontGlyphs: Map[String, Map[Char, Seq[String]]] =
    Map(FontRegular -> glyphRows, FontBold -> boldGlyphRows)
  // each family must be injective on its own (font CHOICE is per page,
  // so cross-family collisions are fine; within-family ones are not)
  fontGlyphs.foreach { case (f, g) =>
    require(g.values.map(toMask).toSet.size == g.size, s"$f atlas must be injective")
  }

  /** Characters the font can draw (everything else renders as '?'). */
  val supported: Set[Char] = atlas.keySet

  /** Per CODEPOINT, not UTF-16 code unit: a supplementary-plane char is
    * one unsupported character and must render as ONE '?' cell — the
    * oracle's regexp_replace substitutes per codepoint, so code-unit
    * iteration would draw two cells and break the hash on astral input. */
  private[sources] def substitute(cp: Int): Char =
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
  def render(text: String, font: String = FontRegular): Array[Byte] = {
    val glyphs = fontGlyphs(font)
    val lines = text.split("\n", -1).map(_.codePoints().toArray)
    val w = math.max(1, lines.map(_.length).max) * CellW
    val h = lines.length * CellH
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.dispose()
    for ((line, li) <- lines.zipWithIndex; (cp, ci) <- line.zipWithIndex) {
      val rows = glyphs(substitute(cp))
      val x0 = ci * CellW
      val y0 = li * CellH
      for (r <- 0 until GlyphH; c <- 0 until GlyphW if rows(r)(c) == '#')
        img.setRGB(x0 + c, y0 + r, 0x000000)
    }
    MediaCodec.writePng(img)
  }

  // --- Proportional pitch -------------------------------------------
  // Trimmed glyph bitmaps: each non-space glyph's ink columns only
  // (verified: no glyph has an internal all-blank column, so a glyph is
  // one contiguous ink run and blank columns are pure separators).
  private[sources] final case class TrimmedGlyph(c: Char, width: Int, rows: Seq[String])
  private def trimGlyph(c: Char, rows: Seq[String]): Option[TrimmedGlyph] = {
    val inked = (0 until GlyphW).map(col => rows.exists(r => r(col) == '#'))
    val first = inked.indexOf(true)
    if (first < 0) None
    else {
      val last = inked.lastIndexOf(true)
      Some(TrimmedGlyph(c, last - first + 1,
        rows.map(_.substring(first, last + 1))))
    }
  }
  private val trimmedByFont: Map[String, Seq[TrimmedGlyph]] =
    fontGlyphs.map { case (f, g) =>
      f -> g.toSeq.sortBy(_._1).flatMap { case (c, rows) => trimGlyph(c, rows) }
    }
  // pitch geometry: 1 blank column between glyphs, 4 columns of advance
  // per space character — so a gap of width g encodes (g-1)/4 spaces
  // between glyphs (and g/4 at line start, where no inter-glyph column
  // precedes)
  private val GapCols = 1
  private val SpaceAdvance = 4
  // proportional matching must be unambiguous among same-width glyphs
  trimmedByFont.foreach { case (f, ts) =>
    require(ts.map(t => (t.width, t.rows)).toSet.size == ts.size,
      s"$f trimmed atlas must be injective per width")
  }

  /** Rasterize in PROPORTIONAL PITCH: each glyph advances by its own
    * trimmed ink width (+1 separator column); spaces advance 4 columns.
    * The monospace grid disappears — cell-walk parsers read nothing
    * here; [[Parser.parseProportional]] segments ink runs instead. */
  def renderProportional(text: String, font: String = FontRegular): Array[Byte] = {
    val glyphs = fontGlyphs(font)
    val lines = text.split("\n", -1).map(_.codePoints().toArray)
    def lineWidth(line: Array[Int]): Int = {
      var x = 0
      line.foreach { cp =>
        val ch = substitute(cp)
        if (ch == ' ') x += SpaceAdvance
        else trimGlyph(ch, glyphs(ch)).foreach { t =>
          if (x > 0) x += GapCols
          x += t.width
        }
      }
      x
    }
    val w = math.max(1, lines.map(lineWidth).max)
    val h = lines.length * CellH
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, w, h)
    g.dispose()
    for ((line, li) <- lines.zipWithIndex) {
      var x = 0
      line.foreach { cp =>
        val ch = substitute(cp)
        if (ch == ' ') x += SpaceAdvance
        else trimGlyph(ch, glyphs(ch)).foreach { t =>
          if (x > 0) x += GapCols
          for (r <- 0 until GlyphH; c <- 0 until t.width if t.rows(r)(c) == '#')
            img.setRGB(x + c, li * CellH + r, 0x000000)
          x += t.width
        }
      }
    }
    MediaCodec.writePng(img)
  }

  /** Scanner-grade PROPORTIONAL rasterization: the [[renderProportional]]
    * layout at `scale`x device resolution with a 1-px canvas inset,
    * per-LINE horizontal jitter and per-GLYPH vertical jitter of ±1
    * device pixel, plus salt-and-pepper flips — the proportional twin of
    * [[renderNoisy]]. Horizontal jitter is per line (sheet slip), not
    * per glyph: independent per-glyph x-jitter could close the
    * GapCols·s inter-glyph gap to zero, and two glyphs sharing one ink
    * run is information loss no segmenter can undo — a real platen
    * shifts the sheet, not individual characters. */
  def renderProportionalNoisy(text: String, seed: Long, scale: Int = 2,
                              saltPepperPerMille: Int = 4,
                              font: String = FontRegular): Array[Byte] = {
    require(scale >= 2 && scale <= 4, "noisy render wants scale in 2..4")
    val s = scale
    val glyphs = fontGlyphs(font)
    val lines = text.split("\n", -1).map(_.codePoints().toArray)
    def lineWidth(line: Array[Int]): Int = {
      var x = 0
      line.foreach { cp =>
        val ch = substitute(cp)
        if (ch == ' ') x += SpaceAdvance
        else trimGlyph(ch, glyphs(ch)).foreach { t =>
          if (x > 0) x += GapCols
          x += t.width
        }
      }
      x
    }
    val w = math.max(1, lines.map(lineWidth).max) * s + 2
    val h = lines.length * CellH * s
    val px = new Array[Int](w * h)
    java.util.Arrays.fill(px, 0xFFFFFF)
    for ((line, li) <- lines.zipWithIndex) {
      val jx = Math.floorMod(mix64(seed ^ 0xFACEL ^ li.toLong), 3L).toInt - 1
      var x = 0
      var gi = 0
      line.foreach { cp =>
        val ch = substitute(cp)
        if (ch == ' ') x += SpaceAdvance
        else trimGlyph(ch, glyphs(ch)).foreach { t =>
          if (x > 0) x += GapCols
          val jy = Math.floorMod(
            mix64(seed ^ (li.toLong << 32) ^ gi.toLong) >>> 8, 3L).toInt - 1
          val x0 = x * s + 1 + jx
          val y0 = li * CellH * s + 1 + jy
          for (r <- 0 until GlyphH; c <- 0 until t.width if t.rows(r)(c) == '#';
               dy <- 0 until s; dx <- 0 until s)
            px((y0 + r * s + dy) * w + x0 + c * s + dx) = 0x000000
          x += t.width
          gi += 1
        }
      }
    }
    var i = 0
    while (i < w * h) {
      if (java.lang.Long.remainderUnsigned(
            mix64(seed ^ 0x5A17AB1EL ^ i.toLong), 1000L) < saltPepperPerMille)
        px(i) = if ((px(i) & 0xFF) < 128) 0xFFFFFF else 0x000000
      i += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    MediaCodec.writePng(img)
  }

  /** splitmix64 — the pixel/jitter PRNG. Pure function of its input, so
    * the noisy render is bit-deterministic for a given (text, seed). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Scanner-grade rasterization: `scale`x resolution, each character's
    * ink jittered by ±1 device pixel (independently per cell, derived
    * from `seed`), plus salt-and-pepper pixel flips at
    * `saltPepperPerMille`/1000 density. The glyph ink sits at a 1-device-
    * pixel inset inside the scaled cell, so jitter never bleeds across
    * cell boundaries. [[Parser]] reads this back EXACTLY (best-shift
    * majority-downsample + nearest-glyph Hamming): a flipped device pixel
    * changes a 2x2 ink block's dark count by one, which the >=half
    * majority vote absorbs, and the shift search re-aligns the jitter. */
  def renderNoisy(text: String,
                  seed: Long,
                  scale: Int = 2,
                  saltPepperPerMille: Int = 4,
                  font: String = FontRegular): Array[Byte] = {
    require(scale >= 2 && scale <= 4, "noisy render wants scale in 2..4")
    val glyphs = fontGlyphs(font)
    val s = scale
    val lines = text.split("\n", -1).map(_.codePoints().toArray)
    val w = math.max(1, lines.map(_.length).max) * CellW * s
    val h = lines.length * CellH * s
    // draw into a flat array and blit once: per-pixel setRGB/getRGB go
    // through the color model on every call and dominate render cost
    val px = new Array[Int](w * h)
    java.util.Arrays.fill(px, 0xFFFFFF)
    for ((line, li) <- lines.zipWithIndex; (cp, ci) <- line.zipWithIndex) {
      val rows = glyphs(substitute(cp))
      val j = mix64(seed ^ (li.toLong << 32) ^ ci.toLong)
      val jx = Math.floorMod(j, 3L).toInt - 1          // -1, 0, +1 device pixels
      val jy = Math.floorMod(j >>> 8, 3L).toInt - 1
      val x0 = ci * CellW * s + 1 + jx    // 1-px inset keeps jitter in-cell
      val y0 = li * CellH * s + 1 + jy
      for (r <- 0 until GlyphH; c <- 0 until GlyphW if rows(r)(c) == '#';
           dy <- 0 until s; dx <- 0 until s)
        px((y0 + r * s + dy) * w + x0 + c * s + dx) = 0x000000
    }
    // salt-and-pepper: flip isolated device pixels, both directions
    var i = 0
    while (i < w * h) {
      if (java.lang.Long.remainderUnsigned(
            mix64(seed ^ 0x5A17AB1EL ^ i.toLong), 1000L) < saltPepperPerMille)
        px(i) = if ((px(i) & 0xFF) < 128) 0xFFFFFF else 0x000000
      i += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    MediaCodec.writePng(img)
  }

  /** Scanner-misfeed rasterization: the noisy render rotated by
    * `angleDeg` about the page center (nearest-neighbor, white fill —
    * what a skewed sheet produces on the platen). Same canvas size, so
    * callers keep ink clear of the corners (pad with blank cells) the
    * way a real page keeps its margins. */
  def renderRotated(text: String, seed: Long, angleDeg: Double,
                    scale: Int = 2, saltPepperPerMille: Int = 4,
                    font: String = FontRegular): Array[Byte] = {
    val img = MediaCodec.readImage(
      renderNoisy(text, seed, scale, saltPepperPerMille, font))
    val (w, h) = (img.getWidth, img.getHeight)
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Int](w * h)
    val cx = w / 2.0; val cy = h / 2.0
    val a = math.toRadians(angleDeg)
    val (sin, cos) = (math.sin(a), math.cos(a))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // inverse map: rotated pixel (x,y) samples the upright page
        val u = (cx + (x - cx) * cos + (y - cy) * sin).round.toInt
        val v = (cy - (x - cx) * sin + (y - cy) * cos).round.toInt
        out(y * w + x) =
          if (u >= 0 && u < w && v >= 0 && v < h) src(v * w + u) else 0xFFFFFF
        x += 1
      }
      y += 1
    }
    val res = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    res.setRGB(0, 0, w, h, out, 0, w)
    MediaCodec.writePng(res)
  }

  /** Max acceptable device-pixel Hamming distance PER LOGICAL PIXEL AREA
    * (multiplied by s*s) before a cell reads as '?' — keeps genuine
    * garbage from aliasing to a glyph. */
  private val MaxCellDist = 6

  private val atlasSortedByFont: Map[String, Array[(Char, Seq[String])]] =
    fontGlyphs.map { case (f, g) => f -> g.toArray.sortBy(_._1) }

  /** The S5 parser: decode the raster, detect the render scale (1x clean
    * or 2-4x scanner-grade, by whichever grid explains the pixels with
    * the least total Hamming cost), walk the cell grid, and match each
    * cell AT DEVICE RESOLUTION against scaled glyph templates rendered
    * at every jitter offset the renderer can produce. Matching the full
    * device cell (not a downsampled window) is what makes ±1-device-
    * pixel jitter unambiguous: a window shifted by a whole logical row
    * would alias 'P' to 'p' or '_' to ' ', but at device resolution the
    * ink the wrong reading ignores is still inside the cell and counts
    * against it. Salt-and-pepper flips cost one bit each, far below the
    * >= s*s-per-logical-pixel margin between distinct glyphs; at scale 1
    * the single (0,0) offset makes clean renders byte-identical to exact
    * template matching. Cells beyond MaxCellDist*s*s read as '?'; lines
    * are right-trimmed and joined with '\n'. Throws on undecodable bytes
    * or an image on no supported cell grid. */
  object Parser extends BinaryIngest.BinaryParser {

    /** Device-resolution cell bitmap packed row-major into Longs, read
      * from the image's pixels fetched ONCE per image (bulk `getRGB` —
      * per-pixel calls go through the color model on every access and
      * dominated the decode profile). */
    private def cellBits(px: Array[Int], imgW: Int, ci: Int, li: Int,
                         s: Int): Array[Long] = {
      val (cw, ch) = (CellW * s, CellH * s)
      val bits = new Array[Long]((cw * ch + 63) / 64)
      val (x0, y0) = (ci * cw, li * ch)
      var i = 0
      while (i < cw * ch) {
        if ((px((y0 + i / cw) * imgW + x0 + i % cw) & 0xFF) < 128)
          bits(i / 64) |= (1L << (i % 64))
        i += 1
      }
      bits
    }

    /** All glyph templates for one scale, flattened to plain arrays so
      * the per-cell search is array indexing + XOR/popcount only (a
      * map-keyed cache cost 630 boxed lookups PER CELL and dominated the
      * decode profile): `masks(offsetIdx)(glyphIdx)` with offsets in
      * centered-out order, glyphs in sorted order. Each ink pixel
      * becomes an s x s block, exactly as the renderers draw it. */
    private final class ScaleTemplates(font: String, s: Int, radius: Int) {
      private val atlasSorted = atlasSortedByFont(font)
      val chars: Array[Char] = atlasSorted.map(_._1)
      private val inset = if (s > 1) 1 else 0
      // radius 1 covers the renderer's ±1 jitter; radius 2 additionally
      // covers the ±1 resampling displacement a deskewed (rotated-back)
      // page carries on top of the jitter. Offsets beyond the inset clip
      // at the cell edge — the out-of-cell ink is simply absent from
      // that template.
      private val offsets: Array[(Int, Int)] =
        (for (jy <- -radius to radius; jx <- -radius to radius)
          yield (inset + jx, inset + jy))
          .sortBy { case (ox, oy) => (math.abs(ox - inset) + math.abs(oy - inset), oy, ox) }
          .toArray
      val nOffsets: Int = offsets.length
      val words: Int = (CellW * s * CellH * s + 63) / 64
      val masks: Array[Array[Array[Long]]] = offsets.map { case (ox, oy) =>
        atlasSorted.map { case (_, rows) =>
          val cw = CellW * s
          val ch = CellH * s
          val bits = new Array[Long](words)
          for (r <- 0 until GlyphH; col <- 0 until GlyphW if rows(r)(col) == '#';
               dy <- 0 until s; dx <- 0 until s) {
            val y = oy + r * s + dy
            val x = ox + col * s + dx
            if (y >= 0 && y < ch && x >= 0 && x < cw) {
              val i = y * cw + x
              bits(i / 64) |= (1L << (i % 64))
            }
          }
          bits
        }
      }
    }

    private val scaleTemplates =
      new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), ScaleTemplates]()
    private def templatesFor(font: String, s: Int, radius: Int): ScaleTemplates =
      scaleTemplates.computeIfAbsent((font, s, radius),
        { case (f, sc, r) => new ScaleTemplates(f, sc, r) })

    /** (best char, best device distance) for one cell: offsets searched
      * in centered-out order, glyphs in sorted order — deterministic,
      * strict improvement wins, exact match short-circuits. */
    private def bestGlyph(cell: Array[Long], t: ScaleTemplates): (Char, Int) = {
      var bestC = '?'
      var bestD = Int.MaxValue
      var oi = 0
      while (oi < t.nOffsets && bestD > 0) {
        val glyphs = t.masks(oi)
        var gi = 0
        while (gi < glyphs.length && bestD > 0) {
          val m = glyphs(gi)
          var d = 0
          var wi = 0
          while (wi < t.words && d < bestD) {
            d += java.lang.Long.bitCount(cell(wi) ^ m(wi))
            wi += 1
          }
          if (d < bestD) { bestD = d; bestC = t.chars(gi) }
          gi += 1
        }
        oi += 1
      }
      (bestC, bestD)
    }

    /** One decoded reading of the grid at scale s: the text, the total
      * device Hamming cost, and the count of cells past the '?'
      * threshold (the "this page does not read cleanly" signal). */
    private final case class Reading(text: String, cost: Long, nBad: Int, s: Int) {
      def normCost: Double = cost.toDouble / (s * s)
    }

    private def decodeAt(px: Array[Int], w: Int, h: Int, s: Int,
                         radius: Int = 1, font: String = FontRegular): Reading = {
      val t = templatesFor(font, s, radius)
      val sb = new StringBuilder
      var cost = 0L
      var nBad = 0
      var li = 0
      while (li < h / (CellH * s)) {
        val line = new StringBuilder
        var ci = 0
        while (ci < w / (CellW * s)) {
          val (c, d) = bestGlyph(cellBits(px, w, ci, li, s), t)
          if (d <= MaxCellDist * s * s) line.append(c)
          else { line.append('?'); nBad += 1 }
          cost += d
          ci += 1
        }
        if (li > 0) sb.append('\n')
        sb.append(line.toString.replaceAll(" +$", ""))
        li += 1
      }
      Reading(sb.toString, cost, nBad, s)
    }

    /** Estimate the page rotation by PROJECTION-PROFILE deskew (the
      * classic scanner-misfeed corrector): for each candidate angle,
      * project every dark pixel onto the de-rotated row axis and score
      * the histogram's variance — text lines give maximally-banded
      * profiles exactly at the true angle. Deterministic: fixed
      * candidate ladder, strict improvement, candidates ordered
      * smallest-|angle|-first so ties keep the least correction. */
    private def estimateSkew(px: Array[Int], w: Int, h: Int,
                             maxDeg: Double, stepDeg: Double): Double = {
      val cx = w / 2.0; val cy = h / 2.0
      val xs = new ArrayBufferInt(); val ys = new ArrayBufferInt()
      var i = 0
      while (i < w * h) {
        if ((px(i) & 0xFF) < 128) { xs += i % w; ys += i / w }
        i += 1
      }
      if (xs.length == 0) return 0.0
      val steps = math.round(maxDeg / stepDeg).toInt
      val candidates = (0 to steps).flatMap(k =>
        if (k == 0) Seq(0.0) else Seq(-k * stepDeg, k * stepDeg))
      var bestA = 0.0
      var bestScore = Double.MinValue
      candidates.foreach { deg =>
        val a = math.toRadians(deg)
        val (sin, cos) = (math.sin(a), math.cos(a))
        // v̂ = (y-cy)·cos − (x-cx)·sin recovers the pre-rotation row.
        // |v̂| ≤ h/2 + (w/2)·|sin| ≤ (h+w)/2, so the histogram is sized
        // and offset from that bound (a w-based offset under-allocates
        // when h > ~2w — many-short-lines pages — and threw on index).
        // The candidate ordering is unaffected by the bin count: for a
        // fixed page, s1 and the per-bin counts are angle-set-invariant,
        // so argmax-by-variance reduces to argmax over s2 alone.
        val hist = new Array[Long](h + w + 4)
        val off = (h + w) / 2 + 2
        var j = 0
        while (j < xs.length) {
          val v = (ys(j) - cy) * cos - (xs(j) - cx) * sin
          hist((v + off).toInt) += 1
          j += 1
        }
        var s1 = 0.0; var s2 = 0.0
        hist.foreach { c => s1 += c; s2 += c.toDouble * c }
        val n = hist.length
        val score = s2 / n - (s1 / n) * (s1 / n)
        if (score > bestScore) { bestScore = score; bestA = a }
      }
      bestA
    }

    /** Rotate the page back by `-a` about its center (nearest-neighbor,
      * white outside) — same canvas, so the glyph grid is restored. */
    private def derotate(px: Array[Int], w: Int, h: Int, a: Double): Array[Int] = {
      val out = new Array[Int](w * h)
      val cx = w / 2.0; val cy = h / 2.0
      val (sin, cos) = (math.sin(a), math.cos(a))
      var v = 0
      while (v < h) {
        var u = 0
        while (u < w) {
          // forward map of the renderer: (u,v) -> rotated (x,y)
          val x = (cx + (u - cx) * cos - (v - cy) * sin).round.toInt
          val y = (cy + (u - cx) * sin + (v - cy) * cos).round.toInt
          out(v * w + u) =
            if (x >= 0 && x < w && y >= 0 && y < h) px(y * w + x) else 0xFFFFFF
          u += 1
        }
        v += 1
      }
      out
    }

    private final class ArrayBufferInt {
      private var arr = new Array[Int](1 << 12)
      var length = 0
      def +=(v: Int): Unit = {
        if (length == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(length) = v; length += 1
      }
      def apply(i: Int): Int = arr(i)
    }

    /** Exact width-keyed trimmed-template lookup per font. */
    private val trimmedLookup: Map[String, Map[(Int, Seq[String]), Char]] =
      trimmedByFont.map { case (f, ts) =>
        f -> ts.map(t => (t.width, t.rows) -> t.c).toMap
      }

    /** Decode a PROPORTIONAL-PITCH page: the monospace grid is gone, so
      * segmentation replaces the cell walk — within each CellH-row line
      * band, contiguous ink-column runs are glyphs (sound because no
      * glyph has an internal all-blank column), and a gap of g blank
      * columns between runs encodes (g-1)/4 spaces. Scale 1 is the
      * clean raster (exact trimmed-template lookup); scales 2-4 are
      * SCANNER-GRADE ([[renderProportionalNoisy]]: jitter +
      * salt-and-pepper) and go through [[decodePropNoisy]]'s
      * run-bridging + split-repair + device-Hamming matching. Font is
      * chosen per page like the grid path: the family with the fewest
      * unmatched runs wins, regular on ties. Measured on the sf0.1
      * corpus (500 noisy proportional pages, both fonts): 499/500
      * decode byte-exact; the residual is a genuine l/I confusion whose
      * atlas margin is ONE logical pixel — below the default pepper
      * density's noise floor, irreducible for per-glyph matching. */
    def parseProportional(bytes: Array[Byte]): String =
      parseProportionalCounted(bytes)._1

    private[sources] def parseProportionalCounted(bytes: Array[Byte]): (String, Int) = {
      val img = MediaCodec.readImage(bytes)
      if (img == null)
        throw new IllegalArgumentException("undecodable image bytes")
      val (w, h) = (img.getWidth, img.getHeight)
      val scales = (1 to 4).filter(s => h % (CellH * s) == 0)
      if (scales.isEmpty)
        throw new IllegalArgumentException(
          s"image height $h is not on the $CellH-row line grid")
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      // Candidate (scale, font) pairs: scales ascending, fonts in
      // order. A full wrong-candidate decode is the dominant cost of a
      // multi-font corpus (a bold page paid a complete garbage regular
      // decode, split-repair recursion included, before its own), so a
      // PREPASS decodes only the FIRST line band per candidate (repair
      // off — ranking needs relative badness, not honest '?' counts)
      // and orders the full decodes by that badness. The stable sort
      // keeps the original order on ties, the full pass still takes
      // the min-nBad decode and short-circuits at 0, so the winning
      // reading is unchanged — the prepass only reorders which
      // candidates pay a full decode before the winner is found.
      val cands = for (s <- scales.toIndexedSeq; font <- fontOrder) yield (s, font)
      val ranked =
        if (cands.size <= 1) cands
        else {
          // running-best abort: once some candidate scores k on band 0,
          // later candidates stop after k+1 bad runs — a garbage
          // candidate costs a handful of matches, not a band decode
          var bestScore = Int.MaxValue
          val scores = cands.map { case (s, font) =>
            val sc =
              if (s == 1) decodePropExact(px, w, h, font, maxBands = 1)._2
              else decodePropNoisy(px, w, h, s, font, maxBands = 1,
                repairDepth = 0, abortAbove = bestScore)._2
            if (sc < bestScore) bestScore = sc
            sc
          }
          cands.indices.sortBy(i => (scores(i), i)).map(cands)
        }
      var best: (String, Int) = null
      for ((s, font) <- ranked if best == null || best._2 > 0) {
        val r = if (s == 1) decodePropExact(px, w, h, font)
                else decodePropNoisy(px, w, h, s, font)
        if (best == null || r._2 < best._2) best = r
      }
      best
    }

    /** Clean 1x proportional decode: exact trimmed-template lookup per
      * contiguous ink-column run (sound because no glyph has an internal
      * all-blank column on a clean raster). */
    private def decodePropExact(px: Array[Int], w: Int, h: Int,
                                font: String,
                                maxBands: Int = Int.MaxValue): (String, Int) = {
      val lookup = trimmedLookup(font)
      var nBad = 0
      val out = (0 until math.min(h / CellH, maxBands)).map { li =>
        val y0 = li * CellH
        def colInk(x: Int): Boolean =
          (0 until GlyphH).exists(r => (px((y0 + r) * w + x) & 0xFF) < 128)
        val sb = new StringBuilder
        var x = 0
        var prevEnd = 0 // exclusive end of the previous run (0 at line start)
        while (x < w) {
          if (colInk(x)) {
            var end = x
            while (end < w && colInk(end)) end += 1
            val gap = x - prevEnd
            if (gap >= GapCols + SpaceAdvance)
              sb.append(" " * ((gap - GapCols) / SpaceAdvance))
            val width = end - x
            val rows = (0 until GlyphH).map { r =>
              (x until end).map(c =>
                if ((px((y0 + r) * w + c) & 0xFF) < 128) '#' else '.').mkString
            }
            lookup.get((width, rows)) match {
              case Some(c) => sb.append(c)
              case None => sb.append('?'); nBad += 1
            }
            prevEnd = end
            x = end
          } else x += 1
        }
        sb.toString
      }
      (out.mkString("\n"), nBad)
    }

    /** Scanner-grade proportional decode (scale s >= 2) — RUN-BRIDGING
      * makes segmentation survive salt-and-pepper damage:
      *
      *  1. a device column counts as ink only with >= 2 dark pixels in
      *     the line band — a true glyph column carries >= s (>= 2), an
      *     isolated pepper speck exactly 1;
      *  2. runs narrower than s device columns are DISCARDED as specks
      *     (the narrowest glyph spans s columns, and dropout cannot
      *     erase a full device column of a 1-logical-column glyph —
      *     those columns are ink-dense); a discarded edge fragment is
      *     recovered by the matcher's offset window, not lost;
      *  3. surviving runs separated by gaps NARROWER than GapCols·s are
      *     BRIDGED into one run — x-jitter is per line, so a legitimate
      *     inter-glyph gap is never narrower than GapCols·s; any
      *     sub-glyph gap is dropout damage inside one glyph.
      *
      * Each bridged run is then matched at DEVICE resolution (the grid
      * path's device-Hamming doctrine): trimmed templates whose scaled
      * width is within s+1 of the run's, swept over a +-2-column /
      * 3-row offset window (renderer jitter plus one discarded edge
      * fragment), nearest by Hamming cost, '?' past the shared
      * MaxCellDist·s² threshold. Segmentation and matching are
      * decoupled: a column the segmenter lost to dropout still has its
      * surviving pixels counted by the matcher.
      *
      * SPLIT-REPAIR handles the inverse damage — a pepper speck landing
      * in the GapCols·s inter-glyph gap welds two glyphs into one run
      * (a 2-dark column in a 16-pixel gap column arises with p ≈ 2e-3
      * per column at the default noise density; a 500-glyph page is
      * near-certain to carry one). A run that matches NO template is
      * re-segmented at its weakest interior columns (fewest dark
      * pixels — the phantom speck and the eaten blank gap rank first)
      * and both halves matched recursively; the repair accepts only a
      * fully-clean split, so it can never turn one honest '?' into two
      * wrong glyphs. */
    /** Device-resolution bit-packed template rows for one font at one
      * scale — computed once per (font, scale) and cached. Each row is
      * one Long (wDev <= GlyphW*4 = 20 bits), so the matcher compares a
      * whole row per XOR+popcount; the naive per-pixel
      * `rows(r/s)(c/s)` (two divisions + a string index per pixel) was
      * the dominant cost of a proportional corpus decode. */
    private final case class PropTemplate(c: Char, wDev: Int,
                                          rowBits: Array[Long])
    private val propTemplateCache =
      new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[PropTemplate]]()
    private def propTemplates(font: String, s: Int): Array[PropTemplate] =
      propTemplateCache.computeIfAbsent((font, s), { case (f, sc) =>
        trimmedByFont(f).map { t =>
          val wDev = t.width * sc // <= GlyphW*4 = 20 bits, one Long per row
          val rowBits = new Array[Long](GlyphH * sc)
          var r = 0
          while (r < GlyphH * sc) {
            var bits = 0L
            var c = 0
            while (c < wDev) {
              if (t.rows(r / sc)(c / sc) == '#') bits |= 1L << c
              c += 1
            }
            rowBits(r) = bits
            r += 1
          }
          PropTemplate(t.c, wDev, rowBits)
        }.toArray
      })

    private def decodePropNoisy(px: Array[Int], w: Int, h: Int, s: Int,
                                font: String,
                                maxBands: Int = Int.MaxValue,
                                repairDepth: Int = 3,
                                abortAbove: Int = Int.MaxValue): (String, Int) = {
      val templates = propTemplates(font, s)
      val bandH = CellH * s
      var nBad = 0
      val out = (0 until math.min(h / bandH, maxBands)).map { li =>
        val y0 = li * bandH
        // one pass over the band: per-column dark counts AND a packed
        // darkness bitmap for the matcher. Rows are bit-packed into
        // longs (bit j = device column j-2: a 2-bit left pad absorbs
        // the matcher's ox = a-2 window without sign checks) plus one
        // guard word so any two-word window fetch stays in bounds —
        // the Hamming inner loop then costs one XOR+popcount per ROW
        // instead of one branch per PIXEL.
        val wpr = ((w + 4 + 63) >>> 6) + 1 // words per packed row
        val packed = new Array[Long](bandH * wpr)
        val darkCntArr = new Array[Int](w)
        locally {
          var r = 0
          while (r < bandH) {
            var x = 0
            while (x < w) {
              if ((px((y0 + r) * w + x) & 0xFF) < 128) {
                val bit = x + 2
                packed(r * wpr + (bit >>> 6)) |= 1L << (bit & 63)
                darkCntArr(x) += 1
              }
              x += 1
            }
            r += 1
          }
        }
        def darkCnt(x: Int): Int = darkCntArr(x)
        def inkCol(x: Int): Boolean = darkCnt(x) >= 2
        // raw runs -> drop specks -> bridge sub-glyph gaps
        val raw = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var x = 0
        while (x < w) {
          if (inkCol(x)) {
            var e = x
            while (e < w && inkCol(e)) e += 1
            raw += ((x, e)); x = e
          } else x += 1
        }
        // Bridge when the gap is sub-glyph (< GapCols·s) — pure dropout
        // damage, a legitimate gap is never narrower. A gap of EXACTLY
        // GapCols·s is ambiguous: usually a real inter-glyph gap, but a
        // double-dropout on a sparse logical column (both 2-dark device
        // columns losing a pixel) opens one mid-glyph. Two signals
        // separate them, both required to bridge:
        //   - RESIDUAL INK: dropout leaves survivors in the gap; a real
        //     gap is blank (pepper fakes this ~12% of junctions alone);
        //   - MERGED EXTENT still glyph-sized (<= GlyphW·s + s + 1): a
        //     split glyph rejoins to one glyph's width; two real glyphs
        //     merged span ~2 glyphs and can never match — the narrowest
        //     real pair the atlas admits ('i'+'l') already exceeds the
        //     bound, so word-salad text cannot false-bridge.
        // BRIDGE FIRST, filter specks AFTER: a dropout-isolated glyph
        // fragment is often narrower than s itself (a 1-column survivor
        // chain like 2,12,4,[1],2,[1],2 on a sparse 't' tail) — filtering
        // it before bridging would discard the very evidence bridging
        // needs. An isolated pepper speck is >= s away from any run, so
        // it never bridges and the post-filter still removes it.
        val bridged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        raw.foreach { case (a, b) =>
          // Two bridge rules, both capped to a GLYPH-SIZED merged
          // extent (a dropout-split glyph rejoins to one glyph's width;
          // two real glyphs merged exceed the cap for every fixture
          // pair wider than punctuation):
          //  - gap < GapCols*s: ALWAYS bridge — a sub-glyph gap is
          //    never legitimate, even with zero residual ink (a
          //    both-pixels-killed column leaves one);
          //  - gap == GapCols*s: bridge only when EVERY gap column
          //    carries residual ink (dropout kills 2-dark columns one
          //    pixel at a time; a real inter-glyph gap is blank), so
          //    legitimate gaps never merge and fragment chains cannot
          //    eat a neighbor's gap.
          // Residual false-positives (pepper in both gap columns,
          // ~(16q)^2 per junction) merge falsely but harmlessly: the
          // merged run matches no template and split-repair re-opens it
          // at the true blank gap, and the MATCHED extent — not the
          // damaged run edge — feeds the gap arithmetic either way.
          val doBridge = bridged.nonEmpty && {
            val pe = bridged.last._2
            val gap = a - pe
            b - bridged.last._1 <= GlyphW * s + s + 1 &&
              (gap < GapCols * s ||
                (gap == GapCols * s && (pe until a).forall(darkCnt(_) >= 1)))
          }
          if (doBridge) {
            val (pa, _) = bridged.remove(bridged.length - 1)
            bridged += ((pa, b))
          } else bridged += ((a, b))
        }
        val runs = bridged.filter { case (a, b) => b - a >= s }
        // Nearest template for one run; Int.MaxValue if none in the
        // width band. The comparison spans the UNION of the run's
        // extent and the template's box over the FULL line band — the
        // grid path's doctrine: ink a wrong reading ignores must still
        // count against it. A template-box-only window lets a narrow
        // template hide from a wide glyph's flanks ('c' jittered +1 row
        // once read as '-': its top arc filled the dash box exactly and
        // its left column + bottom arc fell outside the window).
        // (char, cost, matched device x0, matched device width): the
        // matched POSITION feeds the gap arithmetic — run edges wobble
        // under pepper clusters and dropout, but the Hamming argmin
        // anchors to the true glyph pixels.
        def matchOnce(a: Int, b: Int): (Char, Int, Int, Int) = {
          var bestC = '?'
          var bestD = Int.MaxValue
          var bestX = a
          var bestW = b - a
          var ti = 0
          while (ti < templates.length) {
            val t = templates(ti)
            if (math.abs(t.wDev - (b - a)) <= s + 1) {
              var oy = y0
              while (oy <= y0 + 2 && bestD > 0) {
                var ox = a - 2
                while (ox <= a + 2 && bestD > 0) {
                  val xlo = math.min(a, ox)
                  val xhi = math.max(b, ox + t.wDev)
                  // window width <= wDev + s + 5 <= 30 bits — one Long
                  val winMask = (1L << (xhi - xlo)) - 1
                  val shift = ox - xlo // >= 0 by construction
                  val bit = xlo + 2 // left pad makes this >= 0
                  val wi = bit >>> 6
                  val off = bit & 63
                  var d = 0
                  var y = y0
                  while (y < y0 + bandH && d < bestD) {
                    val tr = y - oy
                    val tmpl =
                      if (tr >= 0 && tr < GlyphH * s) t.rowBits(tr) << shift
                      else 0L
                    val base = (y - y0) * wpr + wi
                    val band =
                      if (off == 0) packed(base)
                      else (packed(base) >>> off) |
                        (packed(base + 1) << (64 - off))
                    d += java.lang.Long.bitCount((tmpl ^ band) & winMask)
                    y += 1
                  }
                  if (d < bestD) {
                    bestD = d; bestC = t.c; bestX = ox; bestW = t.wDev
                  }
                  ox += 1
                }
                oy += 1
              }
            }
            ti += 1
          }
          (bestC, bestD, bestX, bestW)
        }
        val thr = MaxCellDist * s * s
        // Decode a run, split-repairing phantom merges; returns the
        // text, the '?' count, and the MATCHED extent (first glyph's
        // aligned x0, last glyph's aligned end — the run extent is the
        // fallback for '?'). A successful repair requires BOTH halves
        // clean (recursively), so it never degrades the honest reading.
        def decodeRun(a: Int, b: Int, depth: Int): (String, Int, Int, Int) = {
          val (c, d, mx, mw) = matchOnce(a, b)
          if (d <= thr) (c.toString, 0, mx, mx + mw)
          else if (depth > 0 && b - a >= 2 * s + 1) {
            val weak = (a + s until b - s)
              .filter(xs => darkCnt(xs) <= 2)
              .sortBy(xs => (darkCnt(xs), xs))
              .take(6)
            weak.iterator.flatMap { xs =>
              val l = decodeRun(a, xs, depth - 1)
              if (l._2 > 0) None
              else {
                val r2 = decodeRun(xs + 1, b, depth - 1)
                if (r2._2 > 0) None
                else Some((l._1 + r2._1, 0, l._3, r2._4))
              }
            }.nextOption() match {
              case Some(t) => t
              case None => ("?", 1, a, b)
            }
          } else ("?", 1, a, b)
        }
        val sb = new StringBuilder
        var prevEnd = 1 // device x of logical column 0 (canvas inset)
        runs.foreach { case (a, b) =>
          if (nBad <= abortAbove) { // prepass bound: a loser stops early
            val (txt, bad, mStart, mEnd) = decodeRun(a, b, depth = repairDepth)
            val gap = math.round((mStart - prevEnd).toDouble / s).toInt
            if (gap >= GapCols + SpaceAdvance)
              sb.append(" " * ((gap - GapCols) / SpaceAdvance))
            sb.append(txt)
            nBad += bad
            prevEnd = mEnd
          }
        }
        sb.toString
      }
      (out.mkString("\n"), nBad)
    }

    def parse(bytes: Array[Byte]): String = {
      val img = MediaCodec.readImage(bytes)
      if (img == null)
        throw new IllegalArgumentException("undecodable image bytes")
      val (w, h) = (img.getWidth, img.getHeight)
      val scales = (1 to 4).filter(s => w % (CellW * s) == 0 && h % (CellH * s) == 0)
      // off the monospace grid entirely -> the page is proportional-pitch
      if (scales.isEmpty) return parseProportional(bytes)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      // normalize cost per logical area so scales and FONTS compete
      // fairly; decode cost is also the font classifier — a bold page
      // read with regular templates pays the dilation ink per cell,
      // while the right family explains the pixels at noise cost. Ties
      // resolve to the FIRST candidate: regular font, smallest scale
      // (the clean-grid reading).
      def bestReading(p: Array[Int], radius: Int = 1): Reading =
        (for (f <- fontOrder.toSeq; s <- scales)
          yield decodeAt(p, w, h, s, radius, f)).minBy(_.normCost)
      val direct = bestReading(px)
      // deskew triggers on ANY over-threshold cell: a mean-cost trigger
      // dilutes on margin-heavy pages (blank cells decode near 0), and a
      // straight page's only '?' cells are genuinely-unsupported glyphs
      // which match the '?' TEMPLATE cheaply, never the threshold
      if (direct.nBad == 0) direct.text
      else {
        // an on-grid-landing PROPORTIONAL page is read here FIRST: a
        // noisy proportional render's height is always on the line grid
        // and its width lands on the cell grid for ~1 page in 6, and the
        // segmentation decode is cheap next to the deskew ladder below —
        // a clean proportional reading short-circuits the misfeed
        // machinery entirely. The short-circuit is gated on the grid
        // decode being HOPELESS (glyphs straddling cell boundaries fail
        // most ink cells), because a merely-noisy MONOSPACE page can
        // also segment cleanly under the lenient bridged prop matcher —
        // emitting it with proportional gap arithmetic would change its
        // space reconstruction. A plausible grid page always runs the
        // deskew ladder; prop stays the post-ladder fallback below.
        val nonBlank = direct.text.count(ch => ch != ' ' && ch != '\n')
        val gridHopeless = direct.nBad * 4 > nonBlank
        lazy val prop = scala.util.Try(parseProportionalCounted(bytes)).toOption
        if (gridHopeless && prop.exists(_._2 == 0)) prop.get._1
        else {
          // misfeed candidate: estimate the rotation (±3°, 0.1°
          // projection-profile ladder), then refine by minimizing the
          // ACTUAL decode cost on a 0.025° ladder around it — the coarse
          // ladder's ±0.05° residual displaces page-edge cells (|x−cx| of
          // hundreds of device px) past the offset search. Each candidate
          // decode is a few ms, and the pass only runs on pages that
          // already read badly. radius-2 offset search: a deskewed page
          // carries ±1 device px of nearest-neighbor resampling
          // displacement per cell on top of the renderer's ±1 jitter.
          val coarse = estimateSkew(px, w, h, maxDeg = 3.0, stepDeg = 0.1)
          val deskewed = (-4 to 4).map { k =>
            val a = coarse + math.toRadians(k * 0.025)
            bestReading(derotate(px, w, h, a), radius = 2)
          }.minBy(r => (r.nBad, r.normCost))
          // keep whichever reading explains the page better (a genuinely-
          // noisy-but-straight page keeps its direct reading)
          val better = deskewed.nBad < direct.nBad ||
            (deskewed.nBad == direct.nBad && deskewed.normCost < direct.normCost)
          val grid = if (better) deskewed else direct
          if (grid.nBad == 0) grid.text
          else prop match {
            // still unreadable as a grid: an imperfect proportional
            // reading wins only if it explains the page better
            case Some((text, nBad)) if nBad < grid.nBad => text
            case _ => grid.text
          }
        }
      }
    }
  }
}
