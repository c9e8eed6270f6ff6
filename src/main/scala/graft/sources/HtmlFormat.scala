package graft.sources

import java.nio.charset.StandardCharsets

/** HTML → visible-text extraction, JDK-only (S2/S6 extension: the web
  * page is THE dominant format of a 100 TB pretraining crawl; the
  * reference's dispatch table (/root/reference/src/parsers.py:17-29)
  * routes pdf/docx/image — this adds the arm its corpus-scale twin
  * needs most).
  *
  * Contract (what a boilerplate-stripping extractor keeps):
  *  - `<script>`/`<style>` elements and `<!-- -->` comments vanish
  *    entirely, content included; everything before `<body>` (head,
  *    title) is markup-only here and strips with its tags.
  *  - Block-level tags (p, div, h1-h6, li, br, nav, table rows, …)
  *    delimit blocks; inline tags (b, i, a, span) strip without
  *    breaking the word.
  *  - Character entities decode: named (amp, lt, gt, quot, apos, copy,
  *    nbsp) and numeric (&#NNN; / &#xHH;). Unknown entities stay
  *    literal.
  *  - Each block trims (Java trim: all cp <= U+0020); empty blocks
  *    drop; blocks join with '\n'. Whitespace INSIDE a block is
  *    preserved verbatim — collapse is [[graft.operators.TextAnalytics
  *    .textNormalize]]'s job, not the parser's.
  *
  * The round trip buildHtml → htmlToText recovers the embedded text
  * exactly for ANY input (the builder escapes &, <, >), which is what
  * lets the DuckDB oracle reproduce parsed output from the text column
  * alone.
  */
object HtmlFormat {

  private val blockTags = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "nav", "footer", "header", "section", "article",
    "table", "tr", "td", "th", "title", "head", "body", "html",
    "blockquote", "pre", "form")

  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "copy" -> "©", "nbsp" -> " ")

  /** Escape text for safe embedding in an element body. */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic page around a document: head noise (title, style,
    * script), nav boilerplate, h1 of the first words, body paragraph,
    * entity-bearing footer. */
  def buildHtml(id: Long, text: String, words3: String): Array[Byte] = {
    val h1 = if (words3.nonEmpty) s"<h1>${escape(words3)}</h1>\n" else ""
    val page =
      s"""<!DOCTYPE html>
         |<html><head><title>Doc $id</title>
         |<style>body { color: #222; } /* <p> inside style stays dead */</style>
         |<script>var n = $id; if (n < 2) { console.log("<b>"); }</script>
         |</head>
         |<body>
         |<!-- generated page $id -->
         |<nav><a href="/">home</a> | <a href="/about">about</a></nav>
         |$h1<p>${escape(text)}</p>
         |<footer>&copy; 2026</footer>
         |</body></html>""".stripMargin
    page.getBytes(StandardCharsets.UTF_8)
  }

  /** ASCII-only lowercase: same LENGTH as the input, always. Unicode
    * case mappings can change string length ('İ' lowercases to two
    * chars), and the parser reuses indices found in the lowered copy
    * against the original — a length-changing mapping before a
    * script/style close tag would slice the wrong range. Tag names are
    * ASCII, so ASCII folding finds every real close tag. */
  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Lowercased tag name right after `<` or `</`. */
  private def tagNameAt(s: String, i: Int): String = {
    var j = i
    if (j < s.length && s.charAt(j) == '/') j += 1
    val start = j
    while (j < s.length && (s.charAt(j).isLetter || s.charAt(j).isDigit)) j += 1
    asciiLower(s.substring(start, j))
  }

  def htmlToText(html: String): String = {
    val lower = asciiLower(html)
    val blocks = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    def flush(): Unit = {
      val t = cur.toString.trim
      if (t.nonEmpty) blocks += t
      cur.clear()
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val name = tagNameAt(html, i + 1)
          val close = html.indexOf('>', i)
          if (close < 0) { i = n } // unterminated tag: drop the tail as markup
          else if ((name == "script" || name == "style") && html.charAt(i + 1) != '/') {
            // skip to the matching close tag, content and all
            val endTag = s"</$name"
            val idx = lower.indexOf(endTag, close + 1)
            if (idx < 0) i = n
            else i = math.max(html.indexOf('>', idx) + 1, idx + endTag.length)
          } else {
            if (blockTags.contains(name)) flush()
            i = close + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 10) html.substring(i + 1, semi) else null
        val decoded =
          if (body == null) null
          else if (body.startsWith("#x") || body.startsWith("#X"))
            try Character.toString(Integer.parseInt(body.substring(2), 16)) catch { case _: Exception => null }
          else if (body.startsWith("#"))
            try Character.toString(Integer.parseInt(body.substring(1), 10)) catch { case _: Exception => null }
          else named.getOrElse(body, null)
        if (decoded != null) { cur.append(decoded); i = semi + 1 }
        else { cur.append(c); i += 1 }
      } else {
        cur.append(c)
        i += 1
      }
    }
    flush()
    blocks.mkString("\n")
  }

  /** The pluggable-parser face (same seam as PDF/DOCX/OCR). */
  object Parser extends BinaryIngest.BinaryParser {
    override def parse(bytes: Array[Byte]): String =
      htmlToText(new String(bytes, StandardCharsets.UTF_8))
  }
}
