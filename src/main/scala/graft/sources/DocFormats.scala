package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.w3c.dom.{Element, Node}

import graft.sources.BinaryIngest.BinaryParser

/** Real, JDK-only DOCX and PDF codecs (SURVEY §2.1 S3-S4).
  *
  * Reference semantics: /root/reference/src/parsers.py:53-86 (DOCX:
  * python-docx `doc.paragraphs` then `doc.tables`, cells stripped and
  * " | "-joined, chunks "\n"-joined) and parsers.py:35-50 (PDF:
  * pdfplumber per-page text concatenated; this engine's documented
  * page-join contract is "\n", matching the prior stub).
  *
  * No PDFBox / POI / python-docx: a .docx is a zip of XML (read with
  * `ZipInputStream` + the JDK XML parser) and a fixture-grade PDF is a
  * sequence of objects whose content streams are optionally
  * FlateDecode'd (`java.util.zip.Inflater`) text operators. Both
  * parsers target well-formed documents of that shape; exotic inputs
  * (merged table cells, hex-string show-text, xref-dependent object
  * streams) fall to the per-row error channel, never kill the batch.
  *
  * The matching builders exist so specs AND the oracle query can parse
  * REAL bytes: `buildDocx`/`buildPdf` are deterministic given their
  * inputs (fixed zip entry time, fixed object layout).
  */
object DocFormats {

  // ---------------------------------------------------------------- DOCX

  private val wNs = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Real DOCX text extraction, python-docx semantics
    * (parsers.py:53-86): body-level paragraphs in document order (kept
    * untrimmed when non-blank), THEN body-level tables in document
    * order — a table between two paragraphs still prints after ALL
    * paragraphs, exactly like `doc.paragraphs` + `doc.tables`. A cell's
    * text is its direct paragraphs "\n"-joined; cells are stripped,
    * empty cells dropped, rows " | "-joined, empty rows dropped. */
  object DocxParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String = {
      val xml = zipEntryBytes(bytes, "word/document.xml")
        .getOrElse(throw new IllegalArgumentException("no word/document.xml entry"))
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      // untrusted input: no DTDs, no external entities
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setExpandEntityReferences(false)
      val doc = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
      val body = childElements(doc.getDocumentElement).find(isW(_, "body"))
        .getOrElse(throw new IllegalArgumentException("no w:body"))
      val top = childElements(body)
      val paras = top.filter(isW(_, "p")).map(paraText)
      val rows = top.filter(isW(_, "tbl")).flatMap { tbl =>
        childElements(tbl).filter(isW(_, "tr")).map { tr =>
          childElements(tr).filter(isW(_, "tc"))
            .map(tc => childElements(tc).filter(isW(_, "p")).map(paraText).mkString("\n"))
            .map(_.trim).filter(_.nonEmpty).mkString(" | ")
        }
      }
      (paras.filter(_.trim.nonEmpty) ++ rows.filter(_.nonEmpty)).mkString("\n")
    }

    /** Run text in document order: w:t content, w:tab → '\t',
      * w:br / w:cr → '\n' (python-docx run.text semantics). */
    private def paraText(p: Element): String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case e: Element if isW(e, "t") => sb.append(e.getTextContent)
        case e: Element if isW(e, "tab") => sb.append('\t')
        case e: Element if isW(e, "br") || isW(e, "cr") => sb.append('\n')
        case e: Element =>
          var c = e.getFirstChild
          while (c != null) { walk(c); c = c.getNextSibling }
        case _ => ()
      }
      var c = p.getFirstChild
      while (c != null) { walk(c); c = c.getNextSibling }
      sb.toString
    }

    private def isW(e: Element, local: String): Boolean =
      e.getLocalName == local &&
        (e.getNamespaceURI == wNs || e.getNamespaceURI == null)

    private def childElements(e: Element): Seq[Element] = {
      val out = ArrayBuffer.empty[Element]
      var c = e.getFirstChild
      while (c != null) {
        c match { case el: Element => out += el; case _ => () }
        c = c.getNextSibling
      }
      out.toSeq
    }
  }

  /** First zip entry with the given name, fully read. */
  private def zipEntryBytes(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) return Some(zin.readAllBytes())
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Deterministic minimal .docx: [Content_Types].xml + _rels/.rels +
    * word/document.xml with the given paragraphs followed by one table
    * (omitted when `table` is empty). Fixed entry timestamps. */
  def buildDocx(paragraphs: Seq[String], table: Seq[Seq[String]] = Nil): Array[Byte] = {
    def para(t: String) = s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEscape(t)}</w:t></w:r></w:p>"
    val tbl =
      if (table.isEmpty) ""
      else table.map(row => "<w:tr>" + row.map(c =>
          s"<w:tc>${para(c)}</w:tc>").mkString + "</w:tr>")
        .mkString("<w:tbl>", "", "</w:tbl>")
    val docXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="$wNs"><w:body>${paragraphs.map(para).mkString}$tbl</w:body></w:document>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>"""
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    try {
      Seq("[Content_Types].xml" -> contentTypes, "_rels/.rels" -> rels,
          "word/document.xml" -> docXml).foreach { case (name, content) =>
        val e = new ZipEntry(name)
        e.setTime(0L) // fixed mtime: byte-deterministic archives
        zos.putNextEntry(e)
        zos.write(content.getBytes(StandardCharsets.UTF_8))
        zos.closeEntry()
      }
    } finally zos.close()
    bos.toByteArray
  }

  // ----------------------------------------------------------------- PDF

  /** Real (fixture-grade) PDF text extraction: scan `obj..endobj`
    * bodies for content streams, FlateDecode when the stream dict says
    * so, then collect `(…) Tj` and `[…] TJ` show-text operators inside
    * `BT..ET` blocks. Each text-bearing content stream is one "page";
    * pages join with "\n" (the engine's documented page-join contract,
    * mirroring parsers.py:35-50's per-page concat loop). Object order
    * stands in for the page tree — exact for this engine's builder and
    * for linearly-written PDFs; no xref walk. */
  object PdfParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String = {
      // ISO-8859-1 maps bytes 1:1 to chars, so offsets into the string
      // are byte offsets and binary (deflated) spans survive round-trip
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      if (!raw.startsWith("%PDF")) throw new IllegalArgumentException("not a PDF")
      val pages = ArrayBuffer.empty[String]
      val streamRe = "(?s)<<(.*?)>>\\s*stream\\r?\\n".r
      for (m <- streamRe.findAllMatchIn(raw)) {
        val dict = m.group(1)
        val dataStart = m.end
        // prefer the dict's direct /Length (binary Flate data can contain
        // any byte sequence, including a stray "endstream"); fall back to
        // scanning when /Length is absent or an indirect reference
        val direct = "/Length\\s+(\\d+)(?!\\s+0\\s+R)".r.findAllMatchIn(dict)
          .map(_.group(1).toInt).toSeq.lastOption
          .filter(len => dataStart + len <= raw.length)
        val end = direct.map(dataStart + _)
          .getOrElse(raw.indexOf("endstream", dataStart))
        if (end >= 0) {
          var data = raw.substring(dataStart, end)
          if (direct.isEmpty) {
            // the EOL before `endstream` is not stream data
            if (data.endsWith("\r\n")) data = data.dropRight(2)
            else if (data.endsWith("\n") || data.endsWith("\r")) data = data.dropRight(1)
          }
          val content =
            if (dict.contains("/FlateDecode"))
              new String(inflate(data.getBytes(StandardCharsets.ISO_8859_1)),
                StandardCharsets.ISO_8859_1)
            else data
          val text = showTextOps(content)
          if (content.contains("BT")) pages += text
        }
      }
      pages.mkString("\n")
    }

    /** Concatenate Tj / TJ string operands across the decoded stream, in
      * order, unescaped. Kerning numbers in TJ arrays are ignored
      * (pure text extraction — no glyph metrics without a font).
      * Deliberately NOT segmented into BT..ET blocks first: a lazy
      * `BT(.*?)ET` pre-pass truncates at 'ET' INSIDE a string literal
      * (any text containing "BUDGET"/"ET AL" extracts empty), while
      * show-text operators outside BT..ET are malformed PDF whose
      * acceptance here is benign. The literal regex itself handles
      * escaped parens, so operator tokens inside strings can't confuse
      * it. */
    private def showTextOps(content: String): String = {
      val sb = new StringBuilder
      // a parenthesized string literal followed by Tj, or an array of
      // them followed by TJ; literals may contain escaped parens
      val litRe = "(?s)\\(((?:[^()\\\\]|\\\\.)*)\\)\\s*Tj|\\[((?:[^\\]\\\\]|\\\\.)*)\\]\\s*TJ".r
      val arrLitRe = "(?s)\\(((?:[^()\\\\]|\\\\.)*)\\)".r
      for (m <- litRe.findAllMatchIn(content)) {
        if (m.group(1) != null) sb.append(unescape(m.group(1)))
        else for (s <- arrLitRe.findAllMatchIn(m.group(2))) sb.append(unescape(s.group(1)))
      }
      sb.toString
    }

    /** PDF 32000-1:2008 §7.3.4.2 literal-string escapes. */
    private def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              val oct = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(ch => ch >= '0' && ch <= '7')
              sb.append(Integer.parseInt(oct, 8).toChar); i += 1 + oct.length
            case other => sb.append(other); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      try {
        inf.setInput(data)
        val out = new ByteArrayOutputStream(data.length * 4)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          // needsDictionary (zlib FDICT bit): without the throw the loop
          // spins forever — n stays 0 with needsInput() false
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            throw new IllegalArgumentException("truncated or FDICT Flate stream")
          out.write(buf, 0, n)
        }
        out.toByteArray
      } finally inf.end()
    }
  }

  private def pdfEscape(s: String): String =
    s.flatMap { case '\\' => "\\\\"; case '(' => "\\("; case ')' => "\\)"
                case c => c.toString }

  /** Deterministic minimal PDF: one content stream per page, each
    * `BT /F1 12 Tf 72 720 Td (text) Tj ET`, FlateDecode'd when
    * `compress` (the default — exercises the Inflater path end to
    * end), with a correct page tree and xref table. */
  def buildPdf(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val offsets = ArrayBuffer.empty[Int]
    def write(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def writeObj(body: => Unit): Unit = {
      offsets += bos.size()
      write(s"${offsets.length} 0 obj\n"); body; write("endobj\n")
    }
    write("%PDF-1.4\n")
    val n = pages.length
    // objects: 1 catalog, 2 pages, 3 font, then per page i: page obj
    // (4 + 2i) and content obj (5 + 2i)
    writeObj { write("<< /Type /Catalog /Pages 2 0 R >>\n") }
    writeObj {
      val kids = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
      write(s"<< /Type /Pages /Kids [$kids] /Count $n >>\n")
    }
    writeObj { write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    pages.zipWithIndex.foreach { case (text, i) =>
      writeObj { write(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>\n") }
      val content = s"BT /F1 12 Tf 72 720 Td (${pdfEscape(text)}) Tj ET"
      val data =
        if (compress) deflate(content.getBytes(StandardCharsets.ISO_8859_1))
        else content.getBytes(StandardCharsets.ISO_8859_1)
      writeObj {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        write(s"<< /Length ${data.length}$filter >>\nstream\n")
        bos.write(data)
        write("\nendstream\n")
      }
    }
    val xrefAt = bos.size()
    write(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    write(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    bos.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(data.length)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
