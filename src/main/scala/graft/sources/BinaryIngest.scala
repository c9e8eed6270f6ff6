package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Binary-file ingest + format dispatch (SURVEY §2.1 S1-S6).
  *
  * Reference semantics: spool the upload, route on lowercased extension
  * (.pdf / .docx,.doc / .png,.jpg,.jpeg,.tiff / else plain text,
  * /root/reference/src/parsers.py:17-29), sanitize the filename
  * (/root/reference/src/app.py:29-34), produce a text column; a parse
  * failure sets the per-row error, never kills the batch.
  *
  * Spark-first shape: `binaryFile` source → narrow per-row dispatch.
  * Plain text decodes inline (codegen'd `decode`). PDF/DOCX/OCR are
  * pluggable `Array[Byte] => String` parsers run via mapPartitions (one
  * parser instance per partition, the S3-S5 posture). All three default
  * to REAL JDK-only codecs: [[DocFormats]] (zip + XML for .docx; object
  * scan + FlateDecode + Tj/TJ for .pdf) and [[GlyphOcr]] (raster decode
  * + per-cell template matching for images; a Tesseract-backed parser
  * plugs into the same seam when the binary is available).
  */
object BinaryIngest {

  /** Lowercased filename extension ('' when none). Works on the basename
    * only — a dotted directory with an extensionless file (/a.b/file)
    * has no extension. */
  def ext(path: Column): Column = {
    val base = element_at(split(path, "/"), -1)
    lower(when(base.contains("."),
      element_at(split(base, "\\."), -1)).otherwise(lit("")))
  }

  /** Reference filename sanitize: strip chars outside [\w\s\-.]. */
  def sanitizeName(name: Column): Column =
    regexp_replace(name, "[^\\w\\s\\-.]", "")

  /** Format label from extension (the S2 dispatch table). */
  def format(e: Column): Column =
    when(e === "pdf", "pdf")
      .when(e.isin("docx", "doc"), "docx")
      .when(e.isin("png", "jpg", "jpeg", "tiff"), "image")
      .when(e.isin("html", "htm"), "html")
      .otherwise("text")

  /** Pluggable binary parser: one instance per partition via
    * mapPartitions; must be deterministic for a given byte array. */
  trait BinaryParser extends Serializable {
    def parse(bytes: Array[Byte]): String
  }

  /** Batch ingest of a directory of files (S1 batch form). */
  def readBinary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Streaming ingest of a drop directory (S1 continuous form — the
    * reference's one-file-per-request loop as a file stream).
    * `maxFilesPerTrigger` caps files per micro-batch (None = all
    * available files in one batch). */
  def readBinaryStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType), StructField("modificationTime", TimestampType),
        StructField("length", LongType), StructField("content", BinaryType))))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(dir)
  }

  /** One ingested row: the S1-S6 output envelope. */
  final case class Ingested(file_path: String, file_name: String,
    fmt: String, length: Long, raw_text: String, error: String)

  /** Full S1-S6 ingest: dispatch on extension and parse to `raw_text`
    * inside ONE mapPartitions — parser init amortized per partition, no
    * payload shuffle (round 1 re-joined parsed text back on `path`,
    * shuffling every document body twice; at 100 TB of binary docs that
    * join is the whole job cost). Per-row failure lands in `error`,
    * never kills the batch. */
  def ingest(spark: SparkSession, binary: DataFrame,
             pdf: BinaryParser = DocFormats.PdfParser,
             docx: BinaryParser = DocFormats.DocxParser,
             ocr: BinaryParser = GlyphOcr.Parser,
             html: BinaryParser = HtmlFormat.Parser): DataFrame = {
    import spark.implicits._
    binary
      .withColumn("file_name", sanitizeName(element_at(split(col("path"), "/"), -1)))
      .withColumn("fmt", format(ext(col("path"))))
      .select(col("path"), col("file_name"), col("fmt"),
        col("length").cast(LongType), col("content"))
      .as[(String, String, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (path, name, fmt, len, bytes) =>
          val (text, parseErr) =
            try {
              val t = fmt match {
                case "text" => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
                case "pdf" => pdf.parse(bytes)
                case "docx" => docx.parse(bytes)
                case "html" => html.parse(bytes)
                case _ => ocr.parse(bytes)
              }
              (t, null: String)
            } catch {
              case e: Exception => (null: String, s"$fmt parse failed: ${e.getMessage}")
            }
          val err =
            if (parseErr != null) parseErr
            else if (text == null || text.trim.isEmpty) "Parsing produced empty text"
            else null
          Ingested(path, name, fmt, len, text, err)
        }
      }
      .toDF()
  }

  /** Oracle-checkable ingest: synthesize a binary corpus from the
    * documents fixture and run the single-pass ingest over it. The
    * extension cycles txt/pdf/docx/png/html by doc_id — ALL FIVE
    * dispatch arms; '&' in the name exercises sanitize. PDF, DOCX and PNG rows
    * carry REAL container bytes built by [[DocFormats]]/[[GlyphOcr]] and
    * decoded by the real parsers: the pdf is two pages (full text; first
    * three words), the docx is one paragraph (full text), one blank
    * paragraph (the parser must drop it) and a one-row table of the
    * first three words (flattened " | "), the png is the text rasterized
    * SCANNER-GRADE (2x scale, ±1px per-character jitter, salt-and-pepper
    * noise, seeded by doc_id) and recognized back by best-shift
    * nearest-glyph template matching, and the html is a full page
    * (head/style/script noise, nav boilerplate, h1, entity-escaped
    * body, entity-bearing footer) extracted back by [[HtmlFormat]] —
    * structure the DuckDB twin reproduces from the text alone. `length`
    * is the logical payload size (UTF-8 text bytes), not the container
    * size, which a SQL oracle could not recompute from zip/deflate/png
    * output. Null-text rows are excluded — a binary source has no null
    * payloads. */
  def binaryIngestQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exts = Array("txt", "pdf", "docx", "png", "html")
    val bin = graft.Tables.loadWide(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id").cast(LongType), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val e = exts(((id % 5) + 5).toInt % 5)
        val head3 = text.split(' ').filter(_.trim.nonEmpty).take(3).toSeq
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val content = e match {
          case "pdf" =>
            DocFormats.buildPdf(
              if (head3.nonEmpty) Seq(text, head3.mkString(" ")) else Seq(text))
          case "docx" =>
            DocFormats.buildDocx(Seq(text, ""),
              if (head3.nonEmpty) Seq(head3) else Nil)
          // every third page is set in the bold family (the parser must
          // classify the font per page by decode cost), and every other
          // png row is PROPORTIONAL-PITCH scanner-grade — run-segmented
          // with run-bridging + split-repair instead of the cell walk
          case "png" =>
            val font = if (id % 3 == 0) GlyphOcr.FontBold else GlyphOcr.FontRegular
            if (id % 10 == 3) GlyphOcr.renderProportionalNoisy(text, seed = id, font = font)
            else GlyphOcr.renderNoisy(text, seed = id, font = font)
          case "html" => HtmlFormat.buildHtml(id, text, head3.mkString(" "))
          case _ => payload
        }
        (s"mem://in/Doc&$id.$e", content, payload.length.toLong)
      }
      .toDF("path", "content", "length")
    ingest(spark, bin).orderBy(col("file_path"))
  }

  def binaryIngestOracleSql: String = {
    // the whitespace set Java's String.trim strips (all cp <= U+0020
    // that occur in text fixtures)
    val ws = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    s"""WITH b AS (
          SELECT doc_id, text,
            CASE doc_id % 5 WHEN 0 THEN 'txt' WHEN 1 THEN 'pdf'
                            WHEN 2 THEN 'docx' WHEN 3 THEN 'png'
                            ELSE 'html' END AS e,
            list_slice(list_filter(string_split(text, ' '),
              w -> trim(w, $ws) <> ''), 1, 3) AS head3
          FROM documents WHERE text IS NOT NULL),
        b2 AS (
          SELECT *,
            array_to_string(head3, ' ') AS words3,
            array_to_string(list_transform(head3, w -> trim(w, $ws)), ' | ') AS cells3
          FROM b),
        parsed AS (
          SELECT
            'mem://in/Doc&' || CAST(doc_id AS VARCHAR) || '.' || e AS file_path,
            regexp_replace('Doc&' || CAST(doc_id AS VARCHAR) || '.' || e,
              '[^\\w\\s\\-.]', '', 'g') AS file_name,
            CASE e WHEN 'txt' THEN 'text' WHEN 'png' THEN 'image'
                   WHEN 'html' THEN 'html' ELSE e END AS fmt,
            CAST(octet_length(encode(text)) AS BIGINT) AS length,
            CASE e
              WHEN 'pdf' THEN CASE WHEN words3 <> ''
                THEN text || chr(10) || words3 ELSE text END
              WHEN 'docx' THEN
                (CASE WHEN trim(text, $ws) <> '' THEN text ELSE '' END) ||
                (CASE WHEN trim(text, $ws) <> '' AND cells3 <> '' THEN chr(10) ELSE '' END) ||
                cells3
              WHEN 'png' THEN ${GlyphOcr.substituteSql("text")}
              WHEN 'html' THEN
                'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || 'home | about' ||
                (CASE WHEN trim(words3, $ws) <> ''
                      THEN chr(10) || trim(words3, $ws) ELSE '' END) ||
                (CASE WHEN trim(text, $ws) <> ''
                      THEN chr(10) || trim(text, $ws) ELSE '' END) ||
                chr(10) || chr(169) || ' 2026'
              ELSE text END AS raw_text
          FROM b2)
        SELECT *,
          CASE WHEN raw_text IS NULL OR length(trim(raw_text, $ws)) = 0
               THEN 'Parsing produced empty text' END AS error
        FROM parsed"""
  }
}
