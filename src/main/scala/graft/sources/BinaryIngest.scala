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
  * parser instance per partition, the S3-S5 posture); the container has
  * no PDFBox/POI/Tesseract, so the defaults are clearly-marked
  * deterministic STUBS — the Spark-side plumbing (dispatch, partitioning,
  * error channel) is real and tested, the decoder body is swappable.
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
      .otherwise("text")

  /** Pluggable binary parser: one instance per partition via
    * mapPartitions; must be deterministic for a given byte array. */
  trait BinaryParser extends Serializable {
    def parse(bytes: Array[Byte]): String
  }

  /** STUB PDF parser (real impl: PDFBox PDFTextStripper — not in this
    * container). Deterministic fake: emulates per-page text concat by
    * splitting the payload at form-feed bytes, mirroring
    * parsers.py:35-50's page loop. */
  object StubPdfParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String =
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .split('\f').mkString("\n")
  }

  /** STUB DOCX parser (real impl: POI XWPFDocument). Deterministic fake:
    * lines are "paragraphs"; tab-separated lines are "table rows" joined
    * with " | " exactly like parsers.py:67-75's table flattening. */
  object StubDocxParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String =
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').filter(_.nonEmpty)
        .map(l => if (l.contains('\t')) l.split('\t').mkString(" | ") else l)
        .mkString("\n")
  }

  /** STUB OCR parser (real impl: Tesseract image_to_string,
    * parsers.py:90-106). Deterministic fake: the fixture's "image"
    * payloads are text bytes, so the stub "recognizes" exactly that text,
    * marker-prefixed — faithful to OCR's contract (bytes → the text in
    * the image) and exactly mirrorable in the DuckDB oracle. */
  object StubOcrParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String =
      "[ocr] " + new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Batch ingest of a directory of files (S1 batch form). */
  def readBinary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Streaming ingest of a drop directory (S1 continuous form — the
    * reference's one-file-per-request loop as a file stream). */
  def readBinaryStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType), StructField("modificationTime", TimestampType),
        StructField("length", LongType), StructField("content", BinaryType))))
      .load(dir)

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
             pdf: BinaryParser = StubPdfParser,
             docx: BinaryParser = StubDocxParser,
             ocr: BinaryParser = StubOcrParser): DataFrame = {
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
    * documents fixture (bytes = UTF-8 text; extension cycles
    * txt/pdf/docx/png by doc_id — ALL FOUR dispatch arms; '&' in the
    * name exercises sanitize) and run the single-pass ingest over it.
    * The DuckDB twin reproduces the stub parsers' transforms (pdf:
    * form-feed → newline; docx: drop empty lines, tab-rows → " | ";
    * ocr: marker-prefixed recognized text). Null-text rows are
    * excluded — a binary source has no null payloads. */
  def binaryIngestQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = element_at(array(lit("txt"), lit("pdf"), lit("docx"), lit("png")),
      (col("doc_id") % 4).cast(IntegerType) + 1)
    val bin = graft.Tables.loadWide(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(
        concat(lit("mem://in/Doc&"), col("doc_id").cast(StringType), lit("."), e).as("path"),
        encode(col("text"), "UTF-8").as("content"))
      .withColumn("length", length(col("content")).cast(LongType))
    ingest(spark, bin).orderBy(col("file_path"))
  }

  def binaryIngestOracleSql: String = {
    val docxText =
      """array_to_string(list_transform(
           list_filter(string_split(text, chr(10)), x -> x <> ''),
           x -> CASE WHEN contains(x, chr(9))
                     THEN array_to_string(string_split(x, chr(9)), ' | ')
                     ELSE x END), chr(10))"""
    s"""WITH b AS (
          SELECT doc_id, text,
            CASE doc_id % 4 WHEN 0 THEN 'txt' WHEN 1 THEN 'pdf'
                            WHEN 2 THEN 'docx' ELSE 'png' END AS e
          FROM documents WHERE text IS NOT NULL),
        parsed AS (
          SELECT
            'mem://in/Doc&' || CAST(doc_id AS VARCHAR) || '.' || e AS file_path,
            regexp_replace('Doc&' || CAST(doc_id AS VARCHAR) || '.' || e,
              '[^\\w\\s\\-.]', '', 'g') AS file_name,
            CASE e WHEN 'txt' THEN 'text' WHEN 'png' THEN 'image' ELSE e END AS fmt,
            CAST(octet_length(encode(text)) AS BIGINT) AS length,
            CASE e WHEN 'pdf' THEN replace(text, chr(12), chr(10))
                   WHEN 'docx' THEN $docxText
                   WHEN 'png' THEN '[ocr] ' || text
                   ELSE text END AS raw_text
          FROM b)
        SELECT *,
          CASE WHEN raw_text IS NULL OR length(trim(raw_text)) = 0
               THEN 'Parsing produced empty text' END AS error
        FROM parsed"""
  }
}
