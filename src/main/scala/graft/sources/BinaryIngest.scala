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

  /** Lowercased filename extension ('' when none). */
  def ext(path: Column): Column =
    lower(when(col("path").contains("."),
      element_at(split(path, "\\."), -1)).otherwise(lit("")))

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

  /** STUB OCR parser (real impl: Tesseract). Deterministic fake so the
    * pipeline stays testable without the binary. */
  object StubOcrParser extends BinaryParser {
    def parse(bytes: Array[Byte]): String =
      s"OCR_TEXT(${bytes.length} bytes, ${java.util.Arrays.hashCode(bytes)})"
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

  /** Full S1-S6 ingest: dispatch on extension, parse to `raw_text`, with
    * the per-row error channel. Text decodes inline (codegen); binary
    * formats run their parser per-partition. */
  def ingest(spark: SparkSession, binary: DataFrame,
             pdf: BinaryParser = StubPdfParser,
             docx: BinaryParser = StubDocxParser,
             ocr: BinaryParser = StubOcrParser): DataFrame = {
    val dispatched = binary
      .withColumn("file_name", sanitizeName(element_at(split(col("path"), "/"), -1)))
      .withColumn("fmt", format(ext(col("path"))))
    // binary formats: mapPartitions so parser init is amortized per
    // partition (S3-S5); result is (path -> text|error)
    val parsedRdd = dispatched
      .select(col("path"), col("fmt"), col("content"))
      .filter(col("fmt") =!= "text")
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val path = r.getString(0)
          val fmt = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val parser = fmt match {
            case "pdf" => pdf
            case "docx" => docx
            case _ => ocr
          }
          try (path, parser.parse(bytes), null: String)
          catch { case e: Exception => (path, null: String, s"$fmt parse failed: ${e.getMessage}") }
        }
      }
    val spark2 = spark
    import spark2.implicits._
    val parsed = parsedRdd.toDF("p_path", "parsed_text", "parse_error")
    dispatched
      .join(parsed, col("path") === col("p_path"), "left")
      .withColumn("raw_text",
        when(col("fmt") === "text", decode(col("content"), "UTF-8"))
          .otherwise(col("parsed_text")))
      .withColumn("error",
        when(col("parse_error").isNotNull, col("parse_error"))
          .when(col("raw_text").isNull || length(trim(col("raw_text"))) === 0,
            lit("Parsing produced empty text"))
          .otherwise(lit(null).cast(StringType)))
      .select(col("path").as("file_path"), col("file_name"), col("fmt"),
        col("length"), col("raw_text"), col("error"))
  }
}
