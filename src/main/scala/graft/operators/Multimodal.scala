package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (north star): image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE BODIES ARE
  * DETERMINISTIC STUBS (clearly marked below); the Spark-side contract —
  * schema, batch shape, per-partition init, narrow parallelism — is real
  * and tested. A production deployment swaps `Decoder` for a JNI/codec
  * implementation without touching the plumbing.
  *
  * Scale posture: media rows are large (MBs); every operator is a narrow
  * mapPartitions (no shuffle of binary payloads, decoder init amortized
  * per partition), and feature extraction projects the payload away as
  * early as possible so downstream stages move only small vectors.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features: payload dropped, small fixed-width vector. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           fingerprint: Long, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** Pluggable per-partition decoder; deterministic for given bytes. */
  trait Decoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decoder — real impl would decode pixels/samples via a codec
    * library. Deterministic fake: derives `dim` floats from a rolling
    * hash of the payload so tests are hermetic and repeatable. */
  object StubDecoder extends Decoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media table from the documents fixture
    * (text bytes standing in for undecodable media payloads). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // loadWide: the whole point of the mapPartitions decoders is
    // per-partition parallelism — a single-file fixture scan would run
    // them on 1 of 32 cores
    graft.Tables.loadWide(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          width = 64 + (id % 8).toInt * 16, height = 48 + (id % 5).toInt * 16,
          sample_rate = if (kind == "audio") 16000 else 0)
      }
  }

  /** Feature extraction: decode → fixed-dim float vector; payload is
    * projected away (the 100 TB rule: drop the heavy column at the
    * earliest stage). One decoder per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder init happens once per partition here (stub is a no-op,
      // a codec impl would allocate its native context)
      rows.map { m =>
        var h = 0L
        var i = 0
        while (i < m.payload.length) { h = (h * 31 + m.payload(i)) % 1000000007L; i += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length, h,
          decoder.features(m.payload, dim))
      }
    }
  }

  /** Oracle-checkable feature extraction: the scalar outputs (byte count,
    * content fingerprint) — the stub's float vector is an LCG over 64-bit
    * wrap-around, deliberately not re-expressed in SQL. Fingerprint uses
    * the engine-wide polynomial hash; the fixture is pure ASCII so
    * byte-wise and codepoint-wise hashing coincide (asserted by the
    * oracle itself: a non-ASCII byte would hash-mismatch). */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("fingerprint"))
      .orderBy(col("media_id"))
  def featuresOracleSql: String =
    s"""SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CAST(length(text) AS INT) AS n_bytes,
        ${Dedup.chashSql("text")} AS fingerprint
        FROM documents"""

  /** Oracle-checkable frame sampling over the video rows. */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir))
      .orderBy(col("media_id"), col("frame_idx"))
  def framesOracleSql(frameBytes: Int = 32, stride: Int = 4): String =
    s"""WITH v AS (SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 3 = 2)
        SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
          CAST(least($frameBytes, n - i*$frameBytes) AS INT) AS frame_bytes
        FROM v, unnest(generate_series(0, CAST(ceil(n / $frameBytes.0) AS BIGINT) - 1)) t(i)
        WHERE i % $stride = 0"""

  /** Resize: metadata-level transform (stub keeps bytes; a codec impl
    * would re-encode). Demonstrates the typed-metadata contract. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(m => if (m.kind == "image") m.copy(width = w, height = h) else m)
  }

  /** Frame sampling for video rows: emit every `stride`-th fixed-size
    * chunk of the payload as its own frame row (flatMap — one narrow
    * stage, no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
                   stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => (m.media_id, idx, chunk.length) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
