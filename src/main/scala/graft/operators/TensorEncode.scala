package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{cosine, cosineSql}

/** V1's encoder seam exercised with REAL tensor math (SURVEY §2.6;
  * reference `/root/reference/src/pinecone_utils.py:46-53` embeds text
  * through a sentence-encoder model). No model weights ship in this
  * sandbox, so the model here is a fastText-style EMBEDDING-BAG +
  * INT8 LINEAR PROJECTION with a fixed random-init weight matrix: text →
  * token ids (feature hashing into a [[Vocab]]-slot vocabulary) → gather
  * each token's int8 weight row → integer-accumulate → scale to float32.
  * That is the actual compute shape of a production encoder (gather +
  * GEMV, batched per partition); only the weight VALUES are untrained.
  * A real MiniLM/ONNX backend implements the same [[TextEncoder]] trait
  * and drops in behind [[embedColumn]] unchanged.
  *
  * Everything is integer arithmetic until one final /128 scale, so the
  * DuckDB oracle reproduces the embedding bit-for-bit from the same
  * weight table inlined as VALUES — the encoder is oracle-checked
  * end-to-end, unlike a float GEMM would be.
  *
  * Scale posture: encoding is a narrow batched `mapPartitions` (the
  * Inference.LlmBackend pattern) — weights are a per-JVM constant
  * (Vocab×Dim int8 = 4 KB here; a real model broadcast), the payload
  * never shuffles, and downstream ANN (LSH/IVF/PQ) consumes the vectors
  * with no knowledge of the encoder.
  */
object TensorEncode {

  val Vocab = 128
  val Dim = 32
  val Seed = 0x7E45C0DEL

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The model: a Vocab×Dim int8 weight matrix, fixed random-init
    * (deterministic from [[Seed]] — both the encoder and the SQL oracle
    * derive from this same fixture). */
  lazy val weights: Array[Array[Int]] =
    Array.tabulate(Vocab)(t => Array.tabulate(Dim)(d =>
      Math.floorMod(mix64(Seed + t.toLong * Dim + d), 255L).toInt - 127))

  /** Local twin of TextFunctions.words + the '' filter every caller
    * applies: strip spaces (Spark `trim` strips ' ' only), lowercase,
    * split on \s+, drop empties. */
  private[operators] def tokens(text: String): Array[String] = {
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    text.substring(s, e).toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
  }

  /** Feature-hash a token into its vocabulary slot (PolyHash — the
    * engine's one cross-engine string hash; chashSql is its SQL twin). */
  private[operators] def tokenId(tok: String): Int =
    Math.floorMod(graft.plans.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(tok)), Vocab.toLong).toInt

  /** Pluggable text-vector encoder; one instance per partition. */
  trait TextEncoder extends Serializable {
    def encode(texts: Seq[String]): Seq[Array[Float]]
  }

  /** The int8 embedding-bag+projection model. Integer accumulation is
    * exact and order-free; |acc| <= 127·nTokens stays far inside
    * float32's 24-bit integer range, and /128 is a power-of-two scale —
    * every emitted float is exact. */
  class Int8Projection extends TextEncoder {
    def encode(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val acc = new Array[Int](Dim)
      for (tok <- tokens(if (t == null) "" else t)) {
        val row = weights(tokenId(tok))
        var d = 0
        while (d < Dim) { acc(d) += row(d); d += 1 }
      }
      val out = new Array[Float](Dim)
      var d = 0
      while (d < Dim) { out(d) = acc(d) / 128.0f; d += 1 }
      out
    }
  }

  /** Run `encoder` over `textCol`, appending `outCol` (array<float>).
    * Batched narrow `mapPartitions` — the same seam shape as
    * Inference.inferColumn: one encoder per partition, `batchSize` texts
    * per tensor batch, no shuffle. */
  def embedColumn(df: DataFrame, textCol: String, outCol: String,
                  encoder: TextEncoder = new Int8Projection,
                  batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(textIdx)).getOrElse(""))
        val vecs = encoder.encode(texts)
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Oracle-checkable V1-through-V3 dataflow on the REAL tensor path:
    * encode the documents with [[Int8Projection]], take the first 3
    * document vectors as queries, exact cosine top-k over the encoded
    * corpus. Zero-token documents encode to the zero vector → NULL
    * cosine → excluded, matching the oracle's inner join. */
  def docEmbeddingsTensorQuery(spark: SparkSession, dir: String,
                               k: Int = 3, nQueries: Int = 3): DataFrame = {
    val docs = graft.Tables.loadWide(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val emb = embedColumn(docs, "text", "embedding").drop("text")
    val queries = broadcast(emb.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    emb.join(queries, col("doc_id") =!= col("qid"))
      .withColumn("score", cosine(col("q_emb"), col("embedding")))
      .filter(col("score").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("doc_id"), col("score"))
      .orderBy(col("qid"), col("rn"))
  }

  def docEmbeddingsTensorSql(k: Int = 3, nQueries: Int = 3): String = {
    import graft.operators.Dedup.chashSql
    val rows = weights.zipWithIndex.map { case (r, t) =>
      s"($t, ${r.mkString("[", ",", "]")})"
    }.mkString(", ")
    val dims = (1 to Dim)
      .map(i => s"CAST(sum(wv[$i]) AS BIGINT) AS s$i").mkString(", ")
    val emb = (1 to Dim).map(i => s"CAST(s$i AS DOUBLE) / 128.0").mkString("[", ", ", "]")
    s"""WITH w AS (SELECT * FROM (VALUES $rows) AS t(tid, wv)),
        toks AS (SELECT doc_id, ((${chashSql("tok")} % $Vocab) + $Vocab) % $Vocab AS tid
                 FROM (SELECT doc_id, unnest(list_filter(
                         ${graft.functions.TextFunctions.wordsSql("text")},
                         x -> x <> '')) AS tok
                       FROM documents WHERE text IS NOT NULL)),
        sums AS (SELECT doc_id, $dims FROM toks JOIN w USING (tid) GROUP BY doc_id),
        emb AS (SELECT doc_id, $emb AS embedding FROM sums),
        q AS (SELECT doc_id AS qid, embedding AS q_emb FROM emb WHERE doc_id < $nQueries),
        scored AS (SELECT qid, e.doc_id, ${cosineSql("q_emb", "e.embedding")} AS score
                   FROM q CROSS JOIN emb e WHERE e.doc_id <> qid),
        ranked AS (SELECT qid, doc_id, score,
                   row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
                   FROM scored WHERE score IS NOT NULL)
        SELECT qid, rn, doc_id, score FROM ranked WHERE rn <= $k"""
  }
}
