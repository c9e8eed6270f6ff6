package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorFunctions.{cosine, cosineSql}
import graft.operators.Dedup.chashSql

/** J1 — the reference's 3-strategy schema lookup cascade
  * (/root/reference/src/agents.py:104-156):
  *   1. vector query filtered `type == doc_type`, best match;
  *   2. if empty, semantic search on the document text;
  *   3. if still empty (index has no rows), synthesized fallback —
  *      DocPipeline.schemaLookup's literal default.
  *
  * Spark shape: the schema index is broadcast-tiny by construction (one
  * record per schema upload), so strategy 1 is a broadcast join and
  * strategy 2 is an argmax over per-schema literal score columns — the
  * document corpus never shuffles for either.
  *
  * V1 (embed_text) stand-in: a deterministic pseudo-encoder so the
  * cascade is oracle-checkable end-to-end — dimension is a knob
  * (reference's EMBEDDING_DIMENSION, pinecone_utils.py:13), values are
  * integers/1024 (exactly representable in float32, so Spark's float
  * cosine and DuckDB's double cosine agree bit-for-bit). A real
  * sentence-encoder plugs in behind the same contract (the
  * Inference.LlmBackend pattern).
  */
object SchemaRetrieval {

  val Dim = 8

  /** Deterministic pseudo-embedding of a text column. Native expression:
    * the composed `array(f(chash, 0), ..., f(chash, dim-1))` form had the
    * shared hash re-inlined per element by projection collapse — dim full
    * passes over the text (round-1 schema_cascade hot spot). */
  def pseudoEmbed(c: Column, dim: Int = Dim): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.PseudoEmbed(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), dim))
  def pseudoEmbedSql(c: String, dim: Int = Dim): String =
    (0 until dim).map { i =>
      s"CAST((${chashSql(c)} * ${2L * i + 3} + $i) % 1021 AS DOUBLE) / 1024.0"
    }.mkString("[", ", ", "]")

  /** Driver-side twin of pseudoEmbed for the (tiny) schema index. */
  def pseudoEmbedLocal(text: String, dim: Int = Dim): Array[Float] = {
    val ph = graft.plans.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    Array.tabulate(dim)(i =>
      (((ph * (2L * i + 3) + i) % 1021L).toDouble / 1024.0).toFloat)
  }

  /** Schema-index text representation (reference S7's text_repr,
    * src/app.py:150). */
  def schemaText(dt: String, json: String): String = s"$dt schema: $json"

  /** The cascade over the documents corpus: (doc_id, strategy, chosen).
    * Strategy 3 never fires here because the built-in index is
    * non-empty — its guard lives in DocPipeline.schemaLookup.
    *
    * P3 fidelity: strategy 2's query text is the first 1000 chars of the
    * CLEANED text (reference embeds state["raw_text"][:1000],
    * src/agents.py:132, where raw_text is already clean_text'ed). */
  def cascade(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = graft.functions.TextFunctions.cleanText(col("text"))
    // sort-the-base (r13): see DocPipeline.runSorted — the trailing
    // orderBy's range-sampling job would re-run the clean+classify+embed
    // chain twice
    val docs = Tables.loadWideSorted(spark, dir, "documents", "doc_id")
      .select(col("doc_id"),
        graft.functions.TextFunctions.classify(cleaned).as("doc_type"),
        pseudoEmbed(substring(cleaned, 1, 1000)).as("d_emb"))
    val schemaNames = DocPipeline.schemaRows.map(_._1)
    // strategy 1: exact type match against the tiny index — a literal
    // isin, the broadcast-join limit case for a handful of keys
    val matched = col("doc_type").isin(schemaNames: _*)
    // strategy 2: semantic top-1 — one score column per schema record,
    // argmax via greatest(struct(score, name)); ties break to the
    // lexicographically larger name on both engines
    val scored = DocPipeline.schemaRows.map { case (dt, json, _) =>
      struct(
        cosine(col("d_emb"),
          typedlit(pseudoEmbedLocal(schemaText(dt, json)))).as("score"),
        lit(dt).as("name"))
    }
    val best = greatest(scored: _*)
    docs
      .withColumn("strategy", when(matched, lit(1)).otherwise(lit(2)))
      .withColumn("chosen",
        when(matched, col("doc_type")).otherwise(best.getField("name")))
      .select(col("doc_id"), col("strategy"), col("chosen"))
  }

  def cascadeSql: String = {
    val rows = DocPipeline.schemaRows.map { case (dt, json, _) =>
      s"('$dt', '${schemaText(dt, json).replace("'", "''")}')"
    }.mkString(", ")
    // cleaned text and its hash are hoisted into CTE columns so DuckDB
    // evaluates each once per document, not once per embedding element
    s"""WITH schemas AS (SELECT * FROM (VALUES $rows) AS t(sdt, stext)),
        semb AS (SELECT sdt, ${pseudoEmbedSql("stext")} AS s_emb FROM schemas),
        d0 AS (SELECT doc_id, ${graft.functions.TextFunctions.cleanTextSql("text")} AS ct
               FROM documents),
        d1 AS (SELECT doc_id, ct, ${chashSql("substr(ct, 1, 1000)")} AS ph FROM d0),
        docs AS (SELECT doc_id,
                        ${graft.functions.TextFunctions.classifySql("ct")} AS doc_type,
                        list_transform(generate_series(0, ${Dim - 1}), i ->
                          CAST((ph * (2*i + 3) + i) % 1021 AS DOUBLE) / 1024.0) AS d_emb
                 FROM d1),
        s1 AS (SELECT d.*, (d.doc_type IN (SELECT sdt FROM schemas)) AS matched FROM docs d),
        s2 AS (SELECT doc_id, sdt AS best FROM (
                 SELECT s1.doc_id, semb.sdt,
                        row_number() OVER (PARTITION BY s1.doc_id
                          ORDER BY ${cosineSql("d_emb", "s_emb")} DESC, semb.sdt DESC) AS rn
                 FROM s1 CROSS JOIN semb WHERE NOT matched)
               WHERE rn = 1)
        SELECT s1.doc_id,
               CASE WHEN matched THEN 1 ELSE 2 END AS strategy,
               CASE WHEN matched THEN doc_type ELSE s2.best END AS chosen
        FROM s1 LEFT JOIN s2 ON s1.doc_id = s2.doc_id"""
  }
}
