package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The embeddings table's write path (SURVEY §2.6 V2, §2.1 S7):
  * upsert-by-id over an append-only Parquet store.
  *
  * Reference semantics: Pinecone `index.upsert` — last write for an id
  * wins (/root/reference/src/pinecone_utils.py:55-92); schema-upload ids
  * are a deterministic function of (doc_type, schema JSON)
  * (/root/reference/src/app.py:142 — normalized here from Python's
  * process-seeded `hash()` to xxhash64, same information, reproducible).
  *
  * Scale posture: MERGE without a table format = read existing ∪ new,
  * window-dedup on id by recency, rewrite. The dedup shuffles only
  * (id, priority) — at 100 TB the store would be a table format with
  * real MERGE; the operator's contract (last-writer-wins by id) is the
  * portable part.
  */
object EmbeddingStore {

  /** Deterministic schema-record id (S7's hash-mod id, normalized). */
  def schemaId(docType: org.apache.spark.sql.Column,
               schemaJson: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(docType, lit("_schema_"), pmod(xxhash64(schemaJson), lit(100000)))

  /** Last-writer-wins upsert: rows in `updates` replace same-id rows in
    * `existing` — unconditionally, for ANY seq value (negative, zero,
    * NULL); the wave membership and the within-wave sequence are separate
    * ranks. Inside `updates`, higher `seq` wins; a NULL seq ranks below
    * every explicit seq (an unsequenced update loses to a sequenced one
    * but still beats the store); rows with EQUAL seq for one id keep an
    * arbitrary one (same contract as the reference's in-batch dict
    * collapse). */
  def upsert(existing: DataFrame, updates: DataFrame, idCol: String = "vec_id",
             seqCol: Option[String] = None): DataFrame = {
    // the seq column is upsert bookkeeping, not payload: fold it into
    // (_wave, _seq) and drop it so both union sides share the store
    // schema. Two-level ordering — wave first — so no seq value can ever
    // demote an update below the existing store (a single additive
    // priority would: 1 + seq underflows the store's rank at seq <= -1)
    val e = seqCol.foldLeft(existing
      .withColumn("_wave", lit(0L)).withColumn("_seq", lit(0L)))(_.drop(_))
    val u = seqCol match {
      case Some(s) => updates.withColumn("_wave", lit(1L))
        // NULL stays NULL — ranked below every explicit seq by
        // desc_nulls_last (a Long.MinValue sentinel would TIE with an
        // explicit Long.MinValue seq instead of losing to it)
        .withColumn("_seq", col(s).cast("long"))
        .drop(s)
      case None => updates.withColumn("_wave", lit(1L))
        .withColumn("_seq", lit(0L))
    }
    val all = e.unionByName(u, allowMissingColumns = false)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_wave").desc, col("_seq").desc_nulls_last)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_wave", "_seq", "_rn")
  }

  /** Oracle-checkable upsert (V2/K3): fixture embeddings ∪ two literal
    * update waves — wave 2 (seq 2) overrides wave 1 (seq 1) overrides the
    * store; untouched ids pass through. Projects (vec_id, label) so the
    * compare is scalar-only. */
  def embedUpsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables.loadWide(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val u1 = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), (col("label") + 100).as("label"), lit(1L).as("seq"))
    val u2 = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), (col("label") + 200).as("label"), lit(2L).as("seq"))
    upsert(emb, u1.unionByName(u2), seqCol = Some("seq"))
      .orderBy(col("vec_id"))
  }
  def embedUpsertOracleSql: String =
    """SELECT vec_id,
       CASE WHEN vec_id % 20 = 0 THEN label + 200
            WHEN vec_id % 10 = 0 THEN label + 100
            ELSE label END AS label
       FROM embeddings"""

  /** End-to-end embedding pipeline (V1→V2→K3→V3 in one dataflow):
    * pseudo-embed the documents at the store's dimension, upsert them
    * into the embeddings store under offset ids, then query the merged
    * store with the first 3 document vectors (cosine top-k). */
  def docEmbeddingsQuery(spark: SparkSession, dir: String, k: Int = 3,
                         dim: Int = 64, offset: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.loadWide(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val docEmb = graft.Tables.loadWide(spark, dir, "documents")
      .select((col("doc_id") + offset).as("vec_id"),
        SchemaRetrieval.pseudoEmbed(col("text"), dim).as("embedding"),
        lit(-1).cast("int").as("label"))
    val store = upsert(emb, docEmb)
    val queries = broadcast(docEmb.filter(col("vec_id") < offset + 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    store.join(queries, col("vec_id") =!= col("qid"))
      .withColumn("score",
        graft.functions.VectorFunctions.cosine(col("q_emb"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("score"))
      .orderBy(col("qid"), col("rn"))
  }
  def docEmbeddingsOracleSql(k: Int = 3, dim: Int = 64,
                             offset: Long = 1000000L): String = {
    import graft.functions.VectorFunctions.cosineSql
    // hash hoisted into its own CTE column so DuckDB evaluates it once
    // per document, not once per vector element
    s"""WITH d0 AS (SELECT doc_id, ${Dedup.chashSql("text")} AS ph FROM documents),
        d AS (SELECT doc_id + $offset AS vec_id,
                list_transform(generate_series(0, ${dim - 1}), i ->
                  CAST((ph * (2*i + 3) + i) % 1021 AS DOUBLE) / 1024.0) AS embedding,
                -1 AS label
              FROM d0),
        s AS (SELECT vec_id, embedding, label FROM embeddings
              UNION ALL SELECT vec_id, embedding, label FROM d),
        q AS (SELECT vec_id AS qid, embedding AS q_emb FROM d
              WHERE vec_id < ${offset + 3}),
        scored AS (SELECT qid, s.vec_id, ${cosineSql("q_emb", "s.embedding")} AS score
                   FROM q CROSS JOIN s WHERE s.vec_id <> qid),
        ranked AS (SELECT qid, vec_id, score,
                   row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
                   FROM scored)
        SELECT qid, rn, vec_id, score FROM ranked WHERE rn <= $k"""
  }

  /** Metadata sanitize (reference pinecone_utils.py:70-80): JSON object →
    * flat map<string,string>, nested values re-encoded as compact JSON
    * (the double-encoded schema ride-along of §1.3). */
  def sanitizeMetadata(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.SanitizeMetadata(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** Oracle-checkable metadata sanitize: deterministic nested metadata
    * JSON per document → sanitized map, probed per key (map columns
    * compare poorly across Arrow bridges; per-key strings are exact). */
  def metadataSanitizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val j = concat(
      lit("""{"id":"""), col("doc_id").cast("string"),
      lit(""","schema":{"fields":{"a":"x"}},"tags":["t1","t2"],"label":"L"""),
      (col("doc_id") % 5).cast("string"), lit("\"}"))
    // sort-the-base (r13): see DocPipeline.runSorted
    graft.Tables.loadWideSorted(spark, dir, "documents", "doc_id")
      .select(col("doc_id"), sanitizeMetadata(j).as("m"))
      .select(col("doc_id"),
        element_at(col("m"), "id").as("m_id"),
        element_at(col("m"), "schema").as("m_schema"),
        element_at(col("m"), "tags").as("m_tags"),
        element_at(col("m"), "label").as("m_label"))
  }
  def metadataSanitizeOracleSql: String =
    """SELECT doc_id, CAST(doc_id AS VARCHAR) AS m_id,
       '{"fields":{"a":"x"}}' AS m_schema,
       '["t1","t2"]' AS m_tags,
       'L' || CAST(doc_id % 5 AS VARCHAR) AS m_label
       FROM documents"""

  /** Upsert + persist to a Parquet store dir (the K3 sink). `seqCol`
    * (dropped from the stored schema) resolves same-id ties WITHIN the
    * update wave; without it, duplicate ids inside one wave keep an
    * arbitrary row. */
  def upsertToStore(spark: SparkSession, storeDir: String,
                    updates: DataFrame, idCol: String = "vec_id",
                    seqCol: Option[String] = None): Unit = {
    val storedSchema = seqCol.foldLeft(updates)(_.drop(_)).schema
    val existing =
      try spark.read.parquet(storeDir)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storedSchema) }
    val merged = upsert(existing, updates, idCol, seqCol)
    // write to a temp dir then swap — Parquet has no transactional
    // overwrite-while-reading
    val tmp = storeDir + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(storeDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
