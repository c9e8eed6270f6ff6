package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFunctions._

/** The reference's 7-agent document ETL pipeline, set-oriented
  * (SURVEY §3.1): parse → clean → classify → schema lookup → extract →
  * validate (bounded retry) → persist → respond.
  *
  * Design stance (SURVEY §7): the unit of work is a DataFrame of N
  * documents, not one document per request. Every stage is a pure
  * `DataFrame => DataFrame`; per-row failure is a nullable `error` column
  * (the reference's short-circuit convention, src/agents.py:87 et al.) —
  * a failed row flows to the sink untouched, it never kills the job.
  *
  * Scale posture: the whole pipeline is narrow (embarrassingly parallel
  * per document) except the schema lookup, which is a broadcast join
  * against a by-construction-tiny schema table. No driver-side per-row
  * work; the retry loop is a bounded (MAX_RETRIES=1, src/agents.py:33)
  * driver-side split-recompute-union over DataFrames.
  */
object DocPipeline {

  val MaxRetries = 1 // reference: src/agents.py:33

  /** Stage guard implementing the reference's error short-circuit
    * (src/agents.py:87,110,165,213,271): apply `op` only where no prior
    * stage failed. */
  def guarded(op: Column, passthrough: Column, error: Column): Column =
    when(error.isNull, op).otherwise(passthrough)

  /** Built-in extraction schema table (SURVEY §1.4): doc_type -> schema
    * JSON + description. Broadcast-tiny by construction (one row per
    * doc_type label), mirroring the Pinecone schema index's role. */
  /** The built-in index rows as pure data (shared with
    * SchemaRetrieval's cascade + oracle). */
  val schemaRows: Seq[(String, String, String)] =
    labels.map(_._1).map { dt =>
      (dt,
        s"""{"fields":{"amount":"monetary amount","email":"contact email","date":"primary date","phone":"contact phone"},"description":"$dt extraction schema"}""",
        s"Extraction schema for $dt documents")
    }

  def schemaTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    schemaRows.toDF("schema_doc_type", "schema_json", "schema_description")
  }

  /** Stage 1-2: ingest + parse. For the parquet corpus the text is already
    * parsed (FIXTURES.md); binary formats route through
    * sources.BinaryIngest. Seeds the envelope columns. */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("mem://docs/"), col("doc_id"), lit(".txt")).as("file_path"),
      col("text").as("raw_text"),
      // pre-clean text retained for field extraction: the reference
      // cleans before extracting, but P1's charset strips '@' so emails
      // could never survive — normalized per the quirk ledger (SURVEY §7)
      col("text").as("text_orig"),
      lit(null).cast(StringType).as("error"),
      lit(0).as("retry_count"))
      .withColumn("error",
        when(col("raw_text").isNull || length(trim(col("raw_text"))) === 0,
          lit("Parsing produced empty text")).otherwise(col("error")))
      // R2 log envelope (src/app.py:60-95): per-row human-readable
      // stage log, appended by each stage below
      .withColumn("logs", array(
        when(col("error").isNull, lit("parsing: ok"))
          .otherwise(concat(lit("parsing: "), col("error")))))

  /** Append a stage log line (R2), noting skips on errored rows. */
  private def logStage(df: DataFrame, stage: String): DataFrame =
    df.withColumn("logs", array_append(col("logs"),
      when(col("error").isNull, lit(s"$stage: ok"))
        .otherwise(lit(s"$stage: skipped (error)"))))

  /** Stage 3: clean_text (P1). */
  def clean(df: DataFrame): DataFrame =
    logStage(df.withColumn("raw_text",
      guarded(cleanText(col("raw_text")), col("raw_text"), col("error"))), "clean")

  /** Stage 4: classification (C1, deterministic core). */
  def classifyStage(df: DataFrame): DataFrame =
    logStage(df.withColumn("doc_type",
      guarded(classify(col("raw_text")), lit(null).cast(StringType), col("error"))),
      "classification")

  /** Stage 5: schema lookup (J1) — broadcast left join on doc_type
    * (strategy 1), literal fallback schema (strategy 3; the reference's
    * buggy fallback-without-schema is deliberately normalized per SURVEY
    * quirk ledger: ours carries a real empty schema). */
  def schemaLookup(spark: SparkSession, df: DataFrame): DataFrame =
    df.join(broadcast(schemaTable(spark)),
        df("doc_type") === col("schema_doc_type"), "left")
      .withColumn("schema_json",
        coalesce(col("schema_json"), lit("""{"fields":{},"description":"fallback"}""")))
      .withColumn("schema_description",
        coalesce(col("schema_description"),
          concat(lit("Default schema for "), coalesce(col("doc_type"), lit("unknown")), lit(" documents"))))
      .drop("schema_doc_type")

  /** Stage 6: extraction (E1 deterministic core): regex field extractors +
    * prompt normalization rules; structured_data = JSON with empty fields
    * suppressed (P7; to_json drops nulls). */
  def extract(df: DataFrame): DataFrame = {
    val t = col("text_orig") // fields from pre-clean text (see ingest)
    val c = col("raw_text")  // text stats from the cleaned text
    df.withColumn("x_amount", guarded(extractAmount(t), lit(null).cast(DoubleType), col("error")))
      .withColumn("x_email", guarded(extractEmail(t), lit(null).cast(StringType), col("error")))
      .withColumn("x_date", guarded(extractDate(t), lit(null).cast(DateType), col("error")))
      .withColumn("x_phone", guarded(extractPhone(t), lit(null).cast(StringType), col("error")))
      .withColumn("x_first_token", guarded(firstToken(c), lit(null).cast(StringType), col("error")))
      .withColumn("x_n_tokens", guarded(tokenCount(c), lit(null).cast(IntegerType), col("error")))
      .withColumn("structured_data",
        guarded(
          to_json(struct(
            col("x_amount").as("amount"), col("x_email").as("email"),
            col("x_date").as("date"), col("x_phone").as("phone"),
            col("x_first_token").as("first_token"), col("x_n_tokens").as("n_tokens"))),
          lit(null).cast(StringType), col("error")))
  }

  /** Stage 7: validation (X1 deterministic constraints). A field is
    * invalid only when present AND malformed. */
  def validate(df: DataFrame): DataFrame = {
    val feedback = array_compact(array(
      when(!validEmail(col("x_email")), lit("malformed email")),
      when(!validAmount(col("x_amount")), lit("negative amount")),
      when(col("x_n_tokens").isNotNull && col("x_n_tokens") === 0, lit("empty extraction"))))
    df.withColumn("validation_feedback",
        guarded(feedback, array().cast(ArrayType(StringType)), col("error")))
      .withColumn("is_valid",
        guarded(size(col("validation_feedback")) === 0, lit(false), col("error")))
  }

  /** Stages 6-7 with the bounded retry loop (X2/X3, SURVEY §2.8):
    * driver-side split/recompute/union, exactly MaxRetries iterations.
    * Documents still invalid after the budget proceed to persistence
    * anyway (reference routes retries-exhausted past validation,
    * src/agents.py:42-44). Deterministic: iteration count is a
    * compile-time constant. */
  def extractValidateWithRetry(df: DataFrame): DataFrame = {
    // persist before branching: the valid/invalid split and the union
    // both re-read this frame; without it the whole upstream pipeline
    // recomputes once per branch (at 100 TB: checkpoint instead)
    var cur = validate(extract(df)).persist()
    for (i <- 1 to MaxRetries) {
      val ok = cur.filter(col("error").isNotNull || col("is_valid"))
      val bad = cur.filter(col("error").isNull && !col("is_valid"))
        .withColumn("retry_count", lit(i))
      // re-extraction with feedback available to the extractor
      // (retry_count already updated; drop stage outputs, keep envelope)
      val cols = df.columns
      val retried = validate(extract(bad.select(cols.head, cols.tail: _*)))
      cur = ok.unionByName(retried)
    }
    cur
  }

  /** Stage 8: persistence (K2 shape) — pre-generated deterministic id +
    * storage URL, set-oriented (the DB-generated-uuid round trip does not
    * exist in bulk writes; same information, generated in the plan). */
  def persist(df: DataFrame): DataFrame =
    df.withColumn("record_id",
        guarded(md5(concat(col("file_path"), coalesce(col("raw_text"), lit("")))),
          lit(null).cast(StringType), col("error")))
      .withColumn("file_url",
        guarded(concat(lit("mem://store/documents/"),
          element_at(split(col("file_path"), "/"), -1)),
          lit(null).cast(StringType), col("error")))
      .withColumn("created_at", current_timestamp())
      .transform(logStage(_, "persistence"))

  /** Stage 9: response envelope (R1, src/agents.py:297-324). */
  def respond(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      col("error").isNull.as("success"),
      col("error"),
      col("doc_type"),
      col("record_id"),
      col("file_url"),
      col("structured_data"),
      col("is_valid"),
      col("retry_count"),
      col("x_amount"), col("x_email"), col("x_date"), col("x_phone"),
      col("x_first_token"), col("x_n_tokens"),
      col("logs"))

  /** Full pipeline over a fixture dir's `documents` table. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadWide(spark, dir, "documents")
    respond(persist(extractValidateWithRetry(
      schemaLookup(spark, classifyStage(clean(ingest(docs)))))))
  }

  /** Oracle-checkable projection of the pipeline (excludes the
    * wall-clock `created_at`). */
  def pipelineQuery(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir).select(
      col("doc_id"), col("success"), col("doc_type"), col("record_id"),
      col("file_url"), col("x_first_token"), col("x_n_tokens"),
      col("is_valid"), col("retry_count"))
      .orderBy(col("doc_id"))

  /** DuckDB oracle for pipelineQuery: the full stage chain composed from
    * the TextFunctions SQL builders. Mirrors stage order exactly —
    * error gate on RAW text, then clean, classify(cleaned),
    * extract(cleaned), validate, deterministic persistence ids.
    * Deterministic extractors are idempotent, so the retried rows keep
    * their results and only retry_count distinguishes them. */
  def pipelineOracleSql: String = {
    val err = "(text IS NULL OR length(trim(text)) = 0)"
    val cleaned = cleanTextSql("text")
    s"""WITH ext AS (
          SELECT doc_id,
            NOT $err AS success,
            CASE WHEN $err THEN NULL ELSE ${classifySql(cleaned)} END AS doc_type,
            CASE WHEN $err THEN NULL ELSE
              md5('mem://docs/' || doc_id || '.txt' || coalesce($cleaned, '')) END AS record_id,
            CASE WHEN $err THEN NULL ELSE
              'mem://store/documents/' || doc_id || '.txt' END AS file_url,
            CASE WHEN $err THEN NULL ELSE ${firstTokenSql(cleaned)} END AS x_first_token,
            CASE WHEN $err THEN NULL ELSE ${tokenCountSql(cleaned)} END AS x_n_tokens,
            CASE WHEN $err THEN NULL ELSE ${extractEmailSql("text")} END AS x_email,
            CASE WHEN $err THEN NULL ELSE ${extractAmountSql("text")} END AS x_amount
          FROM documents)
        SELECT doc_id, success, doc_type, record_id, file_url,
          x_first_token, x_n_tokens,
          CASE WHEN NOT success THEN FALSE ELSE
            (${validEmailSql("x_email")} AND ${validAmountSql("x_amount")}
             AND NOT coalesce(x_n_tokens = 0, FALSE)) END AS is_valid,
          CASE WHEN success AND NOT (${validEmailSql("x_email")}
               AND ${validAmountSql("x_amount")}
               AND NOT coalesce(x_n_tokens = 0, FALSE))
            THEN $MaxRetries ELSE 0 END AS retry_count
        FROM ext"""
  }
}
