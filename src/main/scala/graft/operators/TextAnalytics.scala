package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` corpus (north star: the
  * operations a training-data pipeline runs at 100 TB — language ID,
  * quality scoring, token counting, fingerprinting; SURVEY §2.2/§2.3).
  *
  * All per-document ops are narrow (embarrassingly parallel, whole-stage
  * codegen'd Column expressions, no UDFs); the aggregates use only
  * order-independent exact arithmetic (counts, long sums) so results are
  * deterministic under any partitioning.
  */
object TextAnalytics {

  /** Per-document profile: language, token count, first token, rolling-hash
    * fingerprint. One narrow pass over the corpus. */
  def docProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.loadWide(spark, dir, "documents")
      .select(
        col("doc_id"),
        langId(col("text")).as("lang_pred"),
        tokenCount(col("text")).as("n_tokens"),
        firstToken(col("text")).as("first_token"),
        fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  def docProfileSql: String =
    s"""SELECT doc_id, ${langIdSql("text")} AS lang_pred,
        ${tokenCountSql("text")} AS n_tokens,
        ${firstTokenSql("text")} AS first_token,
        ${fingerprintSql("text")} AS fp
        FROM documents"""

  /** Per-document quality score (bounded [0,1] composite). Kept separate
    * from docProfile so a float mismatch is isolated to one query. */
  def docQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.loadWide(spark, dir, "documents")
      .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def docQualitySql: String =
    s"SELECT doc_id, ${qualityScoreSql("text")} AS quality FROM documents"

  /** C1 classification over the cleaned text (pipeline stages 3-4 as a
    * standalone query). */
  def docClassify(spark: SparkSession, dir: String): DataFrame =
    Tables.loadWide(spark, dir, "documents")
      .select(col("doc_id"),
        classify(cleanText(col("text"))).as("doc_type"))
      .orderBy(col("doc_id"))

  def docClassifySql: String =
    s"SELECT doc_id, ${classifySql(cleanTextSql("text"))} AS doc_type FROM documents"

  /** Per-document token accounting: whitespace tokens vs BPE-ish
    * subword segments (the two token-count bases a training-data
    * pipeline budgets with). */
  def docTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.loadWide(spark, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("ws_tokens"),
        subwordCount(col("text")).as("subword_tokens"))
      .orderBy(col("doc_id"))

  def docTokensSql: String =
    s"""SELECT doc_id, ${tokenCountSql("text")} AS ws_tokens,
        ${subwordCountSql("text")} AS subword_tokens FROM documents"""

  /** Corpus rollup by predicted language: doc counts + exact long token
    * sums (order-independent, deterministic under parallel agg). */
  def langAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadWide(spark, dir, "documents")
      .select(langId(col("text")).as("lang_pred"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("lang_pred"))

  def langAggSql: String =
    s"""SELECT ${langIdSql("text")} AS lang_pred, count(*) AS n_docs,
        CAST(sum(CAST(${tokenCountSql("text")} AS BIGINT)) AS BIGINT) AS sum_tokens
        FROM documents GROUP BY 1"""
}
