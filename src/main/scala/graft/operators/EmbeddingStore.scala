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
    * `existing`; ties inside `updates` resolve to the last by `seq`. */
  def upsert(existing: DataFrame, updates: DataFrame, idCol: String = "vec_id",
             seqCol: Option[String] = None): DataFrame = {
    val e = existing.withColumn("_prio", lit(0L))
    val u = seqCol match {
      case Some(s) => updates.withColumn("_prio", lit(1L) + col(s).cast("long"))
      case None => updates.withColumn("_prio", lit(1L))
    }
    val all = e.unionByName(u, allowMissingColumns = false)
    val w = Window.partitionBy(col(idCol)).orderBy(col("_prio").desc)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_prio", "_rn")
  }

  /** Upsert + persist to a Parquet store dir (the K3 sink). */
  def upsertToStore(spark: SparkSession, storeDir: String,
                    updates: DataFrame, idCol: String = "vec_id"): Unit = {
    val existing =
      try spark.read.parquet(storeDir)
      catch { case _: Exception => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updates.schema) }
    val merged = upsert(existing, updates, idCol)
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
