package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch LLM-inference operator (SURVEY §2.11 L1) — the pluggable
  * nondeterministic backend behind the deterministic cores (C1
  * classification, E1 extraction, X1 validation).
  *
  * Reference semantics: one blocking chat completion per call
  * (/root/reference/src/groq_client.py:19-41), called from
  * classification/extraction/validation agents with per-site params
  * (max_tokens, temperature — src/agents.py:93,181,227-231).
  *
  * Spark-first shape: `mapPartitions` — ONE client per partition,
  * bounded in-partition batching, results as a new column. The operator
  * is `Column`-in/`Column`-out at the call site so the deterministic
  * stand-in and a real HTTP backend are interchangeable; everything
  * here is engine plumbing, no network code (zero-egress container —
  * a real backend implements `LlmBackend.complete`).
  *
  * Scale posture: inference is the pipeline's only expensive per-row
  * op; partition-level clients bound connection count at
  * (executors × cores), batching amortizes round trips, and the stage
  * stays narrow (no shuffle). Results must be treated as
  * nondeterministic — never cached across runs, never oracle-checked
  * (the deterministic cores are what t2 verifies).
  */
object Inference {

  /** Pluggable completion backend; one instance per partition. */
  trait LlmBackend extends Serializable {
    /** Complete a batch of prompts (implementations may fan out with
      * bounded concurrency); must return one response per prompt. */
    def complete(prompts: Seq[String], maxTokens: Int, temperature: Double): Seq[String]
  }

  /** Deterministic echo backend for tests/CI: "responds" with a stable
    * function of the prompt — keeps pipelines runnable hermetically. */
  object EchoBackend extends LlmBackend {
    def complete(prompts: Seq[String], maxTokens: Int, temperature: Double): Seq[String] =
      prompts.map(p => s"echo:${p.hashCode}")
  }

  /** Run `backend` over `promptCol`, appending `outCol`. Batches of
    * `batchSize` per round trip within each partition. */
  def inferColumn(df: DataFrame, promptCol: String, outCol: String,
                  backend: LlmBackend = EchoBackend,
                  maxTokens: Int = 1024, temperature: Double = 0.0,
                  batchSize: Int = 16): DataFrame = {
    val schema = df.schema.add(outCol, StringType, nullable = true)
    val promptIdx = df.schema.fieldIndex(promptCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map(r => Option(r.getString(promptIdx)).getOrElse(""))
        val outs =
          try backend.complete(prompts, maxTokens, temperature)
          catch { case _: Exception => prompts.map(_ => null: String) }
        batch.zip(outs).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
