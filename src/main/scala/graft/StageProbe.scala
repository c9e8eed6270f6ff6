package graft

import org.apache.spark.sql.functions._

/** Scratch main (r12): stage-level timing of individual operators —
  * where does the wall go inside a query whose physical plan is a
  * single narrow chain? Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-stage-probe")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.DocPipeline._
    // warm codegen for the full chain once
    noop(promptsQuery(spark, dir))

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("enriched only") { noop(enrichedDocs(spark, dir)) }
      time("+ingest+clean") { noop(clean(ingest(enrichedDocs(spark, dir)))) }
      time("+classify") {
        noop(classifyStage(clean(ingest(enrichedDocs(spark, dir)))))
      }
      time("+schemaLookup") {
        noop(schemaLookup(spark, classifyStage(clean(ingest(enrichedDocs(spark, dir))))))
      }
      time("+extract") {
        noop(extract(schemaLookup(spark, classifyStage(clean(ingest(enrichedDocs(spark, dir)))))))
      }
      time("+validate") {
        noop(validate(extract(schemaLookup(spark, classifyStage(clean(ingest(enrichedDocs(spark, dir))))))))
      }
      time("llm_prompts full") { noop(promptsQuery(spark, dir)) }
      time("pipeline_envelope full") { noop(pipelineQuery(spark, dir)) }
    }
    // r13: column-forced slices of the prompts chain (select keeps the
    // named column alive; everything else prunes — isolates each
    // expression family's cost without the downstream ones)
    def base = validate(extract(schemaLookup(spark,
      classifyStage(clean(ingest(enrichedDocs(spark, dir)))))))
    import graft.functions.Prompts
    for (rep <- 1 to 2) {
      println(s"--- fine rep $rep ---")
      time("floor: doc_id only") { noop(base.select(col("doc_id"))) }
      time("force raw_text (clean)") { noop(base.select(col("doc_id"), col("raw_text"))) }
      time("force doc_type (classify)") { noop(base.select(col("doc_id"), col("doc_type"))) }
      time("force schema_fields (variant)") { noop(base.select(col("doc_id"), col("schema_fields"))) }
      time("force feedback (extract regexes)") { noop(base.select(col("doc_id"), col("validation_feedback"))) }
      time("force to_json") { noop(base.select(col("doc_id"), to_json(col("schema_fields")))) }
      time("force classify_prompt") { noop(base.select(col("doc_id"),
        Prompts.classificationPrompt(col("raw_text")))) }
      time("force extract_prompt") { noop(base.select(col("doc_id"),
        Prompts.extractionPrompt(col("doc_type"), to_json(col("schema_fields")),
          col("raw_text"), col("validation_feedback")))) }
      time("both prompts, no sort") { noop(base.select(col("doc_id"),
        Prompts.classificationPrompt(col("raw_text")).as("cp"),
        Prompts.extractionPrompt(col("doc_type"), to_json(col("schema_fields")),
          col("raw_text"), col("validation_feedback")).as("ep"))) }
      // hypothesis: the final orderBy's range-sampling job re-runs the
      // whole per-row chain; sorting BEFORE the narrow chain keeps the
      // output order (projections preserve partition order) and samples
      // only the cheap base
      def baseSorted = validate(extract(schemaLookup(spark,
        classifyStage(clean(ingest(enrichedDocs(spark, dir).orderBy(col("doc_id"))))))))
      time("early-sort full") { noop(baseSorted.select(col("doc_id"),
        Prompts.classificationPrompt(col("raw_text")).as("cp"),
        Prompts.extractionPrompt(col("doc_type"), to_json(col("schema_fields")),
          col("raw_text"), col("validation_feedback")).as("ep"))) }
      time("late-sort full (current)") { noop(promptsQuery(spark, dir)) }
      // does EnsureRequirements elide the trailing sort when the base is
      // already range-partitioned+sorted on doc_id?
      val bothSorted = baseSorted.select(col("doc_id"),
        Prompts.classificationPrompt(col("raw_text")).as("cp"),
        Prompts.extractionPrompt(col("doc_type"), to_json(col("schema_fields")),
          col("raw_text"), col("validation_feedback")).as("ep"))
        .orderBy(col("doc_id"))
      time("early+late sort") { noop(bothSorted) }
      if (rep == 2) {
        val plan = bothSorted.queryExecution.executedPlan.toString
        println("[probe] early+late exchanges: " +
          plan.linesIterator.count(_.contains("Exchange")))
        println("[probe] early+late sorts: " +
          plan.linesIterator.count(_.trim.startsWith("+- Sort") ||
            plan.linesIterator.isEmpty))
      }
    }
    spark.stop()
  }
}
