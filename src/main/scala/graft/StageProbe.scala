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
    spark.stop()
  }
}
