package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.operators.{DocPipeline, Similarity}
import graft.sources.BinaryIngest

/** Round-2 behavior: schema-driven extraction (E1+E5), feedback-aware
  * retry (X2/X3), single-pass binary ingest, scale-adaptive LSH. */
class Round2Spec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def pipe(rows: Seq[(Long, String)]) =
    DocPipeline.extractValidateWithRetry(
      DocPipeline.schemaLookup(spark,
        DocPipeline.classifyStage(DocPipeline.clean(
          DocPipeline.ingest(rows.toDF("doc_id", "text"))))))

  test("schema-driven extraction: fields gated by the retrieved schema") {
    val out = pipe(Seq(
      // classifies 'invoice' -> schema wants amount,date,email (no phone)
      (1L, "invoice total 55.25 bill a@b.com on 2024-03-12 tel 555-0100"),
      // classifies 'form' (checkbox) -> schema wants email,phone (no amount)
      (2L, "checkbox total 55.25 bill a@b.com on 2024-03-12 tel 555-0100"),
      // classifies 'other' -> fallback empty schema -> advisory: everything
      (3L, "zzz total 55.25 bill a@b.com on 2024-03-12 tel 555-0100")))
      .select("doc_id", "doc_type", "x_amount", "x_phone", "x_email")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "invoice")
    assert(out(1L).getDouble(2) == 55.25 && out(1L).isNullAt(3))
    assert(out(2L).getString(1) == "form")
    assert(out(2L).isNullAt(2) && out(2L).getString(3) == "+555-0100")
    assert(out(3L).getString(1) == "other")
    assert(out(3L).getDouble(2) == 55.25 && out(3L).getString(3) == "+555-0100"
      && out(3L).getString(4) == "a@b.com")
  }

  test("feedback-aware retry: negative amount flips to valid on retry") {
    val out = pipe(Seq((1L, "invoice total -55.25 a@b.com on 2024-03-12")))
      .select("x_amount", "is_valid", "retry_count").collect()(0)
    assert(out.getDouble(0) == 55.25) // retry re-scanned non-negative
    assert(out.getBoolean(1) && out.getInt(2) == 1)
  }

  test("retries exhausted still persists: missing required amount") {
    val out = pipe(Seq((1L, "invoice a@b.com on 2024-03-12")))
      .select("x_amount", "is_valid", "retry_count").collect()
    // persist() happens later in run(); here the envelope must carry the
    // exhausted state forward rather than dropping the row
    assert(out.length == 1)
    val r = out(0)
    assert(r.isNullAt(0) && !r.getBoolean(1) && r.getInt(2) == 1)
  }

  test("binary ingest is single-pass: no join in the optimized plan") {
    val bin = Seq(("d/a.txt", 5L, "hello".getBytes("UTF-8")))
      .toDF("path", "length", "content")
    val out = BinaryIngest.ingest(spark, bin)
    assert(out.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty)
    val row = out.collect()(0)
    assert(row.getAs[String]("raw_text") == "hello"
      && row.getAs[String]("fmt") == "text")
  }

  test("ext() uses the basename only") {
    val df = Seq("/a.b/file", "/a/b.PDF", "x.tar.gz", "plain")
      .toDF("path")
    val got = df.select(BinaryIngest.ext(col("path"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("", "pdf", "gz", ""))
  }

  test("adaptiveBits grows with corpus size, integer contract") {
    assert(Similarity.adaptiveBits(0) == 4)
    assert(Similarity.adaptiveBits(2048) == 4)
    assert(Similarity.adaptiveBits(2049) == 5)
    assert(Similarity.adaptiveBits(1000000) == 13)
    assert(Similarity.adaptiveBits(Long.MaxValue) == 16) // capped
  }
}
