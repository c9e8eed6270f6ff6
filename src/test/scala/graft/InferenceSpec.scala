package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Inference

class InferenceSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("inferColumn appends backend output per row, batched per partition") {
    val df = (1 to 50).map(i => (i.toLong, s"prompt $i")).toDF("id", "prompt")
      .repartition(4)
    val out = Inference.inferColumn(df, "prompt", "completion", batchSize = 8)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getString(2) == s"echo:${r.getString(1).hashCode}"))
  }

  test("backend failure yields null completions, not task failure") {
    object Boom extends Inference.LlmBackend {
      def complete(p: Seq[String], m: Int, t: Double): Seq[String] =
        throw new RuntimeException("backend down")
    }
    val df = Seq((1L, "p")).toDF("id", "prompt")
    val out = Inference.inferColumn(df, "prompt", "completion", backend = Boom)
    assert(out.collect()(0).isNullAt(2)) // per-row error channel semantics
  }
}
