package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TensorEncode

/** The V1 encoder seam proven with actual tensor math (embedding-bag +
  * int8 projection), not string hashing. */
class TensorEncodeSpec extends AnyFunSuite {
  import TestSession.spark

  private val enc = new TensorEncode.Int8Projection

  test("model shape: Vocab x Dim int8 weights, values in [-127, 127]") {
    assert(TensorEncode.weights.length == TensorEncode.Vocab)
    assert(TensorEncode.weights.forall(_.length == TensorEncode.Dim))
    assert(TensorEncode.weights.flatten.forall(v => v >= -127 && v <= 127))
    // not a degenerate matrix: rows differ (random-init, not constant)
    assert(TensorEncode.weights.map(_.toSeq).distinct.length > TensorEncode.Vocab / 2)
  }

  test("embedding-bag linearity: encode(a ++ b) = encode(a) + encode(b)") {
    // the defining property of a bag-of-tokens + linear projection —
    // string hashing has no such structure
    val Seq(ab) = enc.encode(Seq("alpha beta gamma delta"))
    val Seq(a, b) = enc.encode(Seq("alpha beta", "gamma delta"))
    val sum = a.zip(b).map { case (x, y) => x + y }
    assert(ab.toSeq == sum.toSeq)
  }

  test("token order is immaterial; token multiplicity is not") {
    val Seq(x, y, z) = enc.encode(Seq("red blue", "blue red", "red red blue"))
    assert(x.toSeq == y.toSeq)
    assert(x.toSeq != z.toSeq)
  }

  test("batching invariance: one batch of n equals n batches of one") {
    val texts = Seq("first document", "second one", "", "third   with  gaps")
    val batched = enc.encode(texts).map(_.toSeq)
    val single = texts.map(t => enc.encode(Seq(t)).head.toSeq)
    assert(batched == single)
  }

  test("empty and null-ish texts encode to the zero vector") {
    val Seq(e1, e2) = enc.encode(Seq("", "   "))
    assert(e1.forall(_ == 0f) && e2.forall(_ == 0f))
  }

  test("embedColumn runs the encoder through mapPartitions over the fixture") {
    val docs = Tables.loadWide(spark, TestSession.sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).limit(20)
    val out = TensorEncode.embedColumn(docs, "text", "embedding").collect()
    assert(out.nonEmpty)
    val local = docs.collect().map(r =>
      r.getLong(0) -> enc.encode(Seq(r.getString(1))).head.toSeq).toMap
    out.foreach { r =>
      assert(r.getSeq[Float](2) == local(r.getLong(0)),
        s"distributed encode mismatch for doc ${r.getLong(0)}")
    }
  }

  test("tensor-encoder top-k vs pseudoEmbed top-k: recall reported") {
    val tensor = TensorEncode.docEmbeddingsTensorQuery(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // pseudoEmbed ranks the same corpus under the same query ids (first 3
    // docs, k=3) via the string-hash embedding
    val offset = 1000000L
    val pseudo = graft.operators.EmbeddingStore
      .docEmbeddingsQuery(spark, TestSession.sfDir)
      .filter(col("vec_id") >= offset) // only doc-vs-doc neighbors
      .collect().map(r => (r.getLong(0) - offset, r.getLong(2) - offset)).toSet
    val overlap = tensor.intersect(pseudo).size
    info(s"top-3 agreement tensor vs pseudoEmbed: $overlap/${tensor.size} pairs " +
      "(different models rank differently; the seam, not the ranks, is under test)")
    assert(tensor.nonEmpty)
  }
}
