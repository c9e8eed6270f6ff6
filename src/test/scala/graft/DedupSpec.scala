package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // synthetic corpus with a known dup structure, written once as parquet
  // so the operators' Tables.load path is exercised end-to-end
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s1", 43L), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat", "en", "s2", 43L), // near dup of 0
      (3L, "completely different words entirely unrelated text", "en", "s3", 50L),
      (4L, "", "en", "s4", 0L)) // empty
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups identical texts, keeps min doc_id") {
    val out = Dedup.exactDedup(spark, corpusDir).collect()
    val byKeeper = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeeper(0L) == 2) // docs 0 and 1
    assert(byKeeper(2L) == 1)
    assert(byKeeper(3L) == 1)
  }

  test("jaccard pairs: exact dup has j=1.0, near dup above 0.5, unrelated absent") {
    val out = Dedup.jaccardPairs(spark, corpusDir, minJ = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 1.0))
    assert(out.exists(p => p._1 == 0 && p._2 == 2 && p._3 > 0.5 && p._3 < 1.0))
    assert(!out.exists(p => p._2 == 3 || p._1 == 3))
  }

  test("minhash: identical docs have identical signatures; empty doc gets sentinel") {
    val sigs = Dedup.minhashSignatures(spark, corpusDir).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    assert(sigs(4L).forall(_ == Dedup.P))
  }

  test("LSH pairs find the exact and near dup") {
    val out = Dedup.lshPairs(spark, corpusDir, minJ = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((0L, 1L)))
    // near-dup (0,2) has j≈0.56; LSH may or may not band-collide it, but
    // the exact dup must always collide (identical signatures)
  }

  test("simhash: identical texts -> hamming 0; banded pairs find them") {
    val sigs = Dedup.simhashSignatures(spark, corpusDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    val pairs = Dedup.simhashPairs(spark, corpusDir, maxHamming = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 == 0))
  }
}
