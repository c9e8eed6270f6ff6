package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key — the shape that melts one reducer
  private def skewedFact = (1 to 2000).map { i =>
    val k = if (i % 10 == 0) (i % 7).toLong else 42L
    (k, s"payload_$i")
  }.toDF("k", "payload")

  private def dim = (0L to 60L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("saltedJoin == plain join (inner and left), duplicates and misses intact") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (jt <- Seq("inner", "left")) {
        val plain = skewedFact.join(dim, Seq("k"), jt)
          .select(col("k"), col("payload"), col("attr"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
        val salted = SkewJoin.saltedJoin(skewedFact, dim, "k", nSalts = 8, joinType = jt)
          .select(col("k"), col("payload"), col("attr"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
        assert(salted.toSeq == plain.toSeq, s"join type $jt diverged")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin partitions the shuffle on (key, salt), fanning the hot key out") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SkewJoin.saltedJoin(skewedFact, dim, "k", nSalts = 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("_salt"), p.take(3000))
      // the exchange key set includes the salt — one hot key now spans
      // nSalts reducers instead of one
      val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(ex.nonEmpty && ex.forall(_.contains("_salt")),
        s"exchanges not salted:\n${ex.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salt is deterministic: re-running the same plan yields the same salts") {
    val a = skewedFact.select(pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .collect().map(_.getLong(0)).toSeq
    val b = skewedFact.select(pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.distinct.size > 1, "salt must actually spread rows")
  }
}
