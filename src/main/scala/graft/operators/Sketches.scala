package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.functions.NativeFunctions.kmvMins

/** Sketch operators (north star: approximate distinct counting that a
  * 100 TB training-data pipeline needs, in a form the DuckDB oracle can
  * hash-match — unlike HLL, whose register layout is engine-private).
  *
  * KMV distinct-count: hash each key with an exact multiplicative hash
  * mod P (M is coprime to the prime P, so keys < P stay distinct), keep
  * the k smallest distinct hashes per group (graft.plans.KmvMins — a
  * bounded TypedImperativeAggregate that partial-aggregates to <= k
  * longs per group per partition BEFORE the shuffle), and estimate
  * #distinct = (k−1)·P div h_(k) — integer arithmetic end to end.
  *
  * Scale contrast, measured shapes: count(DISTINCT x) shuffles every
  * distinct (group, x) pair; the sketch shuffles k longs per group.
  */
object Sketches {

  val P = 1000000007L
  /** Knuth multiplicative constant; gcd(M, P) = 1. */
  val M = 2654435761L

  /** Per-event-type distinct-user estimate (KMV, k smallest hashes) next
    * to the exact count — the oracle checks BOTH, which also pins the
    * estimator's error behavior on this corpus.
    *
    * The key is reduced mod P BEFORE the multiply: M·(P−1) ≈ 2.65e18
    * fits a Long, whereas M·key overflows (silently in Spark, an error
    * in DuckDB) for keys above ~3.47e9 — inside this operator's stated
    * scale. Keys ≥ P fold (hash collisions) — fine for a sketch: they
    * can only under-count by ~n/P, far below the estimator's own
    * 1/sqrt(k) error until n approaches billions of DISTINCT keys per
    * group, at which point raise P/k. */
  def distinctUsersKmv(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val ev = Tables.loadWide(spark, dir, "events")
    val h = (lit(M) * (col("user_id") % lit(P))) % lit(P)
    // get() in the otherwise-branch (0-based, null on out-of-bounds)
    // keeps the eagerly-evaluated expression safe for groups with < k
    // distinct users
    ev.select(col("event_type"), h.as("h"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(kmvMins(col("h"), k).as("mins"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"),
        when(size(col("mins")) < k, size(col("mins")).cast(LongType))
          .otherwise(expr(s"${(k - 1).toLong * P}L div get(mins, ${k - 1})"))
          .as("est_users"),
        col("n_exact"))
      .orderBy(col("event_type"))
  }

  def distinctUsersKmvSql(k: Int = 64): String =
    s"""WITH d AS (SELECT DISTINCT event_type, ($M * (user_id % $P)) % $P AS h FROM events),
        r AS (SELECT event_type, h,
                row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
              FROM d),
        s AS (SELECT event_type, count(*) AS nd,
                max(CASE WHEN rn = $k THEN h END) AS hk
              FROM r GROUP BY 1),
        e AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
              FROM events GROUP BY 1)
        SELECT s.event_type,
               CASE WHEN nd < $k THEN nd ELSE ${(k - 1).toLong * P} // hk END AS est_users,
               n_exact
        FROM s JOIN e ON s.event_type = e.event_type"""
}
