package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.functions.NativeFunctions.{cmsAgg, kmvMins, quantileSketch}
import graft.plans.CmsHash

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

  /** The KMV key hash, shared by every sketch entry point. The key is
    * reduced mod P BEFORE the multiply: M·(P−1) ≈ 2.65e18 fits a Long,
    * whereas M·key overflows for keys above ~3.47e9. Keys ≥ P fold
    * (collisions) — fine for a sketch (see distinctUsersKmv scaladoc). */
  private[graft] def kmvHash(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(M) * (key % lit(P))) % lit(P)

  /** The (k−1)·P div h_(k) estimator over a sorted mins array column;
    * exact pass-through below k. get() (0-based, null on out-of-bounds)
    * keeps the eagerly-evaluated otherwise-branch safe for small groups. */
  private[graft] def kmvEstimate(mins: String, k: Int): org.apache.spark.sql.Column =
    when(size(col(mins)) < k, size(col(mins)).cast(LongType))
      .otherwise(expr(s"${(k - 1).toLong * P}L div get($mins, ${k - 1})"))

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
    ev.select(col("event_type"), kmvHash(col("user_id")).as("h"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(kmvMins(col("h"), k).as("mins"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"),
        kmvEstimate("mins", k).as("est_users"),
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

  /** KMV sketch ALGEBRA (theta-sketch-style set operations): distinct
    * union and intersection estimates for every event-type pair, from
    * the per-type k-minimum-values sketches alone.
    *
    * The merged sketch of A ∪ B is the k smallest distinct hashes of
    * S_A ∪ S_B (a merge of two k-long arrays — no re-scan of the data),
    * so est_union reuses the plain KMV estimator on the merged mins.
    * For the intersection, the merged sketch is a size-k uniform sample
    * of A ∪ B below its threshold, so the match fraction
    * |U ∩ S_A ∩ S_B| / k estimates the Jaccard of the two key sets and
    * est_intersect = matches · est_union div k — integer arithmetic end
    * to end, hash-matchable by the oracle.
    *
    * Scale posture: the per-type sketches shuffle ≤ k longs per group
    * (the KmvMins partial aggregate); the pairwise combine runs on a
    * #types² sketch table — driver-size model state kept IN the plan
    * (a broadcast nested-loop join over rows of k-long arrays). The
    * exact columns pin the estimator on this corpus, same posture as
    * [[distinctUsersKmv]]; a 100 TB run drops them. */
  def kmvSetOps(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    kmvSetOpsOn(Tables.loadWide(spark, dir, "events"), k)

  /** [[kmvSetOps]] over any (event_type, user_id) frame — the seam the
    * small-union-regime spec injects through. */
  def kmvSetOpsOn(ev: DataFrame, k: Int = 64): DataFrame = {
    val sk = ev.select(col("event_type"), kmvHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(kmvMins(col("h"), k).as("mins"))
    kmvSetOpsFromSketches(sk, ev, k)
  }

  /** The set-algebra half of [[kmvSetOpsOn]] over a PREBUILT
    * (event_type, mins) sketch table — the seam the streaming KMV store
    * serves through: because a KMV sketch is a pure function of the key
    * set, merged store partials feed the identical pairwise algebra the
    * batch path runs (`ev` supplies only the exact counterpart columns
    * that pin the estimator on this corpus; a 100 TB run drops them). */
  private[graft] def kmvSetOpsFromSketches(sk: DataFrame, ev: DataFrame,
                                           k: Int = 64): DataFrame = {
    val pairs = sk.select(col("event_type").as("a_type"), col("mins").as("a_mins"))
      .join(sk.select(col("event_type").as("b_type"), col("mins").as("b_mins")),
        col("a_type") < col("b_type"))
    val est = pairs
      .withColumn("u",
        slice(array_sort(array_distinct(concat(col("a_mins"), col("b_mins")))), 1, k))
      .withColumn("est_union", kmvEstimate("u", k))
      .withColumn("n_match",
        size(array_intersect(array_intersect(col("u"), col("a_mins")), col("b_mins"))))
      // divide by |U|, not k: below k the merged sketch holds EVERY hash,
      // est_union = |U|, and the quotient must collapse to the exact
      // match count instead of under-counting by |U|/k
      .withColumn("est_intersect",
        expr("(CAST(n_match AS BIGINT) * est_union) div size(u)"))
    // exact counterparts: one distinct shuffle keyed (type, user), then a
    // user-keyed equi-join for the pairwise overlap
    val tu = ev.select(col("event_type"), col("user_id")).distinct()
    val cnt = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val ix = tu.select(col("event_type").as("ia"), col("user_id"))
      .join(tu.select(col("event_type").as("ib"), col("user_id").as("u2")),
        col("user_id") === col("u2") && col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("nx"))
    est
      .join(cnt.select(col("event_type").as("ca"), col("n").as("na")),
        col("a_type") === col("ca"))
      .join(cnt.select(col("event_type").as("cb"), col("n").as("nb")),
        col("b_type") === col("cb"))
      .join(ix, col("a_type") === col("ia") && col("b_type") === col("ib"), "left")
      .select(col("a_type"), col("b_type"),
        col("est_union"),
        (col("na") + col("nb") - coalesce(col("nx"), lit(0L))).as("n_union_exact"),
        col("est_intersect"),
        coalesce(col("nx"), lit(0L)).as("n_intersect_exact"))
      .orderBy(col("a_type"), col("b_type"))
  }

  /** Grouped order-price quantiles via the mergeable KLL-style sketch
    * (graft.plans.QuantileSketch) — the third sketch leg next to KMV
    * (distinct) and TopFreq (heavy hitters). Prices quantize to exact
    * integer cents before sketching and divide back ONCE at the end, so
    * the exact-regime result is bit-identical to a plain SQL type-1
    * quantile. k = 1 << 18 keeps the fixture groups (≤ ~60k orders at
    * sf0.1) inside the exact regime — the oracle checks values AND
    * rank semantics; the compacting regime's error bound is
    * property-tested in SketchesSpec.
    *
    * Scale contrast: an exact grouped percentile sorts every row of the
    * group; this ships one O(k·log(n/k))-long buffer per group per
    * partition, map-side combined (ObjectHashAggregate) before the
    * shuffle — the quantile twin of distinctUsersKmv's posture. */
  def orderQuantilesSketch(spark: SparkSession, dir: String,
                           k: Int = 1 << 18): DataFrame = {
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    Tables.loadWide(spark, dir, "orders")
      .select(col("o_orderpriority"), cents.as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(quantileSketch(col("c"), k, Seq(0.25, 0.5, 0.75)).as("qs"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"),
        (element_at(col("qs"), 1).cast("double") / 100.0).as("p25"),
        (element_at(col("qs"), 2).cast("double") / 100.0).as("p50"),
        (element_at(col("qs"), 3).cast("double") / 100.0).as("p75"),
        col("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Type-1 (lower) quantiles at dyadic probs: floor(q·(n−1)) is exact
    * IEEE arithmetic on both engines for q ∈ {.25, .5, .75}. */
  def orderQuantilesSketchSql: String =
    """WITH o AS (SELECT o_orderpriority AS p,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
       r AS (SELECT p, c,
         row_number() OVER (PARTITION BY p ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY p) AS n FROM o),
       q AS (SELECT p,
         max(CASE WHEN rk = CAST(floor(0.25 * (n - 1)) AS BIGINT) THEN c END) AS c25,
         max(CASE WHEN rk = CAST(floor(0.5 * (n - 1)) AS BIGINT) THEN c END) AS c50,
         max(CASE WHEN rk = CAST(floor(0.75 * (n - 1)) AS BIGINT) THEN c END) AS c75,
         CAST(max(n) AS BIGINT) AS n_orders
         FROM r GROUP BY p)
       SELECT p AS o_orderpriority,
         CAST(c25 AS DOUBLE) / 100.0 AS p25,
         CAST(c50 AS DOUBLE) / 100.0 AS p50,
         CAST(c75 AS DOUBLE) / 100.0 AS p75,
         n_orders
       FROM q"""

  /** Count-Min point-frequency probe over a flattened depth×width
    * matrix column ([[graft.plans.CmsAgg]]): min over the depth rows of
    * the key's bucket counter. Pure Column integer arithmetic — the
    * same formula the oracle runs — so estimates are engine-exact. */
  def cmsEstimate(matrix: Column, key: Column, depth: Int, width: Int): Column = {
    val x = pmod(key, lit(CmsHash.P))
    val reads = (0 until depth).map { d =>
      val bucket =
        ((lit(CmsHash.a(d)) * x + lit(CmsHash.b(d))) % lit(CmsHash.P)) % lit(width.toLong)
      element_at(matrix, (lit(d.toLong * width) + bucket + lit(1L)).cast("int"))
    }
    if (reads.size == 1) reads.head else least(reads: _*)
  }

  /** Per-event-type Count-Min sketch of user activity, probed at the
    * type's top-3 most-active users (exact counts pin the estimator,
    * same posture as [[distinctUsersKmv]]). n_cms ≥ n_exact always;
    * over-counts only when a key collides in ALL depth rows — and since
    * the ORACLE recomputes the identical bucket matrix (the CMS hash
    * family is plain integer arithmetic, see [[graft.plans.CmsHash]]),
    * the comparison is exact even in the collision regime.
    *
    * Scale contrast: the exact probe side is a (type, user) count
    * shuffle, but the SKETCH side ships one 4×8192-long matrix per
    * type per partition (map-side combined) — at 100 TB the matrix
    * answers any point query without re-scanning, the Misra-Gries
    * complement (TopFreq names the heavy hitters; the CMS counts
    * arbitrary named keys). */
  def eventsCmsCounts(spark: SparkSession, dir: String,
                      depth: Int = 4, width: Int = 8192): DataFrame = {
    val ev = Tables.loadWide(spark, dir, "events")
    val sk = ev.groupBy(col("event_type"))
      .agg(cmsAgg(col("user_id"), depth, width).as("cms"))
    val exact = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n_exact").desc, col("user_id"))
    val probes = exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    probes.join(sk, Seq("event_type"))
      .select(col("event_type"), col("user_id"), col("n_exact"),
        cmsEstimate(col("cms"), col("user_id"), depth, width).as("n_cms"))
      .orderBy(col("event_type"), col("user_id"))
  }

  def eventsCmsCountsSql(depth: Int = 4, width: Int = 8192): String =
    s"""WITH ds AS (SELECT * FROM range(0, $depth) t(d)),
        mat AS (
          SELECT event_type, d,
                 (((2654435761 + 104729 * d) % $P) * (user_id % $P)
                  + (12582917 * (d + 1)) % $P) % $P % $width AS bucket,
                 count(*) AS c
          FROM events CROSS JOIN ds
          GROUP BY 1, 2, 3),
        exact AS (SELECT event_type, user_id, count(*) AS n_exact
                  FROM events GROUP BY 1, 2),
        probes AS (SELECT event_type, user_id, n_exact FROM (
          SELECT event_type, user_id, n_exact,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY n_exact DESC, user_id) AS rn
          FROM exact) WHERE rn <= 3)
        SELECT p.event_type, p.user_id, p.n_exact, min(m.c) AS n_cms
        FROM probes p CROSS JOIN ds
        JOIN mat m ON m.event_type = p.event_type AND m.d = ds.d
          AND m.bucket = (((2654435761 + 104729 * ds.d) % $P) * (p.user_id % $P)
                          + (12582917 * (ds.d + 1)) % $P) % $P % $width
        GROUP BY 1, 2, 3"""

  def kmvSetOpsSql(k: Int = 64): String =
    s"""WITH d AS (SELECT DISTINCT event_type, ($M * (user_id % $P)) % $P AS h FROM events),
        r AS (SELECT event_type, h,
                row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
              FROM d),
        sk AS (SELECT event_type, list(h ORDER BY h) AS mins
               FROM r WHERE rn <= $k GROUP BY 1),
        p AS (SELECT a.event_type AS a_type, b.event_type AS b_type,
                     a.mins AS a_mins, b.mins AS b_mins
              FROM sk a JOIN sk b ON a.event_type < b.event_type),
        m AS (SELECT a_type, b_type, a_mins, b_mins,
                     list_sort(list_distinct(list_concat(a_mins, b_mins)))[1:$k] AS u
              FROM p),
        e AS (SELECT a_type, b_type, len(u) AS nu,
                     CASE WHEN len(u) < $k THEN len(u)
                          ELSE ${(k - 1).toLong * P} // u[$k] END AS est_union,
                     len(list_intersect(list_intersect(u, a_mins), b_mins)) AS n_match
              FROM m),
        tu AS (SELECT DISTINCT event_type, user_id FROM events),
        cnt AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        ix AS (SELECT a.event_type AS ia, b.event_type AS ib, count(*) AS nx
               FROM tu a JOIN tu b
                 ON a.user_id = b.user_id AND a.event_type < b.event_type
               GROUP BY 1, 2)
        SELECT e.a_type, e.b_type, est_union,
               ca.n + cb.n - coalesce(nx, 0) AS n_union_exact,
               (n_match * est_union) // nu AS est_intersect,
               coalesce(nx, 0) AS n_intersect_exact
        FROM e
        JOIN cnt ca ON e.a_type = ca.event_type
        JOIN cnt cb ON e.b_type = cb.event_type
        LEFT JOIN ix ON e.a_type = ix.ia AND e.b_type = ix.ib"""
}
