package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the fallback when the two
  * automatic tools don't apply: `broadcast()` (right side too big) and
  * AQE's OptimizeSkewedJoin (which splits oversized shuffle partitions
  * of a sort-merge/shuffled-hash join at runtime, but cannot help when
  * the downstream operator REQUIRES the join's partitioning — a
  * groupBy on the same key right after the join pins the exchange — or
  * when the join runs inside a streaming micro-batch where AQE is off).
  *
  * Shape: the skewed side gets a deterministic salt in [0, nSalts), so
  * one hot key fans out over nSalts reducers; the other side is
  * replicated nSalts× via a small explode. Join key becomes
  * (key, salt) — same result set, bounded per-reducer row count.
  * Cost model: replication multiplies the OTHER side's shuffle volume
  * by nSalts, so this only wins when |other| · nSalts ≪ the hot key's
  * row count; pick nSalts ≈ hot-partition-bytes / target-bytes.
  */
object SkewJoin {

  /** Equi-join `skewed` with `other` on `key`, salting the skewed side.
    *
    * The salt must be deterministic (re-computed identically if a task
    * retries — a `rand()` salt can duplicate or lose rows under
    * speculative execution) yet spread a single hot key: it hashes ALL
    * of the skewed row's columns. Identical duplicate rows share a salt
    * by construction; a corpus whose hot key carries byte-identical
    * payloads should exact-dedup first (that is the cheaper fix).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, "nSalts must be positive")
    // right/full outer would emit every UNMATCHED right row nSalts times
    // (one per replicated salt copy) — reject rather than silently
    // multiply; flip the sides for a right-skewed outer join
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed(joinType.toLowerCase.replace("_", "")) ||
        allowed(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    require(!skewed.columns.contains("_salt") && !other.columns.contains("_salt"),
      "saltedJoin: inputs must not already carry a _salt column")
    val saltExpr: Column =
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(nSalts))
    val left = skewed.withColumn("_salt", saltExpr.cast("int"))
    val right = other
      .withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    val joined = left.join(right,
      left(key) === right(key) && left("_salt") === right("_salt"), joinType)
    // drop the plumbing and the duplicated right-side key column
    joined.drop(right(key)).drop(left("_salt")).drop(right("_salt"))
  }
}
