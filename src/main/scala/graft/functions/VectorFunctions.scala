package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector operators over `array<float>` embedding columns (SURVEY §2.6).
  *
  * Dimension is NEVER hard-coded (reference's EMBEDDING_DIMENSION is a
  * config knob, /root/reference/src/pinecone_utils.py:13; fixtures use 64
  * vs the reference's 384).
  *
  * Determinism contract: all arithmetic is double-precision with a fixed
  * left-to-right fold order, so scores are bit-identical to the DuckDB
  * oracle (which uses the same index-ordered list fold — see the *Sql
  * builders). `aggregate`/`zip_with` are codegen'd higher-order functions;
  * if BENCH shows them hot, the upgrade path is a custom Catalyst
  * Expression with doGenCode (SURVEY §4) — same semantics, fewer
  * allocations.
  */
object VectorFunctions {

  private def toD(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Left-to-right fold of element products: sum_i a[i]*b[i], in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Cosine similarity = dot/(|a|*|b|); null-safe on zero vectors.
    * Native codegen'd expression (graft.plans.CosineSimilarity) — the
    * single-pass left-to-right fold is bit-identical to the HOF form
    * and to the oracle's list fold, but allocation-free. Inputs must be
    * `array<float>` (the embedding storage type). */
  def cosine(a: Column, b: Column): Column = NativeFunctions.cosineSim(a, b)
  def cosineSql(a: String, b: String): String = {
    val d = dotSql(a, b)
    val na = normSql(a)
    val nb = normSql(b)
    s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN NULL ELSE ($d) / (($na) * ($nb)) END"
  }

  /** L2 (euclidean) distance, same fold-order contract. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toD(a), toD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
  def l2Sql(a: String, b: String): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      s"(acc, x) -> acc + x))"

  /** Random-hyperplane signature bit: sign of dot(v, plane) packed over a
    * seeded deterministic plane set — the LSH scale path for cosine
    * search. Planes are generated engine-side (deterministic from seed)
    * and broadcast; see Similarity.lshBuckets. */
  def hyperplaneBit(v: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    when(dot(v, planeCol) >= 0.0, lit(1)).otherwise(lit(0))
  }
}
