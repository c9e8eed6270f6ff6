package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers graft's native expressions in the
  * session's FunctionRegistry (activated via
  * `spark.sql.extensions=graft.plans.GraftExtensions`, set in
  * GraftSession). Gives the SQL surface and `call_function` access to
  * the codegen'd operators. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, null, "poly_hash",
        "poly_hash(s) - polynomial rolling hash mod 1e9+7 over code points", ""),
      (children: Seq[Expression]) => PolyHash(children.head)))
  }
}
