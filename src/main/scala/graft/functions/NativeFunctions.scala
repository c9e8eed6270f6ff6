package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import graft.plans.{CosineSimilarity, PolyHash}

/** Column builders for graft's native Catalyst expressions — usable on
  * any session (no FunctionRegistry dependency; the SQL names
  * `poly_hash` / `cosine_sim` are additionally registered via
  * GraftExtensions for the SQL surface). */
object NativeFunctions {
  def polyHash(c: Column): Column =
    Bridge.column(PolyHash(Bridge.expression(c)))
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
