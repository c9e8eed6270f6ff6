package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON repair operators (SURVEY §2.7 E2-E4) — the reference's
  * LLM-output cleanup: strip markdown fences, scan for {...} candidate
  * blocks, keep the largest that parses.
  *
  * Reference semantics (/root/reference/src/utils.py:180-198): strip
  * ```json fences, regex-find all non-greedy `\{[\s\S]*?\}` candidates,
  * try-parse largest first, first success wins. E4 (utils.py:147-160):
  * direct parse, else first greedy `\{[\s\S]*\}` block.
  *
  * All pure Column expressions (codegen'd HOFs + try_parse_json) — no
  * UDF. Validity via `try_parse_json IS NOT NULL` on the Spark side and
  * `json_valid` in the oracle.
  */
object JsonRepair {

  private val fence = "```(?:json)?"
  private val candidatePat = "\\{[\\s\\S]*?\\}"
  private val greedyPat = "(\\{[\\s\\S]*\\})"

  /** E3 extract_json: largest valid {...} candidate (first-wins on length
    * ties, matching the reference's stable largest-first sort). Returns
    * the candidate substring (not the parsed value) so results are
    * engine-comparable as strings. Native single-pass expression — the
    * HOF form (regexp_extract_all + try_parse_json in lambdas) is
    * re-evaluated per reference by projection collapse and interprets
    * ~0.6 ms/row. */
  def extractJsonCandidate(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.LargestValidJsonCandidate(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))
  def extractJsonCandidateSql(c: String): String = {
    val unfenced = s"regexp_replace($c, '$fence', '', 'g')"
    val cands = s"regexp_extract_all($unfenced, '\\{[\\s\\S]*?\\}')"
    val valid = s"list_filter($cands, x -> json_valid(x))"
    s"""CASE WHEN len($valid) = 0 THEN NULL ELSE
        list_filter($valid, x -> length(x) = list_max(list_transform($valid, y -> length(y))))[1]
        END"""
  }

  private def isValidJson(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.IsValidJson(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** E4 safe_json_load: the input if it parses, else the first greedy
    * {...} block if that parses, else null. */
  def safeJson(c: Column): Column =
    when(isValidJson(c), c)
      .otherwise({
        val block = nullif(regexp_extract(c, greedyPat, 1), lit(""))
        when(isValidJson(block), block)
          .otherwise(lit(null).cast(StringType))
      })
  def safeJsonSql(c: String): String = {
    val block = s"nullif(regexp_extract($c, '$greedyPat', 1), '')"
    s"""CASE WHEN json_valid($c) THEN $c
        WHEN json_valid($block) THEN $block ELSE NULL END"""
  }
}
