package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass language ID over LOWERCASED text: whole-word
  * stopword hits for en/fr/es/de plus CJK code-point hits for zh,
  * argmax with first-label-wins ties, no hits -> "und".
  *
  * Replaces five `regexp_extract_all` scans (one `\b(w1|...|wN)\b`
  * pattern per language + the CJK char class) with ONE character scan.
  * Equivalence to the regex form: every stopword alternative consists
  * only of ASCII letters, and a `\b...\b` match is exactly a maximal
  * boundary-word-char run equal to an alternative (a sub-run match is
  * impossible — the neighbouring run chars kill the boundary). The
  * JVM quirk this must reproduce (verified empirically and pinned by
  * the property spec): java.util.regex `\b` WITHOUT
  * UNICODE_CHARACTER_CLASS still uses `_` + Character.isLetterOrDigit
  * — Unicode letters like 'é' and CJK ideographs extend word runs for
  * boundary purposes even though `\w` is ASCII-only. So the scan's
  * run definition is `_` | isLetterOrDigit (per UTF-16 unit, exactly
  * like Pattern's Bound matcher); runs of <= MaxLen ALL-ASCII chars
  * pack into a long key for a word -> language-bitmask lookup ("un"
  * counts for BOTH fr and es, exactly as both regexes count it); runs
  * containing any non-ASCII unit can never equal a stopword. CJK
  * chars [U+4E00, U+9FFF] bump the zh counter wherever they appear
  * (the char class has no boundary assertions); astral code points
  * are surrogate pairs whose units fall outside the range, matching
  * the BMP-only regex char class. (DuckDB's RE2 `\b` is ASCII-only —
  * the engines already diverged on non-ASCII boundary text before
  * this kernel existed; the fixture corpus is ASCII, where all three
  * agree, and the oracle pins that.)
  *
  * The oracle keeps the regex form ([[graft.functions.TextFunctions
  * .langIdSql]] derives the patterns from [[LangId.langWords]], the
  * single source of truth) — the correctness gate pins the two
  * implementations to each other every round.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangId.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LangId.eval($c)")

  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangId {

  /** Stopword lists, in scoring order (first wins ties). The zh entry
    * is the CJK char-class, handled separately. These are THE word
    * lists — TextFunctions derives the oracle regexes from them. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en", "por", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"))

  private val names: Array[UTF8String] =
    (langWords.map(_._1) :+ "zh" :+ "und").map(UTF8String.fromString).toArray
  private val UndIdx = names.length - 1
  private val ZhIdx = names.length - 2

  private val MaxLen = langWords.flatMap(_._2).map(_.length).max // 4

  /** word -> language bitmask, keyed on (len << 56) | packed chars
    * (<= MaxLen ASCII chars, 8 bits each — fits a long for MaxLen <= 7). */
  private val table: java.util.HashMap[java.lang.Long, Integer] = {
    require(MaxLen <= 7, s"packed-key scheme needs word length <= 7, got $MaxLen")
    val m = new java.util.HashMap[java.lang.Long, Integer]()
    for (((_, ws), li) <- langWords.zipWithIndex; w <- ws) {
      var key = w.length.toLong << 56
      var i = 0
      while (i < w.length) { key = key | (w.charAt(i).toLong << (8 * i)); i += 1 }
      val prev = m.get(key)
      m.put(key, if (prev == null) 1 << li else prev | (1 << li))
    }
    m
  }

  /** java.util.regex Bound's word-char test (no UNICODE_CHARACTER_CLASS):
    * `_` or Character.isLetterOrDigit, applied per CODE POINT (Bound
    * uses codePointBefore/codePointAt). ASCII fast path first — the
    * corpus is overwhelmingly ASCII. */
  @inline private def isBoundaryWordChar(cp: Int): Boolean =
    if (cp < 128)
      (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
        (cp >= 'A' && cp <= 'Z') || cp == '_'
    else Character.isLetterOrDigit(cp)

  /** One pass: run extraction + table lookups + CJK count + argmax. */
  def eval(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val nLangs = langWords.length
    val counts = new Array[Int](nLangs + 1) // + zh
    var i = 0
    var runLen = 0
    var key = 0L
    var runAscii = true

    @inline def endRun(): Unit = {
      if (runAscii && runLen > 0 && runLen <= MaxLen) {
        val m = table.get(key | (runLen.toLong << 56))
        if (m != null) {
          var b = m.intValue()
          var li = 0
          while (b != 0) { if ((b & 1) != 0) counts(li) += 1; b >>>= 1; li += 1 }
        }
      }
      runLen = 0
      key = 0L
      runAscii = true
    }

    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) counts(nLangs) += 1
      if (isBoundaryWordChar(cp)) {
        if (cp >= 128) runAscii = false
        else if (runLen < MaxLen) key = key | (cp.toLong << (8 * runLen))
        runLen += 1
      } else endRun()
      i += Character.charCount(cp)
    }
    endRun()
    // counts index k is names index k by construction (en..de then zh)
    var best = ZhIdx
    var bestC = 0
    var k = 0
    while (k <= nLangs) {
      if (counts(k) > bestC) { best = k; bestC = counts(k) }
      k += 1
    }
    if (bestC > 0) names(best) else names(UndIdx)
  }
}
