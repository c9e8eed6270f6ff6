package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point: registers graft's native expressions and
  * aggregates in the session's FunctionRegistry (activated via
  * `spark.sql.extensions=graft.plans.GraftExtensions`, set in
  * GraftSession). Gives the SQL surface and `call_function` access to
  * the codegen'd operators. `GraftExtensions.registerAll` installs the
  * same functions into an ALREADY-RUNNING session (extensions only apply
  * at session build time). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** The aggregates' k must be a literal int at the call site. */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, null, "poly_hash",
        "poly_hash(s) - polynomial rolling hash mod 1e9+7 over code points", ""),
      (children: Seq[Expression]) => PolyHash(children.head)),
    (new FunctionIdentifier("kmv_mins"),
      new ExpressionInfo(classOf[KmvMins].getName, null, "kmv_mins",
        "kmv_mins(h, k) - aggregate: the k smallest distinct bigints, sorted (KMV sketch buffer)", ""),
      (children: Seq[Expression]) =>
        KmvMins(children(0), intLit(children(1), "kmv_mins k"))),
    (new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, null, "top_k_by_score",
        "top_k_by_score(score, id, k) - aggregate: best k (score, id) pairs, score DESC then id ASC", ""),
      (children: Seq[Expression]) => TopKByScore(children(0), children(1),
        intLit(children(2), "top_k_by_score k"))),
    (new FunctionIdentifier("top_freq"),
      new ExpressionInfo(classOf[TopFreq].getName, null, "top_freq",
        "top_freq(item, cap) - aggregate: Misra-Gries frequent-items summary, <= cap (item, cnt) counters, cnt DESC then item ASC", ""),
      (children: Seq[Expression]) =>
        TopFreq(children(0), intLit(children(1), "top_freq cap"))),
    (new FunctionIdentifier("word_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, null, "word_bigrams",
        "word_bigrams(s) - distinct word-bigram shingles of a text, one pass", ""),
      (children: Seq[Expression]) => WordBigrams(children.head)),
    (new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null, "sorted_intersect_count",
        "sorted_intersect_count(a, b) - |a ∩ b| of two SORTED distinct string arrays, allocation-free", ""),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))),
    (new FunctionIdentifier("sorted_intersect_count_long"),
      new ExpressionInfo(classOf[SortedIntersectCountLong].getName, null, "sorted_intersect_count_long",
        "sorted_intersect_count_long(a, b) - |a ∩ b| of two SORTED distinct bigint arrays, allocation-free", ""),
      (children: Seq[Expression]) => SortedIntersectCountLong(children(0), children(1))),
    (new FunctionIdentifier("pseudo_embed"),
      new ExpressionInfo(classOf[PseudoEmbed].getName, null, "pseudo_embed",
        "pseudo_embed(s, dim) - deterministic unit-norm float vector from text (encoder stand-in)", ""),
      (children: Seq[Expression]) =>
        PseudoEmbed(children(0), intLit(children(1), "pseudo_embed dim"))),
    (new FunctionIdentifier("sanitize_metadata"),
      new ExpressionInfo(classOf[SanitizeMetadata].getName, null, "sanitize_metadata",
        "sanitize_metadata(json) - flatten metadata: nested objects re-encoded as JSON strings, scalars stringified", ""),
      (children: Seq[Expression]) => SanitizeMetadata(children.head)),
    (new FunctionIdentifier("largest_valid_json"),
      new ExpressionInfo(classOf[LargestValidJsonCandidate].getName, null, "largest_valid_json",
        "largest_valid_json(s) - largest parseable {...} candidate after fence strip (JSON repair)", ""),
      (children: Seq[Expression]) => LargestValidJsonCandidate(children.head)),
    (new FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketch].getName, null, "quantile_sketch",
        "quantile_sketch(x, k) - aggregate: KLL-style sketch, array of the three quartile values (exact while group <= k)", ""),
      (children: Seq[Expression]) =>
        QuantileSketch(children(0), intLit(children(1), "quantile_sketch k"),
          Seq(0.25, 0.5, 0.75))),
    (new FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigrams].getName, null, "char_trigrams",
        "char_trigrams(s) - all character-trigram slots of s, in order", ""),
      (children: Seq[Expression]) => CharTrigrams(children.head)),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, null, "nfc_normalize",
        "nfc_normalize(s) - Unicode canonical composition (NFC)", ""),
      (children: Seq[Expression]) => NfcNormalize(children.head)),
    (new FunctionIdentifier("is_valid_json"),
      new ExpressionInfo(classOf[IsValidJson].getName, null, "is_valid_json",
        "is_valid_json(s) - true iff s parses as a JSON value", ""),
      (children: Seq[Expression]) => IsValidJson(children.head)),
    (new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, null, "bloom_agg",
        "bloom_agg(h, m_bits, k) - aggregate: m-bit Bloom filter over bigint keys, as binary", ""),
      (children: Seq[Expression]) =>
        BloomAgg(children(0), intLit(children(1), "bloom_agg m_bits"),
          intLit(children(2), "bloom_agg k"))),
    (new FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[CmsAgg].getName, null, "cms_agg",
        "cms_agg(h, depth, width) - aggregate: Count-Min depth x width counter matrix over bigint keys, flattened row-major", ""),
      (children: Seq[Expression]) =>
        CmsAgg(children(0), intLit(children(1), "cms_agg depth"),
          intLit(children(2), "cms_agg width"))),
    (new FunctionIdentifier("sq8_encode"),
      new ExpressionInfo(classOf[Sq8Encode].getName, null, "sq8_encode",
        "sq8_encode(v) - SQ8 codes: clamp(floor(x*64)+64, 0, 127) per dimension of a float vector", ""),
      (children: Seq[Expression]) => Sq8Encode(children.head)),
    (new FunctionIdentifier("codes_cosine"),
      new ExpressionInfo(classOf[CodesCosine].getName, null, "codes_cosine",
        "codes_cosine(a, b, center) - cosine of two int code arrays after subtracting center", ""),
      (children: Seq[Expression]) => CodesCosine(children(0), children(1),
        intLit(children(2), "codes_cosine center"))),
    (new FunctionIdentifier("codes_dot"),
      new ExpressionInfo(classOf[CodesDot].getName, null, "codes_dot",
        "codes_dot(a, b) - exact integer dot product of two int code arrays", ""),
      (children: Seq[Expression]) => CodesDot(children(0), children(1))),
    (new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, null, "bloom_contains",
        "bloom_contains(bits, h, k) - membership probe against bloom_agg bits (no false negatives)", ""),
      (children: Seq[Expression]) =>
        BloomContains(children(0), children(1),
          intLit(children(2), "bloom_contains k"))))

  /** Install into a live session (tests, notebooks without the conf). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
