package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c(col("t"))).collect()(0).get(0)

  /** Seeded pseudo-random strings over a mixed alphabet (printable +
    * whitespace + unicode) for property-style checks without a
    * property-testing dependency. */
  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc XYZ123.,-():!@#$%^&*\t\né世"
    (0 until n).map(_ => (0 until rnd.nextInt(40)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  test("cleanText collapses whitespace and strips charset (P1)") {
    assert(one("hello,   world (x) - y.", cleanText) == "hello, world (x) - y.")
    assert(one("a\t\tb!!@#c", cleanText) == "a bc")
  }

  test("cleanText matches a reference-faithful reimplementation (property)") {
    // reference clean_text (utils.py:162-178): collapse whitespace THEN
    // strip charset THEN trim. Deliberately NOT idempotent: stripping a
    // char between two spaces recreates a double space — we preserve the
    // reference's semantics, quirk included.
    def ref(s: String): String =
      s.replaceAll("\\s+", " ").replaceAll("[^\\w\\s.,\\-():]", "").trim
    val inputs = randomStrings(60)
    val got = inputs.toDF("t").select(cleanText(col("t")).as("c")).as[String].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("classify: keyword scorer picks the right label, ties first-wins") {
    assert(one("INVOICE: amount due on receipt of this bill to you", classify) == "invoice")
    assert(one("this agreement between the parties hereby", classify) == "contract")
    assert(one("nothing to see here", classify) == "other")
    // one 'invoice' hit and one 'report' hit -> earliest label wins
    assert(one("invoice findings", classify) == "invoice")
  }

  test("langId: stopword heuristic") {
    assert(one("the cat is on the mat and it is flat", langId) == "en")
    assert(one("你好世界", langId) == "zh")
    assert(one("zzz qqq", langId) == "und")
    // first-wins tie: one en hit ("the") vs one fr hit ("le")
    assert(one("the le", langId) == "en")
    // "un" counts for BOTH fr and es (shared stopword, like both regexes)
    assert(one("un un la", langId) == "fr")
    assert(one("un un los", langId) == "es")
  }

  test("langId native scan matches the regex-count reference (property)") {
    // the pre-round-12 implementation: five regexp_extract_all counts
    // over lower(s) + first-wins argmax — re-run here verbatim via
    // java.util.regex as the ground truth for the single-pass kernel
    def ref(s: String): String = {
      val in = s.toLowerCase
      val scores = langStopwords.map { case (_, p) =>
        val m = java.util.regex.Pattern.compile(p).matcher(in)
        var c = 0; while (m.find()) c += 1; c
      }
      val best = scores.max
      if (best <= 0) "und"
      else langStopwords(scores.indexOf(best))._1
    }
    // word-salad + boundary torture: underscores glue runs, digits are
    // word chars, CJK mixes into latin, accents break runs on BOTH sides
    val alphabet = Seq("the", "le", "el", "der", "un", "une", "a", "y",
      "of", "es", "los", "世", "界", "été", "the_", "_the", "9the",
      "the9", "un-", ",", ".", "-", "_", "  ", "\t", "\n", "THE", "Le",
      "athe", "thea", "x", "", "了")
    val rnd = new scala.util.Random(7)
    val inputs = (0 until 400).map(_ =>
      (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString(
        if (rnd.nextBoolean()) " " else ""))
    for (s <- inputs) {
      val got = graft.plans.LangId.eval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s.toLowerCase)).toString
      assert(got == ref(s), s"input: <$s>")
    }
  }

  test("field extractors implement the prompt normalization rules (E1)") {
    val t = "Pay 123.45 to bob@x.co by 2024-01-31, call 555-123-4567"
    assert(one(t, extractAmount) == 123.45)
    assert(one(t, extractEmail) == "bob@x.co")
    assert(one(t, extractDate).toString == "2024-01-31")
    assert(one(t, extractPhone) == "+555-123-4567") // + prefixed per rule
    assert(one("call +1 555 0000", extractPhone) == "+1 555 0000") // already prefixed
  }

  test("validators: present-and-malformed only (X1)") {
    assert(one("x", _ => validEmail(lit(null).cast("string"))) == true)
    assert(one("x", _ => validEmail(lit("bad@@"))) == false)
    assert(one("x", _ => validEmail(lit("a@b.c"))) == true)
    assert(one("x", _ => validAmount(lit(-1.0))) == false)
  }

  test("tokenCount and fingerprint: empty-string edge") {
    assert(one("", tokenCount) == 0)
    assert(one("a b  c", tokenCount) == 3)
    assert(one("", fingerprint) == 0L)
    // polynomial hash: "ab" = (0*31+97)*31+98 mod 1e9+7
    assert(one("ab", fingerprint) == (97L * 31 + 98) % 1000000007L)
  }

  test("scrubPii redacts what the E1 extractors can find, leaves clean text alone") {
    val s = one("pay 12.50 to bob.smith+x@corp.example.org or call +1 (415) 555-0133 now",
      scrubPii).asInstanceOf[String]
    assert(s == "pay 12.50 to [EMAIL] or call [PHONE] now")
    assert(one("no pii here, just words.", scrubPii) == "no pii here, just words.")
    // a date is digits+hyphens — it must come out as [DATE], never
    // mislabeled [PHONE] (the extractPhone date-blanking rationale)
    assert(one("report dated 2024-01-31 follows", scrubPii) ==
      "report dated [DATE] follows")
    // the scrubbed text yields nothing to the extractors
    val clean = Seq(s).toDF("t")
      .select(extractEmail(col("t")).as("e"), extractPhone(col("t")).as("p"))
      .collect()(0)
    assert(clean.isNullAt(0) && clean.isNullAt(1))
  }

  test("quality score bounded [0,1] (property)") {
    val qs = randomStrings(60).toDF("t")
      .select(qualityScore(col("t")).as("q")).as[Double].collect()
    assert(qs.forall(q => q >= 0.0 && q <= 1.0 + 1e-9))
  }

  test("nfcNormalize: composes decomposed accents, idempotent, identity on ASCII, null-safe") {
    import graft.functions.NativeFunctions.nfcNormalize
    val rows = Seq(
      ("e\u0301 cafe\u0301", "\u00e9 caf\u00e9"), // decomposed -> composed
      ("\u00e9 already", "\u00e9 already"),     // composed unchanged
      ("plain ascii", "plain ascii"),
      ("", ""))
    val out = rows.map(_._1).toDF("t")
      .select(nfcNormalize(col("t")).as("s")).as[String].collect()
    assert(out.toSeq == rows.map(_._2))
    // idempotence: normalizing the output is a no-op
    val twice = rows.map(_._2).toDF("t")
      .select(nfcNormalize(nfcNormalize(col("t"))).as("s")).as[String].collect()
    assert(twice.toSeq == rows.map(_._2))
    val nulls = Seq[Option[String]](None).toDF("t")
      .select(nfcNormalize(col("t")).as("s")).collect()
    assert(nulls(0).isNullAt(0))
  }
}
