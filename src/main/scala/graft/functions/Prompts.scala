package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** LLM prompt builders (SURVEY §2.3/§2.7/§2.8; reference
  * /root/reference/src/utils.py:5-33, 36-89, 91-118) — the strings a
  * real `Inference.LlmBackend` receives. Built as Column expressions so
  * prompt construction is distributed and oracle-checkable (string
  * concat + truncation twin exactly in SQL).
  *
  * Fidelity notes:
  *  - classification embeds the FIRST 500 chars (P2, utils.py:28) and
  *    the 9-label list (utils.py:17-25);
  *  - extraction embeds doc_type, the schema fields (E6 quirk: an
  *    empty/missing fields map degrades to the advisory "extract all"
  *    line, utils.py:42-47), the document text, the normalization rules
  *    (utils.py:64-66) and the feedback block on retries
  *    (utils.py:49-55);
  *  - schema fields render as COMPACT json (the reference pretty-prints
  *    with indent=2 — cosmetic, normalized here like the quirk ledger's
  *    other whitespace normalizations). Divergence from the reference is
  *    WHITESPACE ONLY (the f-string indentation/blank-line layout is
  *    flattened); every word of utils.py:15-31 and 57-87 is present —
  *    the "Be careful to choose accurately" guidance, the trailing
  *    period on "- other.", the irrelevant-text rule, the
  *    "(Education: ...)" example, the reference's own "standardtized"
  *    typo, and all six CRITICAL rules.
  */
object Prompts {

  val Labels: Seq[String] = Seq("invoice", "contract", "receipt", "form",
    "report", "transcript", "cover letter", "resume", "other")

  val AdvisoryLine = "Extract all relevant structured information."

  private val ClassifyPrefix =
    "Classify the following document into ONE of these categories:\n\n" +
      // the reference's list ends '- other.' — trailing period included
      // (utils.py:25)
      Labels.map(l => if (l == "other") s"- $l." else s"- $l").mkString("\n") +
      "\n\nDocument text (first 500 chars):\n"
  private val ClassifySuffix =
    "\n\nBe careful to choose accurately the category that best fits the text in the document. " +
      "Check for keywords and context in the text.\n" +
      "Return ONLY the category name, nothing else."

  /** utils.py:5-33 — classification prompt over the first 500 chars. */
  def classificationPrompt(text: Column): Column =
    concat(lit(ClassifyPrefix), substring(text, 1, 500), lit(ClassifySuffix))
  def classificationPromptSql(c: String): String =
    s"${sqlLit(ClassifyPrefix)} || substr($c, 1, 500) || ${sqlLit(ClassifySuffix)}"

  private val ExtractHeader =
    "You are an information extraction agent.\n\n" +
      "Your task:\n" +
      "- Extract the structured data accurately from the document\n" +
      "- Output valid JSON only\n" +
      "- If the text in the Document is irrelevant with respect to the document type, " +
      "then look for the correct document type from the text in the document for information.\n" +
      "- Add + with phone number if not present.\n" +
      "- If a field contains only one date, consider that as End Date." +
      "(Education: Start Date: Unspecified , End Date: 2025).\n" +
      // 'standardtized' [sic] — the reference's own typo, reproduced so a
      // backend swap receives byte-faithful prompts (utils.py:66)
      "- Convert the fields to standardtized formats (e.g., dates to YYYY-MM-DD, amounts to numeric values) if possible.\n\n" +
      "Document Type: "
  private val ExtractSchemaHead = "\n\nSchema (guidelines, not strict requirements):\n"
  private val ExtractDocHead = "\n\nDocument:\n"
  private val ExtractFeedbackHead = "\n\nFeedback:\n"
  private val ExtractRules =
    "\n\nCRITICAL rules:\n" +
      "- Your response MUST be a valid JSON object\n" +
      "- Do NOT wrap the JSON in markdown\n" +
      "- Do NOT include any text before or after the JSON\n" +
      "- Ensure all brackets are closed and commas are valid\n" +
      "- Do not invent fields that are not present in the document text.\n" +
      "- Do not include fields with None or empty fields in the output."
  private val FeedbackPrefix = "Previous extraction had issues:\n"
  private val FeedbackSuffix = "\nPlease correct these issues."

  /** utils.py:36-89 — extraction prompt. `fieldsJson` is the schema's
    * fields map as compact JSON ('{}' or null ⇒ the advisory line, the
    * E6 degraded path); `feedback` (nullable array) adds the retry
    * block (X3). */
  def extractionPrompt(docType: Column, fieldsJson: Column, text: Column,
                       feedback: Column): Column = {
    val schemaStr = when(
      fieldsJson.isNull || fieldsJson === "{}", lit(AdvisoryLine))
      .otherwise(fieldsJson)
    val feedbackStr = when(
      feedback.isNull || size(feedback) === 0, lit(""))
      .otherwise(concat(lit(FeedbackPrefix),
        array_join(transform(feedback, f => concat(lit("- "), f)), "\n"),
        lit(FeedbackSuffix)))
    concat(lit(ExtractHeader), coalesce(docType, lit("unknown")),
      lit(ExtractSchemaHead), schemaStr,
      lit(ExtractDocHead), text,
      lit(ExtractFeedbackHead), feedbackStr,
      lit(ExtractRules))
  }

  /** SQL twin of extractionPrompt; `feedbackExpr` must already be the
    * rendered feedback block ('' when none). */
  def extractionPromptSql(docType: String, fieldsJson: String, text: String,
                          feedbackBlock: String): String =
    s"${sqlLit(ExtractHeader)} || coalesce($docType, 'unknown') || " +
      s"${sqlLit(ExtractSchemaHead)} || " +
      s"(CASE WHEN $fieldsJson IS NULL OR $fieldsJson = '{}' THEN ${sqlLit(AdvisoryLine)} ELSE $fieldsJson END) || " +
      s"${sqlLit(ExtractDocHead)} || $text || " +
      s"${sqlLit(ExtractFeedbackHead)} || $feedbackBlock || " +
      s"${sqlLit(ExtractRules)}"

  def feedbackBlockSql(feedbackArr: String): String =
    s"""(CASE WHEN $feedbackArr IS NULL OR len($feedbackArr) = 0 THEN ''
         ELSE ${sqlLit(FeedbackPrefix)} ||
              array_to_string(list_transform($feedbackArr, f -> '- ' || f), chr(10)) ||
              ${sqlLit(FeedbackSuffix)} END)"""

  /** utils.py:91-118 — validation prompt (spec-covered; the embedded
    * extracted-JSON rendering is engine-cosmetic, so this one is not an
    * oracle query). */
  def validationPrompt(docType: Column, fieldsJson: Column,
                       extractedJson: Column): Column =
    concat(
      lit("You are a Validation Agent validating structured data extracted from a document.\n\nDocument type: "),
      coalesce(docType, lit("unknown")),
      lit("\n\nSchema (reference only; not all fields are required):\n"),
      when(fieldsJson.isNull || fieldsJson === "{}", lit(AdvisoryLine)).otherwise(fieldsJson),
      lit("\n\nExtracted Data:\n"),
      coalesce(extractedJson, lit("{}")),
      lit("\n\nValidate formats (malformed emails, impossible dates, non-numeric amounts);" +
        " absent schema fields are acceptable. Output JSON only."))

  private def sqlLit(s: String): String =
    "'" + s.replace("'", "''") + "'"
}
