package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + masking over a text column (SURVEY §2.4) — the
  * compliance scrub a training corpus passes through before anything else
  * sees it. Pure per-row regexp work (codegen'd built-ins, no UDFs), so
  * the operator is shuffle-free and scales as a map over the corpus.
  *
  * Masking is ordered most-specific-first: emails, then phone numbers,
  * then any remaining run of 4+ digits (account numbers, ids) — each
  * count is taken on the text as it looked BEFORE that pattern's own
  * mask but AFTER the more specific masks, so a phone's digits are never
  * double-counted as a number run.
  */
object PiiScrub {

  val EmailPattern: String = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern: String = "\\+\\d{1,3}-\\d{3}-\\d{4}"
  val NumberPattern: String = "\\d{4,}"

  /** Adds `n_emails`, `n_phones`, `n_nums` (detected counts) and
    * `scrubbed` (the masked text) next to the existing columns. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val note = col(textCol)
    val s1 = regexp_replace(note, EmailPattern, "<EMAIL>")
    val s2 = regexp_replace(s1, PhonePattern, "<PHONE>")
    val s3 = regexp_replace(s2, NumberPattern, "<NUM>")
    df.withColumn("n_emails", regexp_count(note, lit(EmailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(s1, lit(PhonePattern)).cast("long"))
      .withColumn("n_nums", regexp_count(s2, lit(NumberPattern)).cast("long"))
      .withColumn("scrubbed", s3)
  }
}
