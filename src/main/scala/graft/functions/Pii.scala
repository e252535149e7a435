package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII-redaction expressions for corpus scrubbing: digit masking with tail
  * preservation, email/phone redaction. Pure `Column` compositions (codegen,
  * no UDF); regexes are kept inside the RE2-compatible subset (no lookaround,
  * no backreferences) so the same pattern runs on Spark (java.util.regex) and
  * engines like DuckDB/RE2 — which also makes them oracle-checkable.
  */
object Pii {

  /** Mask every digit except the last `keepLast` characters of the string
    * (the "****1234" card/account convention). Non-digits pass through. */
  def maskDigits(c: Column, keepLast: Int): Column = {
    val len = length(c)
    when(len <= keepLast, c).otherwise(
      concat(
        regexp_replace(substring(c, lit(1), len - lit(keepLast)), "[0-9]", "X"),
        substring(c, len - lit(keepLast - 1), lit(keepLast))))
  }

  /** Email pattern — RE2-safe (no lookaround). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: 3+ digit groups separated by -, ., or space, or a
    * 7+ digit run. Deliberately simple; production scrubbing layers several
    * of these with allowlists. */
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}|[0-9]{7,}"

  def redactEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, EmailPattern, token)

  def redactPhones(c: Column, token: String = "<PHONE>"): Column =
    regexp_replace(c, PhonePattern, token)

  /** Count of email-shaped substrings (scrub-audit metric). */
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))

  /** Count of phone-shaped substrings (scrub-audit metric). */
  def phoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhonePattern), lit(0)))
}
