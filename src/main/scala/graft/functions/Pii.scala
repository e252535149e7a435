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

  /** Card-number-shaped runs: 13–19 digits with optional single space or
    * hyphen separators. Greedy single-branch pattern, so java.util.regex
    * (leftmost greedy) and RE2 (leftmost-longest) extract IDENTICAL spans —
    * the property that keeps the oracle exact. A shape match alone is a
    * false-positive factory (order ids, timestamps); [[luhnValidCards]]
    * keeps only checksum-valid numbers. */
  val CardPattern = "[0-9](?:[ -]?[0-9]){12,18}"

  /** Luhn checksum of a digits-only string (ISO/IEC 7812): reversed
    * 1-based position i contributes d when i is odd, 2d (minus 9 above 9)
    * when even; valid numbers sum to 0 mod 10. Pure integer fold, bound
    * once per row (array-wrap idiom) — bit-replayable in any engine. */
  def luhnSum(digits: Column): Column =
    element_at(transform(array(reverse(digits)), r =>
      aggregate(sequence(lit(1), length(r)), lit(0), (acc, i) => {
        val d = ascii(r.substr(i, lit(1))) - lit(48)
        val dd = d * lit(2)
        acc + when(i % 2 === 0,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })), 1)

  /** Card-shaped candidate runs in occurrence order. */
  def cardCandidates(c: Column): Column =
    regexp_extract_all(c, lit(CardPattern), lit(0))

  /** The subset of [[cardCandidates]] that pass the Luhn checksum after
    * separator stripping — the scrub set. */
  def luhnValidCards(c: Column): Column =
    filter(cardCandidates(c), s =>
      luhnSum(regexp_replace(s, "[^0-9]", "")) % 10 === 0)

  /** Replace every Luhn-VALID card run with `token`, leaving shape-matching
    * but checksum-failing runs (order numbers, tracking ids) untouched —
    * conditional redaction regexp_replace alone cannot express. The
    * replacement folds over the valid-card array in occurrence order with
    * literal `replace` (all occurrences of each card string). */
  def redactCards(c: Column, token: String = "<CARD>"): Column =
    aggregate(luhnValidCards(c), c, (acc, card) => replace(acc, card, lit(token)))
}
