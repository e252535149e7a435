package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-to-text extraction — the first stage of every web-corpus pipeline:
  * drop script/style payloads, strip tags, decode the common entities,
  * collapse whitespace. A production extractor adds DOM heuristics
  * (readability scoring, link-density pruning); this is the deterministic
  * regex core those heuristics refine, and it is what makes raw crawl HTML
  * usable by every downstream operator here (quality, dedup, langid).
  *
  * Pure `Column` composition — codegen-friendly, zero shuffle; the q99
  * oracle replays the identical replace/regexp sequence in DuckDB (both
  * regex engines support `(?s)` dotall and non-greedy `.*?`).
  */
object Html {

  /** Extract visible text: script/style blocks (case-insensitive, dotall)
    * → space, all tags → space, then entity decode (`&amp;` LAST, so
    * `&amp;lt;` decodes once, to `&lt;`), then whitespace collapse + trim. */
  def toText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    // explicit class, not \s: Java \s includes \x0B (vertical tab), RE2's
    // does not — the spelled-out set means the same thing in both engines
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }
}
