package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Rule-ensemble corpus filtering (q107) and round-5 corpus composites. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String,
      required: Seq[String] = Text.GopherRequiredWords,
      minWords: Int = 50): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(Text.gopherFlags(col("text"), requiredWords = required,
        minWords = minWords).as("g"))
      .select(col("g.*")).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopherFlags: empty text fails word count with zeroed stats, no NaN/null") {
    val f = flagsOf("")
    assert(f("n_words") === 0)
    assert(f("mean_word_len") === 0.0)
    assert(f("ok_word_count") === false)
    assert(f("keep") === false)
  }

  test("gopherFlags: bullet-dominated text fails the bullet rule only there") {
    // 10 bullet lines of 11 total lines = 0.909 > 0.9
    val bullets = (1 to 10).map(i => s"- item number $i word word").mkString("\n")
    val f = flagsOf("the quick brown fox with all of that have be to and more words here\n" + bullets,
      minWords = 10)
    assert(f("ok_bullet_lines") === false)
    assert(f("ok_word_count") === true)
    assert(f("ok_ellipsis_lines") === true)
    assert(f("keep") === false)
  }

  test("gopherFlags: symbol spam and ellipsis-line rules trip independently") {
    val hashy = flagsOf("the data with of " + ("# " * 20), minWords = 2)
    assert(hashy("ok_symbol_ratio") === false)
    assert(hashy("ok_alpha_words") === false) // 20 of 24 tokens are '#'
    val dots = flagsOf("the data with of\nloading...\nmore...\nstill...", minWords = 2)
    assert(dots("ok_ellipsis_lines") === false) // 3 of 4 lines end with ...
    assert(dots("ok_bullet_lines") === true)
  }

  test("gopherFlags: required-words rule counts distinct matches, case-insensitive") {
    // 'The' and 'with' present (2 distinct hits) -> passes; only 'the' -> fails
    val two = flagsOf("The data with of extra tokens pad pad pad pad", minWords = 2,
      required = Seq("the", "with"))
    assert(two("ok_required_words") === true)
    val one = flagsOf("The data pad pad pad pad pad pad pad pad", minWords = 2,
      required = Seq("the", "with"))
    assert(one("ok_required_words") === false)
  }

  test("gopherFlags: mean word length bounds") {
    val short = flagsOf("a b c d e f g h i j", minWords = 2) // mean 1 < 3
    assert(short("ok_mean_word_len") === false)
    val long = flagsOf("internationalization considerations parallelization " +
      "distributed computation infrastructure", minWords = 2) // mean > 10
    assert(long("ok_mean_word_len") === false)
  }
}
