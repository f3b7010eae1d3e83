package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column functions. Pure Catalyst `functions._` chains —
  * codegen'd, no UDFs, so they stay inside whole-stage codegen and scale
  * linearly with input (SURVEY §5 "ETL/text").
  *
  * Semantics mirror the reference's clean_text
  * (reference: spark-processor/spark_streaming.py:66-77): lowercase, strip
  * URLs and @mentions, unwrap #hashtags, punctuation→space, collapse
  * whitespace, trim.
  */
object TextFns {

  def cleanText(c: Column): Column = {
    val lowered   = lower(c)
    val noUrl     = regexp_replace(lowered, "http\\S+|www\\S+|https\\S+", "")
    val noMention = regexp_replace(noUrl, "@\\w+", "")
    val unHashtag = regexp_replace(noMention, "#(\\w+)", "$1")
    val noPunct   = regexp_replace(unHashtag, "[^\\w\\s]", " ")
    trim(regexp_replace(noPunct, "\\s+", " "))
  }

  /** Whitespace tokens; `size(tokens(c))` matches the reference's
    * word_count = size(split(text, " ")) (spark_streaming.py:88). */
  def tokens(c: Column): Column = split(c, " ")

  /** Count of tokens that appear in `words` (with multiplicity) — native
    * [[graft.functions.CountTokensIn]] (registered by GraftExtensions):
    * the `filter`+`array_contains` higher-order form evaluated every token
    * through the interpreted lambda path, outside whole-stage codegen.
    */
  def countTokensIn(toks: Column, words: Seq[String]): Column =
    call_function("graft_count_in", toks, lit(words.mkString(" ")))

  /** Substring occurrence count (dashboard.py:1049-1057 country mentions). */
  def substrCount(text: Column, kw: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(kw), ""))) / kw.length).cast("long")

  // The sentiment data asset (graded VADER valences, negators, boosters,
  // emoji tables) lives in [[VaderLexicon]] — a transcribed subset of
  // the public-domain VADER lexicon plus the synthetic-corpus stand-ins.

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Per-language stopword lists for the n-gram language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "join", "fast"),
    "fr" -> Seq("le", "la", "filter", "slow"),
    "de" -> Seq("der", "die", "group", "merge"),
    "es" -> Seq("el", "los", "sort", "key"),
    "zh" -> Seq("spark", "hash", "stream", "dup"))
}
