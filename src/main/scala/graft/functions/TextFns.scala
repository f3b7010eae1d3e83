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

  // Lexicons over the corpus vocabulary (synthetic docs; SURVEY §3).
  // Shaped like the reference's VADER-lexicon + emoji lists
  // (spark-ml-sentiment/spark_ml_sentiment.py:88-97,108-127).
  val PosWords: Seq[String] = Seq("fast", "small", "merge", "key", "spark")
  val NegWords: Seq[String] = Seq("slow", "big", "dup")
  /** Narrower second labeler (the reference compares two labelers:
    * VADER vs trained ML; we compare full vs narrow lexicon). */
  val PosWordsNarrow: Seq[String] = Seq("fast", "spark")
  val NegWordsNarrow: Seq[String] = Seq("slow", "dup")

  /** Emoji stand-ins: the reference counts positive/negative emoji
    * occurrences and derives emoji_score = pos - neg
    * (spark-ml-sentiment/spark_ml_sentiment.py:92-101). The synthetic
    * corpus carries no symbol characters, so two marker-token classes —
    * disjoint from the sentiment lexicons above — play the emoji role
    * through the same countTokensIn machinery.
    */
  val PosEmoji: Seq[String] = Seq("vector", "window")
  val NegEmoji: Seq[String] = Seq("scan", "filter")

  /** VADER-style negator / booster marker tokens (stand-ins over the
    * synthetic vocabulary, the same device as [[PosEmoji]]): a sentiment
    * token preceded within 3 tokens by a negator flips polarity at
    * VADER's N_SCALAR -0.74; a booster in the same window adds VADER's
    * B_INCR 0.293 intensity (reference:
    * spark-ml-sentiment/spark_ml_sentiment.py:109-130).
    */
  val Negators: Seq[String] = Seq("order", "query")
  val Boosters: Seq[String] = Seq("hash", "batch")

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Per-language stopword lists for the n-gram language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "join", "fast"),
    "fr" -> Seq("le", "la", "filter", "slow"),
    "de" -> Seq("der", "die", "group", "merge"),
    "es" -> Seq("el", "los", "sort", "key"),
    "zh" -> Seq("spark", "hash", "stream", "dup"))
}
