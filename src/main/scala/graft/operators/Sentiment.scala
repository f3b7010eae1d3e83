package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFns, Portable => P, PortableSql => PS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon sentiment (SURVEY §2d) — VADER-style scoring with negation
  * flips and booster intensities over a 3-token lookback window plus
  * ±0.05 3-class thresholds (reference: spark-ml-sentiment/
  * spark_ml_sentiment.py:88-145), plus distribution and the two-labeler
  * agreement matrix (full vs narrow lexicon, standing in for the
  * reference's VADER-vs-ML comparison).
  *
  * Portability: each token's contribution is one of EIGHT precomputed
  * integer literals (±1e5 base; ×1.293 boosted; ×-0.74 negated — VADER's
  * B_INCR / N_SCALAR at a 1e5 integer scale), so the per-document sum is
  * exact integer arithmetic in both engines and only the final
  * score = Σ/(wc·1e5) division is floating point — one identical IEEE op.
  *
  * Scale notes: labeling is a pure narrow map over tokens (array functions
  * inside whole-stage codegen, no UDF, no shuffle); distribution/agreement
  * are low-cardinality hash aggregations.
  */
object Sentiment {

  private def inList(words: Seq[String]): String = words.map(w => s"'$w'").mkString(", ")

  /** Token count from `words` (with multiplicity), as a long Column. */
  private def nIn(toks: Column, words: Seq[String]): Column =
    TextFns.countTokensIn(toks, words).cast("long")

  /** Scaled-integer magnitudes (see [[graft.functions.LexiconScore]]):
    * 1e5 base; boosted = ⌊(1+0.293)·1e5⌋; negated = ·-0.74 exactly.
    */
  private val MagBase = graft.functions.LexiconScore.MagBase
  private val MagBoost = graft.functions.LexiconScore.MagBoost
  private val MagNeg = graft.functions.LexiconScore.MagNeg
  private val MagNegBoost = graft.functions.LexiconScore.MagNegBoost

  /** Σ over token positions of the signed scaled magnitude, as a long
    * Column — the Spark twin of the `sc` expression in [[labeledSql]].
    * Native codegen expression: the previous `transform`+`aggregate`
    * higher-order formulation ran every token on the interpreted lambda
    * path and dominated the sentiment family's runtime (~25-40× oracle).
    */
  private def scaledScore(toks: Column, pos: Seq[String], neg: Seq[String]): Column =
    call_function("graft_lexicon_score", toks,
      lit(pos.mkString(" ")), lit(neg.mkString(" ")),
      lit(TextFns.Negators.mkString(" ")), lit(TextFns.Boosters.mkString(" ")))

  private def labeledDf(s: SparkSession, dir: String,
      pos: Seq[String], neg: Seq[String]): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toks, pos).as("pos_n"),
      nIn(toks, neg).as("neg_n"),
      size(toks).cast("long").as("wc"),
      scaledScore(toks, pos, neg).as("sc"))
      .withColumn("raw", $"sc" / ($"wc" * MagBase))
      .withColumn("label",
        when($"raw" > 0.05, "positive")
          .when($"raw" < -0.05, "negative")
          .otherwise("neutral"))
  }

  private def labeledSql(pos: Seq[String], neg: Seq[String], alias: String): String = {
    def window(words: Seq[String]): String =
      (1 to 3).map(o => s"(i > $o AND w[i - $o] IN (${inList(words)}))").mkString("(", " OR ", ")")
    val mag =
      s"""CASE WHEN ${window(TextFns.Negators)} THEN
         |        CASE WHEN ${window(TextFns.Boosters)} THEN $MagNegBoost ELSE $MagNeg END
         |      ELSE
         |        CASE WHEN ${window(TextFns.Boosters)} THEN $MagBoost ELSE $MagBase END END""".stripMargin
    s"""${alias}w AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |$alias AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(w, x -> x IN (${inList(pos)}))) AS BIGINT) AS pos_n,
       |    CAST(len(list_filter(w, x -> x IN (${inList(neg)}))) AS BIGINT) AS neg_n,
       |    CAST(len(w) AS BIGINT) AS wc,
       |    CAST(list_sum(list_transform(generate_series(1, len(w)), i ->
       |      CASE WHEN w[i] IN (${inList(pos)}) THEN ($mag)
       |           WHEN w[i] IN (${inList(neg)}) THEN -($mag)
       |           ELSE 0 END)) AS BIGINT) AS sc
       |  FROM ${alias}w),
       |${alias}l AS MATERIALIZED (
       |  SELECT doc_id, pos_n, neg_n, wc, sc / (wc * $MagBase) AS raw,
       |    CASE WHEN sc / (wc * $MagBase) > 0.05 THEN 'positive'
       |         WHEN sc / (wc * $MagBase) < -0.05 THEN 'negative'
       |         ELSE 'neutral' END AS label
       |  FROM $alias)""".stripMargin
  }

  /** Per-document lexicon score + 3-class label. */
  val lexicon = QueryDef(
    "sent_lexicon",
    s"""WITH ${labeledSql(TextFns.PosWords, TextFns.NegWords, "lx")}
       |SELECT doc_id, pos_n, neg_n, ${PS.prnd("raw", 6)} AS score, label
       |FROM lxl""".stripMargin) { (s, dir) =>
    import s.implicits._
    labeledDf(s, dir, TextFns.PosWords, TextFns.NegWords)
      .select($"doc_id", $"pos_n", $"neg_n", P.prnd($"raw", 6).as("score"), $"label")
  }

  /** Label distribution with share of corpus. */
  val distribution = QueryDef(
    "sent_distribution",
    s"""WITH ${labeledSql(TextFns.PosWords, TextFns.NegWords, "lx")}
       |SELECT label, COUNT(*) AS n,
       |  ${PS.prnd("COUNT(*) / SUM(COUNT(*)) OVER ()", 6)} AS share
       |FROM lxl GROUP BY label ORDER BY n DESC, label""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    labeledDf(s, dir, TextFns.PosWords, TextFns.NegWords)
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .withColumn("share", P.prnd($"n" / sum($"n").over(Window.partitionBy()), 6))
      .orderBy($"n".desc, $"label")
  }

  /** Two-labeler agreement matrix: full lexicon vs narrow lexicon. */
  val agreement = QueryDef(
    "sent_agreement",
    s"""WITH ${labeledSql(TextFns.PosWords, TextFns.NegWords, "a")},
       |${labeledSql(TextFns.PosWordsNarrow, TextFns.NegWordsNarrow, "b")}
       |SELECT al.label AS label_full, bl.label AS label_narrow,
       |  COUNT(*) AS n, al.label = bl.label AS agree
       |FROM al JOIN bl USING (doc_id)
       |GROUP BY 1, 2 ORDER BY label_full, label_narrow""".stripMargin) { (s, dir) =>
    import s.implicits._
    val a = labeledDf(s, dir, TextFns.PosWords, TextFns.NegWords)
      .select($"doc_id", $"label".as("label_full"))
    val b = labeledDf(s, dir, TextFns.PosWordsNarrow, TextFns.NegWordsNarrow)
      .select($"doc_id", $"label".as("label_narrow"))
    a.join(b, "doc_id")
      .groupBy($"label_full", $"label_narrow")
      .agg(count(lit(1)).as("n"))
      .withColumn("agree", $"label_full" === $"label_narrow")
      .orderBy($"label_full", $"label_narrow")
  }

  /** Per-document emoji counts + emoji_score = pos - neg — the reference's
    * emoji features (spark_ml_sentiment.py:92-101) over the marker-token
    * emoji classes (see [[TextFns.PosEmoji]]). Pure narrow map, codegen'd.
    */
  val emoji = QueryDef(
    "sent_emoji",
    s"""WITH em AS MATERIALIZED (SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(TextFns.PosEmoji)}))) AS BIGINT) AS positive_emojis,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(TextFns.NegEmoji)}))) AS BIGINT) AS negative_emojis
       |  FROM documents)
       |SELECT doc_id, positive_emojis, negative_emojis,
       |  positive_emojis - negative_emojis AS emoji_score
       |FROM em""".stripMargin) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toks, TextFns.PosEmoji).as("positive_emojis"),
      nIn(toks, TextFns.NegEmoji).as("negative_emojis"))
      .withColumn("emoji_score", $"positive_emojis" - $"negative_emojis")
  }

  val defs: Seq[QueryDef] = Seq(lexicon, distribution, agreement, emoji)
}
