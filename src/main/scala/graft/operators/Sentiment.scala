package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFns, Portable => P, PortableSql => PS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon sentiment (SURVEY §2d) — VADER-shaped scoring with ±0.05
  * 3-class thresholds (reference: spark-ml-sentiment/
  * spark_ml_sentiment.py:88-145), plus distribution and the two-labeler
  * agreement matrix (full vs narrow lexicon, standing in for the
  * reference's VADER-vs-ML comparison).
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

  private def labeledDf(s: SparkSession, dir: String,
      pos: Seq[String], neg: Seq[String]): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toks, pos).as("pos_n"),
      nIn(toks, neg).as("neg_n"),
      size(toks).cast("long").as("wc"))
      .withColumn("raw", ($"pos_n" - $"neg_n") / $"wc")
      .withColumn("label",
        when($"raw" > 0.05, "positive")
          .when($"raw" < -0.05, "negative")
          .otherwise("neutral"))
  }

  private def labeledSql(pos: Seq[String], neg: Seq[String], alias: String): String =
    s"""$alias AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(pos)}))) AS BIGINT) AS pos_n,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(neg)}))) AS BIGINT) AS neg_n,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc
       |  FROM documents),
       |${alias}l AS MATERIALIZED (
       |  SELECT doc_id, pos_n, neg_n, wc, (pos_n - neg_n) / wc AS raw,
       |    CASE WHEN (pos_n - neg_n) / wc > 0.05 THEN 'positive'
       |         WHEN (pos_n - neg_n) / wc < -0.05 THEN 'negative'
       |         ELSE 'neutral' END AS label
       |  FROM $alias)""".stripMargin

  /** Per-document lexicon score + 3-class label. */
  val lexicon = QueryDef(
    "sent_lexicon",
    s"""WITH ${labeledSql(TextFns.PosWords, TextFns.NegWords, "lx")}
       |SELECT doc_id, pos_n, neg_n, ${PS.prnd("raw", 6)} AS score, label
       |FROM lxl ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    labeledDf(s, dir, TextFns.PosWords, TextFns.NegWords)
      .select($"doc_id", $"pos_n", $"neg_n", P.prnd($"raw", 6).as("score"), $"label")
      .orderBy($"doc_id")
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
       |FROM em ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toks, TextFns.PosEmoji).as("positive_emojis"),
      nIn(toks, TextFns.NegEmoji).as("negative_emojis"))
      .withColumn("emoji_score", $"positive_emojis" - $"negative_emojis")
      .orderBy($"doc_id")
  }

  val defs: Seq[QueryDef] = Seq(lexicon, distribution, agreement, emoji)
}
