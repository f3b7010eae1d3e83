package graft.ml

import graft.functions.{TextFns, VaderLexicon}
import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LogisticRegression, NaiveBayes, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib sentiment pipeline (SURVEY §2d ML): the Spark-native counterpart
  * of the reference's Tokenizer → StopWordsRemover → CountVectorizer(2000,
  * minDF=2) → IDF → classifier stack with an 80/20 split at seed 42
  * (reference: spark-ml-sentiment/spark_ml_sentiment.py:180-296). Labels
  * come from the lexicon scorer (the reference trains against its VADER
  * labels the same way).
  *
  * Scale notes: every stage is a distributed MLlib transformer —
  * CountVectorizer/IDF fit with a single pass + treeAggregate; logistic
  * regression trains with L-BFGS over partitioned gradients. Nothing
  * collects the corpus to the driver.
  */
object SentimentPipeline {

  val VocabSize = 2000
  val Seed = 42L

  /** Attach the 3-class lexicon label (0=neg, 1=neu, 2=pos) used as the
    * training target, plus the numeric side-features the assembler
    * combines with TF-IDF (the analog of the reference's score /
    * num_comments / emoji_score columns,
    * spark-ml-sentiment/spark_ml_sentiment.py:241-249). `lex_score` is
    * shifted into [0,1] so NaiveBayes (which requires nonnegative
    * features) keeps training.
    */
  def labeled(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = split($"text", " ")
    val raw = (TextFns.countTokensIn(toks, VaderLexicon.PosWords).cast("double") -
      TextFns.countTokensIn(toks, VaderLexicon.NegWords)) / size(toks)
    // emoji_score over the marker-token emoji classes
    // (spark_ml_sentiment.py:92-101), normalized by length and shifted by
    // +1 into [0,2] so NaiveBayes keeps its nonnegative-feature contract
    // (|pos - neg| ≤ word count, so the per-token rate is in [-1,1]).
    val emojiRaw = TextFns.countTokensIn(toks, VaderLexicon.PosEmoji).cast("double") -
      TextFns.countTokensIn(toks, VaderLexicon.NegEmoji)
    docs.select($"doc_id", $"text",
      when(raw > 0.05, 2.0).when(raw < -0.05, 0.0).otherwise(1.0).as("label"),
      (coalesce(raw, lit(0.0)) + 1.0) / 2.0 as "lex_score",
      size(toks).cast("double").as("n_tokens"),
      (coalesce(emojiRaw, lit(0.0)) / size(toks) + 1.0).as("emoji_score"))
  }

  /** Feature space of the hashed (vocabulary-free) mode — matches
    * `tx_hashed_features`' bucket count.
    */
  val HashFeatures = 4096

  /** Pipeline with the reference's three classifier choices: "lr"
    * (logistic regression), "rf" (random forest), "nb" (naive Bayes)
    * — spark_ml_sentiment.py:180-296 trains and compares all three.
    *
    * `hashed = true` swaps CountVectorizer for HashingTF — the
    * vocabulary-free mode (the ML twin of `tx_hashed_features`):
    * CountVectorizer's fit COLLECTS the top-[[VocabSize]] vocabulary to
    * the driver (an extra aggregate pass whose state grows with the
    * term universe), while HashingTF is stateless — no fit pass, no
    * driver-side vocabulary, fixed-width model at any corpus size.
    * The trade is hash collisions folding features together; the spec
    * measures that both modes train to comparable accuracy here.
    */
  def pipeline(classifier: String = "lr", hashed: Boolean = false): Pipeline = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val stop = new StopWordsRemover().setInputCol("words").setOutputCol("filtered")
      .setStopWords(TextFns.StopWords.toArray)
    val cv: PipelineStage =
      if (hashed) new HashingTF().setInputCol("filtered").setOutputCol("tf")
        .setNumFeatures(HashFeatures)
      else new CountVectorizer().setInputCol("filtered").setOutputCol("tf")
        .setVocabSize(VocabSize).setMinDF(2)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    // text features + the numeric side-features from labeled() — the
    // VectorAssembler stage the reference applies before its classifiers
    // (spark_ml_sentiment.py:241-249)
    val asm = new VectorAssembler()
      .setInputCols(Array("tfidf", "lex_score", "n_tokens", "emoji_score"))
      .setOutputCol("features")
    val clf = classifier match {
      case "lr" => new LogisticRegression().setMaxIter(50).setRegParam(0.01)
      case "rf" => new RandomForestClassifier().setNumTrees(50).setSeed(Seed)
      case "nb" => new NaiveBayes()
      case other => throw new IllegalArgumentException(s"unknown classifier: $other")
    }
    new Pipeline().setStages(Array(tok, stop, cv, idf, asm, clf))
  }

  /** Train on an 80/20 split (seed 42); returns (model, test accuracy). */
  def trainEval(docs: DataFrame, classifier: String = "lr",
      hashed: Boolean = false): (PipelineModel, Double) = {
    val data = labeled(docs)
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), Seed)
    val model = pipeline(classifier, hashed).fit(train)
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
      .evaluate(model.transform(test))
    (model, acc)
  }

  /** Train/eval all three reference classifiers, best first. */
  def compareClassifiers(docs: DataFrame): Seq[(String, Double)] =
    Seq("lr", "rf", "nb").map { c => c -> trainEval(docs, c)._2 }
      .sortBy(-_._2)
}
