package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{TextFns, Portable => P, PortableSql => PS}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-data pipelines (SURVEY §2h) on `documents`:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Scale notes: every operator here is a pure narrow map built from array
  * functions (split / list_filter / transform / array_min) — no UDFs, no
  * shuffle, fully inside whole-stage codegen, so throughput is scan-bound
  * at 100 TB. Language ID avoids the per-doc window/shuffle formulation by
  * computing the argmax inside an array sort.
  */
object TextAnalysis {

  private def inList(words: Seq[String]): String = words.map(w => s"'$w'").mkString(", ")

  /** Stopword-overlap language ID: argmax over per-language marker counts,
    * ties broken by language code (ascending).
    */
  val langId = QueryDef(
    "tx_lang_id", {
      val cands = TextFns.LangMarkers.toSeq.sortBy(_._1)
      val unions = cands.map { case (lg, ws) =>
        s"""SELECT doc_id, lang, '$lg' AS cand,
           |  CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(ws)}))) AS BIGINT) AS cnt
           |FROM documents""".stripMargin
      }.mkString("(\n(", ") UNION ALL (", ")\n)")
      s"""WITH scored AS MATERIALIZED $unions,
         |ranked AS MATERIALIZED (SELECT doc_id, lang, cand, cnt,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand) AS rn
         |  FROM scored)
         |SELECT doc_id, cand AS pred_lang, cnt AS marker_hits, lang,
         |  cand = lang AS correct
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    val cands = TextFns.LangMarkers.toSeq.sortBy(_._1)
    // argmax without a shuffle: sort (−cnt, lang) structs inside the row.
    val scored = array(cands.map { case (lg, ws) =>
      struct((-TextFns.countTokensIn(toks, ws)).cast("long").as("negCnt"), lit(lg).as("cand"))
    }: _*)
    val best = element_at(array_sort(scored), 1)
    Tables.documents(s, dir).select(
      $"doc_id",
      best.getField("cand").as("pred_lang"),
      (-best.getField("negCnt")).as("marker_hits"),
      $"lang",
      (best.getField("cand") === $"lang").as("correct"))
      .orderBy($"doc_id")
  }

  /** Quality score: length saturation, stopword ratio, mean word length. */
  val quality = QueryDef(
    "tx_quality",
    s"""WITH f AS MATERIALIZED (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN (${inList(TextFns.StopWords)}))) AS BIGINT) AS stops
       |  FROM documents)
       |SELECT doc_id, n_chars, wc,
       |  ${PS.prnd("stops / wc", 6)} AS stop_ratio,
       |  ${PS.prnd("(n_chars - wc + 1) / wc", 6)} AS mean_word_len,
       |  ${PS.prnd(
            """CAST(0.4 AS DOUBLE) * least(n_chars / 400, CAST(1.0 AS DOUBLE))
              |    + CAST(0.3 AS DOUBLE) * (1 - stops / wc)
              |    + CAST(0.3 AS DOUBLE) * least(((n_chars - wc + 1) / wc) / 8, CAST(1.0 AS DOUBLE))""".stripMargin, 6)} AS quality
       |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val toks = split($"text", " ")
    val f = Tables.documents(s, dir).select(
      $"doc_id",
      length($"text").cast("long").as("n_chars"),
      size(toks).cast("long").as("wc"),
      TextFns.countTokensIn(toks, TextFns.StopWords).cast("long").as("stops"))
    f.select(
      $"doc_id", $"n_chars", $"wc",
      P.prnd($"stops" / $"wc", 6).as("stop_ratio"),
      P.prnd(($"n_chars" - $"wc" + 1) / $"wc", 6).as("mean_word_len"),
      P.prnd(lit(0.4) * least($"n_chars" / lit(400), lit(1.0))
        + lit(0.3) * (lit(1) - $"stops" / $"wc")
        + lit(0.3) * least((($"n_chars" - $"wc" + 1) / $"wc") / lit(8), lit(1.0)), 6)
        .as("quality"))
      .orderBy($"doc_id")
  }

  /** Whitespace tokens + regex word tokens + a BPE-ish chars/4 estimate. */
  val tokenCount = QueryDef(
    "tx_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS word_tokens,
      |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      size(split($"text", " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all($"text", lit("\\w+"), lit(0))).cast("long").as("word_tokens"),
      ceil(length($"text").cast("double") / lit(4)).cast("long").as("bpe_est"))
      .orderBy($"doc_id")
  }

  /** Whole-doc md5 + min-3-shingle winnowing-style fingerprint. */
  val fingerprint = QueryDef(
    "tx_fingerprint",
    """WITH t AS MATERIALIZED (SELECT doc_id, md5(text) AS doc_md5, string_split(text, ' ') AS w FROM documents)
      |SELECT doc_id, doc_md5,
      |  CASE WHEN len(w) >= 3 THEN
      |    list_aggregate(list_transform(generate_series(1, len(w) - 2),
      |      i -> md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])), 'min')
      |  ELSE NULL END AS min_shingle_md5
      |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val w = split($"text", " ")
    val shingleHashes = transform(
      sequence(lit(1), size(w) - 2),
      i => md5(concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
    Tables.documents(s, dir).select(
      $"doc_id",
      md5($"text").as("doc_md5"),
      when(size(w) >= 3, array_min(shingleHashes)).otherwise(lit(null))
        .as("min_shingle_md5"))
      .orderBy($"doc_id")
  }

  val defs: Seq[QueryDef] = Seq(langId, quality, tokenCount, fingerprint)
}
