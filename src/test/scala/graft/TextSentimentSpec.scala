package graft

import org.apache.spark.sql.functions._

class TextSentimentSpec extends GraftSuite {

  test("sentiment labels respect the ±0.05 thresholds") {
    import spark.implicits._
    val rows = run("sent_lexicon").collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score")
      r.getAs[String]("label") match {
        case "positive" => s > 0.05
        case "negative" => s < -0.05
        case "neutral"  => s >= -0.05 - 1e-9 && s <= 0.05 + 1e-9
      }
    })
  }

  test("sentiment distribution shares sum to 1") {
    val share = run("sent_distribution").agg(sum("share")).head().getDouble(0)
    assert(math.abs(share - 1.0) < 1e-4)
  }

  test("agreement matrix covers the whole corpus") {
    val n = run("sent_agreement").agg(sum("n")).head().getLong(0)
    assert(n === Tables.documents(spark, sfDir).count())
  }

  test("language id predicts a known language for every doc") {
    val langs = functions.TextFns.LangMarkers.keySet
    val rows = run("tx_lang_id").collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("quality score is bounded by construction") {
    val rows = run("tx_quality").collect()
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality"); q >= 0.0 && q <= 1.0 + 1e-9
    })
  }

  test("token counts agree with whitespace splitting on this corpus") {
    // corpus is single-space separated words, so both counters coincide
    assert(run("tx_token_count").filter(col("ws_tokens") =!= col("word_tokens")).count() === 0)
  }

  test("fingerprints are 32-hex md5 strings") {
    val rows = run("tx_fingerprint").collect()
    assert(rows.forall(_.getAs[String]("doc_md5").matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getAs[String]("min_shingle_md5").matches("[0-9a-f]{32}")))
  }

  test("native expressions: cosine and hamming ground truths") {
    val r = spark.sql(
      """SELECT
        |  graft_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS same,
        |  graft_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS ortho,
        |  graft_hamming(CAST(5 AS BIGINT), CAST(4 AS BIGINT)) AS ham
        |""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("same") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ortho")) < 1e-12)
    assert(r.getAs[Int]("ham") === 1)
  }
}
