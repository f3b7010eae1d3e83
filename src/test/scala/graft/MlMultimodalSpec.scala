package graft

import graft.ml.SentimentPipeline
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

class MlMultimodalSpec extends GraftSuite {

  test("sentiment pipeline trains and beats random 3-class accuracy") {
    val (model, acc) = SentimentPipeline.trainEval(Tables.documents(spark, sfDir))
    assert(acc > 0.45, s"accuracy was $acc")
    assert(model.stages.length === 6)
    // assembled width = learned vocab + the 3 numeric side-features
    // (lex_score, n_tokens, emoji_score)
    val vocab = model.stages(2).asInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]
      .vocabulary.length
    val sample = model.transform(
      SentimentPipeline.labeled(Tables.documents(spark, sfDir)).limit(1))
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(sample.size === vocab + 3)
  }

  test("hashed (vocabulary-free) mode trains comparably with no fit-time vocab") {
    // HashingTF mode: no CountVectorizerModel stage (nothing collects a
    // vocabulary to the driver — the 100 TB mode), fixed 4096-wide text
    // features, and accuracy in the same band as the vocabulary pipeline
    val (model, acc) = SentimentPipeline
      .trainEval(Tables.documents(spark, sfDir), "lr", hashed = true)
    assert(acc > 0.45, s"hashed-mode accuracy was $acc")
    assert(!model.stages.exists(_.isInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]),
      "hashed mode still fit a driver-side vocabulary")
    val sample = model.transform(
      SentimentPipeline.labeled(Tables.documents(spark, sfDir)).limit(1))
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(sample.size === SentimentPipeline.HashFeatures + 3)
  }

  test("all three reference classifiers train (lr, rf, nb)") {
    val ranked = SentimentPipeline.compareClassifiers(Tables.documents(spark, sfDir))
    assert(ranked.map(_._1).toSet === Set("lr", "rf", "nb"))
    assert(ranked.forall { case (_, a) => a >= 0.0 && a <= 1.0 })
  }

  test("media pipeline decodes every payload with deterministic fake dims") {
    val docs = Tables.documents(spark, sfDir)
    val decoded = MediaPipeline.decode(MediaPipeline.withPayload(docs))
    val rows = decoded.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(m => m.width >= 16 && m.width < 80 && m.height >= 16 && m.height < 80))
    // payload bytes = utf-8 text bytes
    val n = docs.select(length(col("text"))).agg(sum("length(text)")).head().getLong(0)
    assert(rows.map(_.n_bytes).sum === n)
  }

  test("mm_binary_meta round-trips payload bytes as hex") {
    val rows = run("mm_binary_meta").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val hexed = r.getAs[String]("payload_hex")
      hexed.length === 2 * r.getAs[Long]("n_bytes") &&
        (hexed.isEmpty || hexed.take(2) === r.getAs[String]("magic_hex"))
    })
  }

  test("mm_frame_index: sampled frames tile the payload; digests match the byte windows") {
    import operators.Multimodal.{FrameBytes, SampleEvery}
    val meta = run("mm_binary_meta").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("payload_hex"), r.getAs[Long]("n_bytes"))).toMap
    val byDoc = run("mm_frame_index").collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, frames) =>
      val (ph, nb) = meta(id)
      val lastFrame = (nb - 1) / FrameBytes
      val expectIds = (0L to lastFrame by SampleEvery).toSeq
      assert(frames.map(_.getAs[Long]("frame_id")).sorted === expectIds)
      frames.foreach { f =>
        val (s0, e0) = (f.getAs[Long]("byte_start"), f.getAs[Long]("byte_end"))
        assert(s0 === f.getAs[Long]("frame_id") * FrameBytes)
        assert(e0 === math.min(s0 + FrameBytes, nb))
        assert(f.getAs[Long]("n_frames") === (nb + FrameBytes - 1) / FrameBytes)
        // digest is md5 of exactly this frame's hex window
        val slice = ph.substring((s0 * 2).toInt, (e0 * 2).toInt)
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(f.getAs[String]("frame_md5") === d)
      }
    }
  }
}
