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

  test("feature exactness: vocabulary, IDF values and assembled vectors on a planted corpus") {
    // r14 verdict item 5: the pipeline's accuracy specs showed the stack
    // TRAINS; this pins the FEATURE MATH exactly on a 4-doc corpus small
    // enough to hand-compute. Corpus term totals: spark 5, merge 4,
    // fast 3, once 1 — so the fitted CountVectorizer vocabulary (ordered
    // by corpus frequency) is [spark, merge, fast] with 'once' dropped
    // by minDF=2; document frequencies spark 2, merge 3, fast 2 give
    // Spark's IDF ln((m+1)/(df+1)) with m=4; and d3 = "spark fast fast"
    // assembles [idf_spark, 0, 2·idf_fast, lex_score=1, n_tokens=3,
    // emoji_score=1].
    import spark.implicits._
    val docs = Seq(
      (1L, "spark merge spark spark spark"),
      (2L, "merge fast"),
      (3L, "spark fast fast"),
      (4L, "merge merge once"))
      .toDF("doc_id", "text")
    val model = SentimentPipeline.pipeline("lr")
      .fit(SentimentPipeline.labeled(docs))
    val cv = model.stages(2)
      .asInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]
    assert(cv.vocabulary.toSeq === Seq("spark", "merge", "fast"),
      s"fitted vocabulary: ${cv.vocabulary.mkString(",")}")
    val idf = model.stages(3)
      .asInstanceOf[org.apache.spark.ml.feature.IDFModel].idf.toArray
    val expIdf = Seq(math.log(5.0 / 3), math.log(5.0 / 4), math.log(5.0 / 3))
    idf.zip(expIdf).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-12, s"idf($i): $got vs $exp")
    }
    val feats = model.transform(SentimentPipeline.labeled(docs)
        .filter($"doc_id" === 3L))
      .select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector]("features").toArray
    val expFeats = Seq(math.log(5.0 / 3), 0.0, 2 * math.log(5.0 / 3),
      1.0, 3.0, 1.0) // tfidf(spark=1, merge=0, fast=2) ++ side-features
    assert(feats.length === expFeats.length)
    feats.zip(expFeats).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-12, s"feature($i): $got vs $exp")
    }
    // hashed mode: the same doc's text features land in exactly the
    // murmur3 buckets HashingTF.indexOf declares, with exact counts
    val hModel = SentimentPipeline.pipeline("lr", hashed = true)
      .fit(SentimentPipeline.labeled(docs))
    val htf = hModel.stages(2).asInstanceOf[org.apache.spark.ml.feature.HashingTF]
    val tf = hModel.stages.take(3).foldLeft(
        SentimentPipeline.labeled(docs).filter($"doc_id" === 3L): org.apache.spark.sql.DataFrame)(
        (df, st) => st.asInstanceOf[org.apache.spark.ml.Transformer].transform(df))
      .select("tf").head().getAs[org.apache.spark.ml.linalg.Vector]("tf")
    val expBuckets = Map(htf.indexOf("spark") -> 1.0, htf.indexOf("fast") -> 2.0)
    val gotBuckets = tf.toArray.zipWithIndex.collect { case (v, i) if v != 0.0 => i -> v }.toMap
    assert(gotBuckets === expBuckets, s"hashed buckets: $gotBuckets vs $expBuckets")
  }

  test("all three reference classifiers train (lr, rf, nb)") {
    val ranked = SentimentPipeline.compareClassifiers(Tables.documents(spark, sfDir))
    assert(ranked.map(_._1).toSet === Set("lr", "rf", "nb"))
    assert(ranked.forall { case (_, a) => a >= 0.0 && a <= 1.0 })
    // r17 verdict item 4: the comparison as DATA, not just "it trains" —
    // the reference's headline deliverable prints the three accuracies
    // (spark_ml_sentiment.py:216-296). Deterministic split (seed 42),
    // floors pinned under the measured values (recorded in SURVEY §2d)
    // so a feature or labeler regression fails the build.
    val acc = ranked.toMap
    assert(acc("lr") >= 0.90, s"lr accuracy regressed: $acc")
    assert(acc("rf") >= 0.80, s"rf accuracy regressed: $acc")
    assert(acc("nb") >= 0.55, s"nb accuracy regressed: $acc")
    info(s"classifier panel (seed 42): $acc")
  }

  test("sent_nb_eval's exact-NB agrees with MLlib NaiveBayes on the CORPUS split") {
    // r17 verdict item 4, second half: the planted-corpus agreement spec
    // proves the model math; this proves it on the REAL corpus and the
    // REAL md5 80/20 split sent_nb_eval gates on — per-doc prediction
    // identity, hence identical accuracy.
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val base = docs.select($"doc_id", $"text")
      .join(operators.Sentiment.labeledShared(spark, sfDir)
        .select($"doc_id", $"label"), "doc_id")
      .withColumn("bucket",
        graft.functions.Portable.hexToLong(md5($"doc_id".cast("string")), 1, 8) % 100)
    val train = base.filter($"bucket" < 80)
    val vald = base.filter($"bucket" >= 80)
    val mine = operators.Sentiment.nbPredict(train, vald).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("true_label"), r.getAs[String]("pred_label"))).toMap
    // MLlib twin on the same split: raw token counts into
    // NaiveBayes(smoothing = 1) — no IDF, no side features
    val li = when($"label" === "negative", 0.0)
      .when($"label" === "neutral", 1.0).otherwise(2.0)
    val trainW = train.withColumn("words", split($"text", " ")).withColumn("li", li)
    val valdW = vald.withColumn("words", split($"text", " "))
    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("words").setOutputCol("features").fit(trainW)
    val nb = new org.apache.spark.ml.classification.NaiveBayes()
      .setSmoothing(1.0).setFeaturesCol("features").setLabelCol("li")
      .fit(cv.transform(trainW))
    val back = Map(0.0 -> "negative", 1.0 -> "neutral", 2.0 -> "positive")
    val mllib = nb.transform(cv.transform(valdW))
      .select($"doc_id", $"prediction").collect()
      .map(r => r.getLong(0) -> back(r.getDouble(1))).toMap
    assert(mine.keySet === mllib.keySet)
    val diverged = mine.collect {
      case (id, (_, p)) if mllib(id) != p => id -> (p, mllib(id)) }
    assert(diverged.isEmpty, s"predictions diverged on the corpus split: $diverged")
    // and the accuracy both models share equals sent_nb_eval's oracled
    // accuracy column exactly
    val agree = mine.count { case (_, (t, p)) => t == p }
    val accHere = math.floor(agree.toDouble / mine.size * 1e6 + 0.5) / 1e6
    val gateAcc = run("sent_nb_eval").collect().head.getAs[Double]("accuracy")
    assert(accHere === gateAcc,
      s"spec-side accuracy $accHere != oracled gate accuracy $gateAcc")
  }

  test("sent_nb_eval's portable NB agrees with MLlib NaiveBayes on a planted separable corpus") {
    // r16 verdict item 5: the oracled model gate scores with an exact
    // integer-nanolog multinomial NB (Sentiment.nbPredict). Same model
    // as MLlib's NaiveBayes(smoothing=1) over raw token counts — this
    // plants a separable corpus and asserts both produce the identical
    // prediction per val doc (prior smoothing differs by the +1 doc,
    // invisible on separable data).
    import spark.implicits._
    val train = Seq(
      (1L, "bug crash fail sad", "negative"),
      (2L, "crash fail bug broken", "negative"),
      (3L, "meeting agenda notes plan", "neutral"),
      (4L, "notes plan meeting list", "neutral"),
      (5L, "great win success happy", "positive"),
      (6L, "win success great joy", "positive")
    ).toDF("doc_id", "text", "label")
    val vald = Seq(
      (11L, "bug crash broken", "negative"),
      (12L, "fail sad crash", "negative"),
      // 'zzznovel' is OUT OF the train vocabulary: CountVectorizer
      // projects it away, and nbPredict must likewise give it zero
      // weight in every class (an OOV charge against tot_c+V would be
      // class-dependent and could flip near-ties — r17 review catch)
      (13L, "agenda plan notes zzznovel", "neutral"),
      (14L, "great success win", "positive"),
      (15L, "joy happy win zzznovel zzznovel", "positive")
    ).toDF("doc_id", "text", "label")
    val mine = operators.Sentiment.nbPredict(train, vald).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_label")).toMap
    // MLlib twin: raw token counts (CountVectorizer, no IDF, no side
    // features) into NaiveBayes(smoothing = 1) — the same multinomial
    // add-one model nbPredict computes in exact integer nanologs
    val li = when($"label" === "negative", 0.0)
      .when($"label" === "neutral", 1.0).otherwise(2.0)
    val trainW = train.withColumn("words", split($"text", " ")).withColumn("li", li)
    val valdW = vald.withColumn("words", split($"text", " "))
    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("words").setOutputCol("features").fit(trainW)
    val nb = new org.apache.spark.ml.classification.NaiveBayes()
      .setSmoothing(1.0).setFeaturesCol("features").setLabelCol("li")
      .fit(cv.transform(trainW))
    val back = Map(0.0 -> "negative", 1.0 -> "neutral", 2.0 -> "positive")
    val mllib = nb.transform(cv.transform(valdW))
      .select($"doc_id", $"prediction").collect()
      .map(r => r.getLong(0) -> back(r.getDouble(1))).toMap
    assert(mine === mllib, s"portable NB and MLlib NB diverged: $mine vs $mllib")
    // and both are simply right on the separable plant
    assert(mine === Map(11L -> "negative", 12L -> "negative",
      13L -> "neutral", 14L -> "positive", 15L -> "positive"))
  }

  test("media pipeline: GRF1 encode/decode round-trips dims and features exactly") {
    val docs = Tables.documents(spark, sfDir)
    val decoded = MediaPipeline.decode(MediaPipeline.withPayload(docs))
    val rows = decoded.collect()
    assert(rows.length === docs.count())
    // every synthetic payload parses: no corrupt rows, dims in the
    // writer's domain, payload length structurally consistent
    assert(rows.forall(_.format.startsWith("grf1/")))
    assert(rows.forall(m => m.width >= 16 && m.width < 64 && m.height >= 16 && m.height < 64))
    assert(rows.forall(m => m.n_bytes ==
      MediaPipeline.HeaderBytes + m.width.toLong * m.height * m.channels))
    assert(rows.forall(m => m.mean_luma >= 0.0 && m.mean_luma <= 255.0))
    // exact feature check against an in-spec reference decode of one
    // hand-built payload: 2x2 gray, pixels 10/20/30/40 -> mean 25
    val hand = Array[Byte]('G', 'R', 'F', '1', 0, 2, 0, 2, 1, 10, 20, 30, 40)
    val one = MediaPipeline.decode(
      spark.createDataFrame(Seq((99L, hand))).toDF("doc_id", "payload")).collect()
    assert(one.head === graft.multimodal.MediaMeta(99L, 2, 2, 1, "grf1/gray", 13L, 25.0))
    // decode is partition-local: the plan plans no exchange
    val plan = planOf(decoded.toDF())
    assert(!plan.toLowerCase.contains("exchange"), s"decode must not shuffle:\n$plan")
  }

  test("media pipeline: nearest-neighbor resize — exact pixels, pass-throughs, composition") {
    // hand-built 4x4 gray raster with distinct pixels 1..16
    val px = (1 to 16).map(_.toByte).toArray
    val src = Array[Byte]('G', 'R', 'F', '1', 0, 4, 0, 4, 1) ++ px
    val out = MediaPipeline.resize(
      spark.createDataFrame(Seq((1L, src))).toDF("doc_id", "payload"), 2)
      .collect().head.getAs[Array[Byte]]("payload")
    val m = MediaPipeline.decode(
      spark.createDataFrame(Seq((1L, out))).toDF("doc_id", "payload")).collect().head
    assert((m.width, m.height, m.channels, m.format) === ((2, 2, 1, "grf1/gray")))
    // scale = 2.0: out(y, x) = src(2y, 2x) -> pixels 1, 3, 9, 11
    assert(out.drop(MediaPipeline.HeaderBytes).toSeq === Seq[Byte](1, 3, 9, 11))
    // within-bound and corrupt payloads pass through BYTE-IDENTICAL
    val small = Array[Byte]('G', 'R', 'F', '1', 0, 2, 0, 2, 1, 10, 20, 30, 40)
    val bad = Array[Byte]('J', 'P', 'E', 'G', 0, 2, 0, 2, 1, 1, 2, 3, 4)
    val thru = MediaPipeline.resize(
      spark.createDataFrame(Seq((1L, small), (2L, bad))).toDF("doc_id", "payload"), 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(thru(1L).toSeq === small.toSeq)
    assert(thru(2L).toSeq === bad.toSeq, "corrupt payloads ride through unchanged")
    // composition over the real corpus: every resized payload decodes
    // valid with max dim bounded, and the resize plan never shuffles
    // narrow filter, not limit: a global limit plans its own exchange,
    // which would mask the property under test
    val resized = MediaPipeline.resize(
      MediaPipeline.withPayload(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 50)), 20)
    val metas = MediaPipeline.decode(resized).collect()
    assert(metas.length === 50)
    assert(metas.forall(_.format.startsWith("grf1/")))
    assert(metas.forall(x => math.max(x.width, x.height) <= 20))
    val plan = planOf(resized)
    assert(!plan.toLowerCase.contains("exchange"), s"resize must not shuffle:\n$plan")
  }

  test("media pipeline: malformed payloads quarantine as corrupt rows, never throw") {
    val good = MediaPipeline.decode(MediaPipeline.withPayload(
      Tables.documents(spark, sfDir).limit(1))).collect().head
    // rebuild the good payload, then break it three ways
    def bb(xs: Array[Byte]) = xs
    val truncated = Array[Byte]('G', 'R', 'F')
    val badMagic = Array[Byte]('J', 'P', 'E', 'G', 0, 2, 0, 2, 1, 1, 2, 3, 4)
    val lengthMismatch = Array[Byte]('G', 'R', 'F', '1', 0, 2, 0, 2, 1, 1, 2) // 2 of 4 pixels
    val badDims = Array[Byte]('G', 'R', 'F', '1', 0, 0, 0, 2, 1)
    val rows = MediaPipeline.decode(
      spark.createDataFrame(Seq(
        (1L, bb(truncated)), (2L, bb(badMagic)),
        (3L, bb(lengthMismatch)), (4L, bb(badDims))))
        .toDF("doc_id", "payload")).collect()
      .map(m => m.doc_id -> m.format).toMap
    assert(rows(1L) === "corrupt/truncated_header")
    assert(rows(2L) === "corrupt/bad_magic")
    assert(rows(3L) === "corrupt/length_mismatch")
    assert(rows(4L) === "corrupt/bad_dims")
    assert(good.format.startsWith("grf1/"))
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

  test("mm_phash_dup: perceptual dHash pairs resized and perturbed duplicates the md5 detector misses") {
    import operators.{Dedup, Multimodal}
    def md5hex(p: Array[Byte]): String = java.security.MessageDigest
      .getInstance("MD5").digest(p).map("%02x".format(_)).mkString
    // corpus payloads big enough that resize(32) actually re-encodes
    val cand = MediaPipeline.withPayload(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 100))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload"))
      .filter { case (_, p) =>
        val m = MediaPipeline.decode(
          spark.createDataFrame(Seq((0L, p))).toDF("doc_id", "payload")).head()
        math.max(m.width, m.height) > 32
      }.sortBy(_._1)
    assert(cand.nonEmpty, "corpus must contain payloads above the resize bound")
    // deterministic plant: the first big payload whose nearest-neighbor
    // downscale stays within the Hamming radius (resize is APPROXIMATELY
    // dHash-invariant — the two floor-mapped samplings can disagree on a
    // few gradient bits, so the detector's contract is existential:
    // resized duplicates land within radius for real payloads, which the
    // md5 identity can never do)
    def dhashOf(p: Array[Byte]): Long = MediaPipeline.dhash(
      spark.createDataFrame(Seq((0L, p))).toDF("doc_id", "payload"))
      .head().getLong(1)
    val planted = cand.iterator.map { case (id, p) =>
      val rz = MediaPipeline.resize(
          spark.createDataFrame(Seq((0L, p))).toDF("doc_id", "payload"), 32)
        .head().getAs[Array[Byte]]("payload")
      (id, p, rz, java.lang.Long.bitCount(dhashOf(p) ^ dhashOf(rz)))
    }.find(_._4 <= Dedup.HammingMax)
    assert(planted.nonEmpty, "no big payload resized within the Hamming radius")
    val (docId, payload, resized, hamRz) = planted.get
    assert(resized.length != payload.length, "resize must have re-encoded")
    // noise plant: bump raster bytes OFF the 4x16 sampled grid — the
    // perceptual hash is exactly invariant, the md5 changes
    val meta = MediaPipeline.decode(
      spark.createDataFrame(Seq((0L, payload))).toDF("doc_id", "payload")).head()
    val (w, h, c) = (meta.width, meta.height, meta.channels)
    val sampled = (for {
      r <- 0 until MediaPipeline.DhashRows; x <- 0 until MediaPipeline.DhashCols
      ch <- 0 until c
    } yield ((r * h / MediaPipeline.DhashRows) * w + (x * w / MediaPipeline.DhashCols)) * c + ch).toSet
    val noisy = payload.clone()
    val offGrid = (0 until w * h * c).filterNot(sampled).take(3)
    assert(offGrid.size === 3)
    offGrid.foreach { i =>
      noisy(MediaPipeline.HeaderBytes + i) =
        ((noisy(MediaPipeline.HeaderBytes + i) + 1) & 0xff).toByte
    }
    // the exact-identity detector (mm_dup_frames' md5 rule) sees three
    // DISTINCT payloads — it cannot pair any of them
    assert(Seq(payload, resized, noisy).map(md5hex).distinct.length === 3)
    // the perceptual detector pairs both duplicates with the original
    val df = spark.createDataFrame(Seq((1L, payload), (2L, resized), (3L, noisy)))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairs(MediaPipeline.dhash(df)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs.get((1L, 3L)).contains(0),
      s"off-grid noise must leave the hash bit-identical (doc $docId): $pairs")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === hamRz &&
      hamRz <= Dedup.HammingMax,
      s"resized duplicate must pair within the radius (doc $docId): $pairs")
  }

  test("mm_phash_clusters: a perceptual-dup pair lands in ONE split where the md5 detector would scatter it") {
    import operators.{Dedup, Etl, Multimodal}
    import graft.functions.{Portable => P}
    // own-id split bucket (etl_split_train_val's key — what a dedup
    // pipeline using ONLY the md5 identity would split by, since a
    // re-encoded copy shares no md5 with its original and thus never
    // clusters)
    def ownBucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 2), 16)
    }
    def splitOf(b: Long): String =
      if (b < Etl.SplitTrainMax) "train" else if (b < Etl.SplitValMax) "val" else "test"
    // two ids whose OWN-id buckets land in different splits; the smaller
    // id is the cluster rep, so the pair's cluster split = splitOf(idA)
    val idA = 1L // bucket 196 -> train
    val idB = (2L to 400L).find(b => splitOf(ownBucket(b)) != splitOf(ownBucket(idA))).get
    // planted payloads: B is A's payload with off-grid raster noise —
    // every byte digest differs (md5 detector: two unrelated payloads),
    // the perceptual hash is bit-identical (Hamming 0)
    val base = MediaPipeline.withPayload(
        Tables.documents(spark, sfDir).filter(col("doc_id") === 0L))
      .head().getAs[Array[Byte]]("payload")
    val meta = MediaPipeline.decode(
      spark.createDataFrame(Seq((0L, base))).toDF("doc_id", "payload")).head()
    val (w, h, c) = (meta.width, meta.height, meta.channels)
    val sampled = (for {
      r <- 0 until MediaPipeline.DhashRows; x <- 0 until MediaPipeline.DhashCols
      ch <- 0 until c
    } yield ((r * h / MediaPipeline.DhashRows) * w + (x * w / MediaPipeline.DhashCols)) * c + ch).toSet
    val noisy = base.clone()
    (0 until w * h * c).filterNot(sampled).take(4).foreach { i =>
      noisy(MediaPipeline.HeaderBytes + i) =
        ((noisy(MediaPipeline.HeaderBytes + i) + 7) & 0xff).toByte
    }
    def md5hex(p: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(p).map("%02x".format(_)).mkString
    assert(md5hex(base) != md5hex(noisy), "the plant must defeat the md5 identity")
    val payloads = spark.createDataFrame(Seq((idA, base), (idB, noisy)))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairs(MediaPipeline.dhash(payloads))
    val pix = MediaPipeline.decode(payloads).toDF()
      .select(col("doc_id"), (col("width").cast("long") * col("height")).as("pixels"))
    val panel = Multimodal.phashClusterPanelOf(
        payloads.select(col("doc_id")), pairs, pix)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the md5-only pipeline would have scattered the pair across splits
    assert(splitOf(ownBucket(idA)) != splitOf(ownBucket(idB)),
      s"plant ids must diverge under own-id split keys ($idA, $idB)")
    // the perceptual cluster keys BOTH members by the rep -> one split
    assert(panel(idA).getAs[Long]("cluster") === idA)
    assert(panel(idB).getAs[Long]("cluster") === idA,
      "the noisy copy must join its original's cluster")
    assert(panel(idA).getAs[String]("split") === panel(idB).getAs[String]("split"),
      "a perceptual-dup pair must land in ONE split")
    assert(panel(idA).getAs[String]("split") === splitOf(ownBucket(idA)),
      "the cluster split key is the rep's bucket")
    assert(panel.values.forall(_.getAs[Long]("leaked_pairs") === 0L),
      "the leak audit must measure zero cross-split pairs")
    // resolution canonical: same dims here, so doc_id tiebreak -> idA;
    // and a cluster member never outranks a higher-resolution member
    assert(panel(idB).getAs[Long]("canonical_doc") === idA)
  }
}
