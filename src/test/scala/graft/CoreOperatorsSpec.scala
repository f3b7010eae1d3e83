package graft

import org.apache.spark.sql.functions._

/** Relational core + ETL + analytics: row-level sanity at sf0.001 and
  * plan-shape assertions (broadcast dims, no cartesian products,
  * pushdown-friendly scans).
  */
class CoreOperatorsSpec extends GraftSuite {

  test("q1 aggregates every (returnflag, linestatus) pair") {
    val rows = run("q1_pricing_summary").collect()
    assert(rows.length === 6)
    val counts = rows.map(_.getAs[Long]("count_order")).sum
    val total = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(counts === total)
  }

  test("q3 returns at most 10 orders sorted by revenue") {
    val rows = run("q3_top_orders").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q3 and q5 broadcast their dimension sides and never go cartesian") {
    for (q <- Seq("q3_top_orders", "q5_region_revenue")) {
      val plan = planOf(run(q))
      assert(plan.contains("BroadcastHashJoin"), s"$q should broadcast dims")
      assert(!plan.contains("CartesianProduct"), s"$q must not be cartesian")
    }
  }

  test("q1 scan prunes columns (no full-width lineitem read)") {
    val plan = planOf(run("q1_pricing_summary"))
    assert(!plan.contains("l_partkey"), "unused column must be pruned from the scan")
  }

  test("window rank keeps at most 3 orders per customer, rank starts at 1") {
    val df = run("q_window_rank")
    val perCust = df.groupBy("o_custkey").count().agg(max("count")).head().getLong(0)
    assert(perCust <= 3)
    assert(df.agg(min("rnk")).head().getLong(0) === 1)
  }

  test("etl_clean_text strips urls, mentions and hashtags") {
    import spark.implicits._
    val df = Seq("Check https://x.io @user #Spark NOW!").toDF("text")
    val cleaned = df.select(functions.TextFns.cleanText($"text").as("c")).head().getString(0)
    assert(cleaned === "check spark now")
  }

  test("etl_sessionize splits on >30min gaps") {
    import spark.implicits._
    val sessions = run("etl_sessionize")
    val ev = Tables.events(spark, sfDir)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === ev.count())
    // session bounds are consistent
    assert(sessions.filter($"session_end" < $"session_start").count() === 0)
  }

  test("analytics aggregations cover all events") {
    val ev = Tables.events(spark, sfDir).count()
    assert(run("an_timeline").agg(sum("n")).head().getLong(0) === ev)
    assert(run("an_dow_activity").agg(sum("n")).head().getLong(0) === ev)
    assert(run("an_value_buckets").agg(sum("n")).head().getLong(0) === ev)
    // the engagement histogram partitions USERS and its event totals
    // partition EVENTS — both must cover everything exactly once
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val cb = run("an_comment_buckets")
      .agg(sum("n_users"), sum("total_events")).head()
    assert(cb.getLong(0) === users)
    assert(cb.getLong(1) === ev)
  }

  test("as-of join matches a brute-force latest-prior-view lookup") {
    import spark.implicits._
    // micros, not getTime millis — the event timestamps carry µs precision
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2)), r.getString(3)))
    val views = ev.filter(_._4 == "view").groupBy(_._2)
    val rows = run("q_asof_join").collect()
    assert(rows.length === ev.count(_._4 == "purchase"))
    rows.foreach { r =>
      val (uid, t) = (r.getAs[Long]("user_id"), us(r.getAs[java.sql.Timestamp]("ts")))
      val want = views.getOrElse(uid, Array.empty).filter(_._3 <= t)
        .sortBy(v => (v._3, v._1)).lastOption
      val got = Option(r.getAs[java.lang.Long]("asof_view_id")).map(_.longValue)
      assert(got === want.map(_._1), s"user $uid at $t")
    }
  }

  test("keyterms: at most 3 ranked non-stopword terms per doc, scores descending") {
    import spark.implicits._
    val rows = run("tx_keyterms").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    }
    assert(rows.forall(r => !functions.TextFns.StopWords.contains(r.getAs[String]("term"))))
  }

  test("stratified sample is deterministic and tracks the per-stratum rates") {
    import spark.implicits._
    val a = run("etl_stratified_sample").collect()
    val b = run("etl_stratified_sample").collect()
    assert(a.map(_.getAs[Long]("doc_id")).toSeq === b.map(_.getAs[Long]("doc_id")).toSeq)
    val totals = Tables.documents(spark, sfDir).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toDouble).toMap
    val enRate = kept.getOrElse("en", 0.0) / totals("en")
    val otherKept = kept.filterNot(_._1 == "en").values.sum
    val otherTotal = totals.filterNot(_._1 == "en").values.sum
    assert(enRate > 0.05 && enRate < 0.40, s"en rate $enRate should track 20%")
    assert(otherKept / otherTotal > 0.40 && otherKept / otherTotal < 0.80,
      s"non-en rate ${otherKept / otherTotal} should track 60%")
  }

  test("repetition ratio is in [0,1) and zero only for all-distinct docs") {
    val rows = run("tx_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n3, d3, ratio) = (r.getAs[Long]("n3"), r.getAs[Long]("d3"), r.getAs[Double]("rep_ratio"))
      assert(ratio >= 0.0 && ratio < 1.0)
      assert((ratio == 0.0) === (n3 == d3))
    }
  }

  test("corpus prep covers every doc once with consistent verdicts") {
    import spark.implicits._
    val rows = run("etl_corpus_prep").collect()
    assert(rows.length.toLong === Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (wc, verdict, keep) =
        (r.getAs[Long]("wc"), r.getAs[String]("verdict"), r.getAs[Boolean]("keep"))
      assert(keep === (verdict == "keep"))
      if (wc < 16) assert(verdict === "too_short")
      if (wc > 94) assert(verdict === "too_long")
      // <= : the emitted quality column is prnd-rounded, so a raw score in
      // [0.6299995, 0.63) classifies low_quality yet rounds up to 0.63
      if (verdict == "low_quality") assert(r.getAs[Double]("quality") <= 0.63)
    }
    assert(rows.count(_.getAs[Boolean]("keep")) > 0, "gate must keep something")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "gate must reject something")
  }

  test("corpus mixture shares sum to 1 and weights respect the 3x cap") {
    val rows = run("tx_corpus_mixture").collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-6, s"token shares summed to $shareSum")
    rows.foreach { r =>
      val w = r.getAs[Double]("sample_weight")
      assert(w > 0.0 && w <= 3.0)
    }
  }

  test("rolling 7-day actives dominate single-day actives") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .select($"ts".cast("date").as("day"), $"user_id").distinct()
      .groupBy($"day").agg(countDistinct($"user_id").as("d1"))
    val rolled = run("an_rolling_active").join(daily, "day")
    assert(rolled.count() > 0)
    assert(rolled.filter($"active_7d" < $"d1").count() === 0)
  }

  test("cohort retention: offset-0 is the full cohort, later offsets never exceed it") {
    val rows = run("an_retention").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val off = r.getAs[Long]("week_offset"); off >= 0L && off <= 3L
    })
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week").toString)
    byCohort.values.foreach { rs =>
      val base = rs.find(_.getAs[Long]("week_offset") == 0L).get
      assert(base.getAs[Double]("retention") === 1.0)
      val size = base.getAs[Long]("n_active")
      assert(rs.forall(r => r.getAs[Long]("n_active") <= size))
      assert(rs.forall { r =>
        val rt = r.getAs[Double]("retention"); rt > 0.0 && rt <= 1.0
      })
    }
  }

  test("compact_latest: struct-max winner equals the window formulation, one row per key") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = run("etl_compact_latest")
    // one row per user, version counts sum to the log size
    assert(got.groupBy("user_id").count().filter($"count" > 1).count() === 0)
    assert(got.agg(sum($"n_versions")).head.getLong(0) ===
      Tables.events(spark, sfDir).count())
    // reference: the same winner via the per-key window sort the hash
    // aggregate replaces — identical rows
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val ref = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"value",
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy($"user_id")).as("n_versions"))
      .filter($"rn" === 1)
      .select($"user_id", $"ts".as("last_ts"), $"event_id".as("last_event_id"),
        $"value".as("last_value"), $"n_versions")
    assert(got.orderBy("user_id").collect().toSeq ===
      ref.orderBy("user_id").collect().toSeq)
    // plan shape: a hash aggregate, not a per-key window sort
    assert(!planOf(got).contains("Window"), "compaction must not plan a window")
  }

  test("scd2: planted tier changes yield chained validity intervals, one exchange") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    // user 1: low -> low (dup, dropped) -> high -> mid; user 2: one version
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 5.0), (2L, "2024-01-02 10:00:00", 1L, 7.0),
      (3L, "2024-01-03 10:00:00", 1L, 200.0), (4L, "2024-01-04 10:00:00", 1L, 50.0),
      (5L, "2024-01-01 12:00:00", 2L, 20.0))
      .map { case (e, t, u, v) => (e, java.sql.Timestamp.valueOf(t), u, "purchase", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Etl.scd2.run(spark, tmp).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val u1 = got(1L).sortBy(_.getAs[Long]("version"))
    assert(u1.map(_.getAs[String]("tier")).toSeq === Seq("low", "high", "mid"))
    // intervals chain: valid_to of version v = valid_from of v+1
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[java.sql.Timestamp]("valid_to") ===
        b.getAs[java.sql.Timestamp]("valid_from"))
    }
    assert(u1.count(_.getAs[Boolean]("is_current")) === 1)
    assert(u1.last.getAs[Boolean]("is_current"))
    assert(got(2L).length === 1 && got(2L).head.getAs[Boolean]("is_current"))
    // real corpus: exactly one open interval per user
    val real = run("etl_scd2")
    assert(real.filter($"is_current").groupBy("user_id").count()
      .filter($"count" =!= 1).count() === 0)
    // both windows and the change filter share one user_id exchange
    // (count in the AQE final plan section only — the initial plan
    // repeats the tree)
    val finalPlan = planOf(real).split("== Initial Plan ==").head
    val shuffles = finalPlan.linesIterator.count(_.matches(""".*[+:]- Exchange .*"""))
    assert(shuffles === 1, s"scd2 must shuffle exactly once:\n$finalPlan")
  }

  test("concurrency sweep: planted overlaps peak at 3; midnight-crossers count both days") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_conc").toString
    // sessions (30-min gap): u1 [10:00,10:20], u2 instant at 10:16,
    // u3 [10:15,10:40], u5 [10:55,11:05] (crosses the hour slice),
    // u4 [23:50, 00:10+1d] (crosses midnight) -> day1 peak 3 at 10:16
    val evs = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 10:20:00"),
      (2L, "2024-03-01 10:16:00"),
      (3L, "2024-03-01 10:15:00"), (3L, "2024-03-01 10:40:00"),
      (5L, "2024-03-01 10:55:00"), (5L, "2024-03-01 11:05:00"),
      (4L, "2024-03-01 23:50:00"), (4L, "2024-03-02 00:10:00"))
    evs.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(t), u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.concurrency.run(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(got.keySet === Set("2024-03-01", "2024-03-02"))
    assert(got("2024-03-01").getAs[Long]("n_sessions") === 5L)
    assert(got("2024-03-01").getAs[Long]("peak_concurrent") === 3L)
    assert(got("2024-03-02").getAs[Long]("n_sessions") === 1L)
    assert(got("2024-03-02").getAs[Long]("peak_concurrent") === 1L)
    // real corpus: peak never exceeds sessions, both positive
    run("an_concurrency").collect().foreach { r =>
      val p = r.getAs[Long]("peak_concurrent"); val n = r.getAs[Long]("n_sessions")
      assert(p >= 1L && p <= n)
    }
  }

  test("bloom prune: no false negatives by construction; planted non-members mostly pruned") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // build side: 500 high-value purchasers (u 1..500); probe side:
    // 100 of them view (must ALL pass — a member's bits are all set)
    // plus 500 disjoint viewers (u 10001..10500) — expected FP rate
    // (1 - e^(-3*500/4096))^3 ≈ 3%, so the prune should drop most
    val rows =
      (1 to 500).map(u => (u.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        u.toLong, "purchase", 200.0, "{}")) ++
      (1 to 100).map(u => (1000L + u, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"),
        u.toLong, "view", 1.0, "{}")) ++
      (1 to 500).map(u => (2000L + u, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"),
        10000L + u, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = operators.Relational.qBloomPrune.run(spark, tmp).head()
    assert(r.getAs[Long]("n_viewers") === 600L)
    assert(r.getAs[Long]("n_purchasers") === 500L)
    assert(r.getAs[Long]("n_true") === 100L)
    assert(r.getAs[Long]("n_missed") === 0L, "bloom must never drop a true member")
    assert(r.getAs[Long]("n_bloom_pass") >= 100L)
    assert(r.getAs[Double]("fp_rate") < 0.2, s"fp_rate ${r.getAs[Double]("fp_rate")}")
    // real corpus: the guarantee again, plus accounting consistency
    val c = run("q_bloom_prune").head()
    assert(c.getAs[Long]("n_missed") === 0L)
    assert(c.getAs[Long]("n_bloom_pass") ===
      c.getAs[Long]("n_true") + c.getAs[Long]("n_false_pos"))
  }

  test("train/val/test split: partitions the corpus, stable buckets, planted leak is flagged") {
    import spark.implicits._
    // recompute the operator's md5 bucket to pick doc ids landing in
    // different splits, then plant identical content across them
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0).toLong & 0xFF))
    }
    def splitOf(id: Long): String = {
      val b = bucket(id)
      if (b < operators.Etl.SplitTrainMax) "train"
      else if (b < operators.Etl.SplitValMax) "val" else "test"
    }
    val ids = 1L to 400L
    val trainId = ids.find(splitOf(_) == "train").get
    val valId = ids.find(splitOf(_) == "val").get
    val tmp = java.nio.file.Files.createTempDirectory("graft_split").toString
    ids.map { id =>
      val text = if (id == trainId || id == valId) "leaked duplicate content"
        else s"unique content for doc $id"
      (id, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = operators.Etl.splitTrainVal.run(spark, tmp).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    // every doc lands in exactly one split
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum === ids.length.toLong)
    // the planted twins are flagged in BOTH their splits, nothing else is
    assert(rows("train").getAs[Long]("leaked_docs") === 1L)
    assert(rows("val").getAs[Long]("leaked_docs") === 1L)
    assert(rows("test").getAs[Long]("leaked_docs") === 0L)
    // shares sum to 1
    val share = rows.values.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) < 1e-4)
    // real corpus: the 90/5/5 geometry holds to within hash noise
    val c = run("etl_split_train_val").collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Double]("share")).toMap
    assert(math.abs(c("train") - 0.9) < 0.05, s"train share ${c("train")}")
  }

  test("weighted sample: picks sum to exactly K; a dominant doc takes proportional picks") {
    import spark.implicits._
    // real corpus: Σpicks = K exactly (systematic sampling invariant)
    val real = run("etl_weighted_sample")
    assert(real.agg(sum($"picks")).head.getLong(0) === operators.Etl.SampleK)
    // planted corpus: one doc holding ~half the token mass must capture
    // ~half the K picks; every pick count is ≥ 1 on selected rows
    val tmp = java.nio.file.Files.createTempDirectory("graft_ws").toString
    val small = (1 to 100).map(i => (i.toLong, ("tok " * 10).trim, "en", "web", 40L))
    val giant = Seq((500L, ("tok " * 1000).trim, "en", "web", 4000L))
    (small ++ giant).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Etl.weightedSample.run(spark, tmp).collect()
    assert(got.map(_.getAs[Long]("picks")).sum === operators.Etl.SampleK)
    val g = got.find(_.getAs[Long]("doc_id") == 500L).get.getAs[Long]("picks")
    // giant doc holds 1000 of 2000 tokens -> 100 of 200 picks (±1 edge)
    assert(g >= 99L && g <= 101L, s"giant doc picks $g")
    assert(got.forall(_.getAs[Long]("picks") >= 1L))
  }

  test("chunk overlap: spans tile the doc with the configured overlap") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    // 80 distinct tokens -> chunks [1,32],[25,56],[49,80]; a fourth
    // window [73,80] would be fully contained in [49,80] and is never
    // emitted (no duplicate-content rows in the chunk table)
    val toks = (1 to 80).map(i => s"w$i")
    Seq((1L, toks.mkString(" "), "en", "web", 300L), (2L, "tiny doc", "en", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Etl.chunkOverlap.run(spark, tmp).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val c1 = got(1L).sortBy(_.getAs[Long]("chunk_id"))
    assert(c1.map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))).toSeq ===
      Seq((1L, 32L), (25L, 56L), (49L, 80L)))
    // every chunk past the first contributes new tokens
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("tok_end") > a.getAs[Long]("tok_end"))
    }
    // consecutive chunks overlap by size - stride = 8 tokens
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("tok_end") - b.getAs[Long]("tok_start") + 1 === 8L)
    }
    // digest is the md5 of the actual token span
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.slice(24, 56).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(c1(1).getAs[String]("chunk_md5") === d)
    // a doc shorter than one chunk yields exactly one full-doc chunk
    assert(got(2L).length === 1 && got(2L).head.getAs[Long]("n_tokens") === 2L)
  }

  test("kmv overlap: planted disjoint/nested audiences discriminate; estimates track exact") {
    import spark.implicits._
    // view: users 1-400; click: 201-600 (50% overlap with view);
    // purchase: 1001-1400 (disjoint from both)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    def evs(t: String, ids: Range) = ids.map(u =>
      (u.toLong * 7919 + t.hashCode.toLong.abs % 1000,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u.toLong, t, 1.0, "{}"))
    (evs("view", 1 to 400) ++ evs("click", 201 to 600) ++ evs("purchase", 1001 to 1400))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = operators.Analytics.kmvOverlap.run(spark, tmp).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    val vc = rows(("view", "click"))
    val vp = rows(("view", "purchase"))
    val cp = rows(("click", "purchase"))
    // exact overlaps (hash space = user space here: 60-bit collisions
    // among 1400 users are vanishingly unlikely and would fail loudly)
    assert(vc.getAs[Long]("exact_intersection") === 200L)
    assert(vp.getAs[Long]("exact_intersection") === 0L)
    assert(cp.getAs[Long]("exact_intersection") === 0L)
    // the estimator discriminates: the overlapping pair reads far above
    // the disjoint pairs, and within 50% of truth at k=64
    val estVc = vc.getAs[Double]("est_intersection")
    assert(estVc > 100.0 && estVc < 300.0, s"est_intersection $estVc")
    assert(vp.getAs[Double]("est_intersection") < 50.0)
    assert(cp.getAs[Double]("est_intersection") < 50.0)
    // per-audience estimates track the true 400 within 50%
    assert(math.abs(vc.getAs[Double]("est_a") - 400.0) < 200.0)
  }

  test("ab test: planted arm effect is significant; exchangeable corpus reads as A/A") {
    import spark.implicits._
    // recompute each user's md5-bit arm the way the operator does, then
    // plant a 100%-vs-0% conversion split along the REAL arm boundary
    def arm(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xF).toLong % 2
    }
    val users = (1L to 200L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ab").toString
    users.flatMap { u =>
      val base = Seq((u * 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        u, "view", 1.0, "{}"))
      if (arm(u) == 0L)
        base :+ ((u * 10L + 1, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"),
          u, "purchase", 200.0, "{}"))
      else base
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = operators.Analytics.abTest.run(spark, tmp).head()
    assert(r.getAs[Long]("n_a") === users.count(arm(_) == 0L).toLong)
    assert(r.getAs[Double]("rate_a") === 1.0)
    assert(r.getAs[Double]("rate_b") === 0.0)
    assert(r.getAs[Boolean]("significant"), "a 100% vs 0% split must be significant")
    // real corpus: arms are exchangeable by construction -> A/A reading
    // (measured z ≈ 0.93 at sf0.001/sf0.01; a flip here means the arm
    // hash or the statistic changed, not the corpus)
    val c = run("an_ab_test").head()
    assert(!c.getAs[Boolean]("significant"),
      s"A/A read significant: z=${c.getAs[Double]("z_score")}")
    assert(c.getAs[Long]("n_a") + c.getAs[Long]("n_b") ===
      Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("ab test: degenerate inputs (pooled rate 1, empty arm) yield NULL z, not NaN") {
    import spark.implicits._
    def arm(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xF).toLong % 2
    }
    def write(users: Seq[Long]): String = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ab_dgn").toString
      // every user converts -> pooled rate exactly 1 -> zero denominator
      users.map { u =>
        (u * 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          u, "purchase", 200.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    val both = operators.Analytics.abTest.run(spark, write(1L to 50L)).head()
    assert(both.isNullAt(both.fieldIndex("z_score")),
      "pooled rate 1 must yield NULL z, not NaN/Infinity")
    assert(!both.getAs[Boolean]("significant"),
      "an invalid test must not read significant")
    // one arm empty: rates stay NULL-guarded too
    val oneArm = operators.Analytics.abTest
      .run(spark, write((1L to 80L).filter(arm(_) == 0L))).head()
    assert(oneArm.getAs[Long]("n_b") === 0L)
    assert(oneArm.isNullAt(oneArm.fieldIndex("z_score")))
    assert(oneArm.isNullAt(oneArm.fieldIndex("rate_b")))
    assert(!oneArm.getAs[Boolean]("significant"))
  }

  test("session paths: planted journeys aggregate to ordered path strings") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_paths").toString
    // u1: one session view>click>purchase; u2: two single-view sessions
    // (45-min gap splits them); u3: same journey as u1
    val evs = Seq(
      (1L, "2024-04-01 10:00:00", "view"), (1L, "2024-04-01 10:05:00", "click"),
      (1L, "2024-04-01 10:10:00", "purchase"),
      (2L, "2024-04-01 09:00:00", "view"), (2L, "2024-04-01 09:45:00", "view"),
      (3L, "2024-04-01 12:00:00", "view"), (3L, "2024-04-01 12:05:00", "click"),
      (3L, "2024-04-01 12:10:00", "purchase"))
    evs.zipWithIndex.map { case ((u, t, ty), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(t), u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.sessionPaths.run(spark, tmp).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions")).toMap
    assert(got === Map("view" -> 2L, "view>click>purchase" -> 2L))
    // real corpus: path session counts re-total to the session count
    val total = run("an_session_paths").collect().map(_.getAs[Long]("n_sessions")).sum
    assert(total <= run("etl_sessionize").count())
  }

  test("pivot matrix: wide counts re-total to the timeline and the row sums") {
    import spark.implicits._
    val wide = run("an_pivot_daily").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    val tl = run("an_timeline").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("n")).toMap
    assert(wide.keySet === tl.keySet)
    wide.foreach { case (d, r) =>
      val cols = Seq("n_click", "n_error", "n_purchase", "n_signup", "n_view")
        .map(r.getAs[Long])
      assert(cols.sum === r.getAs[Long]("n_total"), d)
      assert(r.getAs[Long]("n_total") === tl(d), d)
    }
  }

  test("spike days: a planted 100x day is flagged, flat days are not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_spike").toString
    // 9 flat days of 5 events + one day with 100 — only that day should
    // clear the exact-integer 2-sigma test
    val rows = (0 until 9).flatMap { d =>
      (0 until 5).map(i => (d * 100L + i, java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 10:00:0$i"),
        1L, "view", 1.0, """{"k":1}"""))
    } ++ (0 until 100).map(i =>
      (9000L + i, java.sql.Timestamp.valueOf(s"2024-01-10 10:0${i % 6}:0${i % 10}"),
        1L, "view", 1.0, """{"k":1}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.spikeDays.run(spark, tmp).collect()
    assert(got.length === 10)
    val spikes = got.filter(_.getAs[Boolean]("is_spike"))
    assert(spikes.map(_.getAs[Long]("n_events")).toSeq === Seq(100L))
    // exact-integer invariant: the flag IS the dev2 > thr comparison
    got.foreach { r =>
      assert(r.getAs[Boolean]("is_spike") ===
        (r.getAs[Long]("dev2_scaled") > r.getAs[Long]("thr_scaled")))
    }
  }

  test("conversion funnel matches a brute-force per-user replay; one keyed exchange") {
    import spark.implicits._
    val df = run("an_conversion")
    val r = df.collect()(0)
    // independent reference: replay every user's event sequence in plain
    // Scala — first view, first click strictly after it, first purchase
    // strictly after that
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime * 1000 +
        x.getTimestamp(1).getNanos / 1000 % 1000, x.getString(2)))
      .groupBy(_._1)
    def firstAfter(es: Iterable[(Long, Long, String)], t: String, after: Long) = {
      val c = es.filter(e => e._3 == t && e._2 > after)
      if (c.isEmpty) None else Some(c.map(_._2).min)
    }
    var nv = 0L; var nc = 0L; var np = 0L
    evs.values.foreach { es =>
      firstAfter(es, "view", Long.MinValue).foreach { v =>
        nv += 1
        firstAfter(es, "click", v).foreach { c =>
          nc += 1
          firstAfter(es, "purchase", c).foreach(_ => np += 1)
        }
      }
    }
    assert(r.getAs[Long]("n_users") === evs.size.toLong)
    assert(r.getAs[Long]("n_view") === nv)
    assert(r.getAs[Long]("n_click") === nc)
    assert(r.getAs[Long]("n_purchase") === np)
    assert(r.getAs[Long]("n_view") >= r.getAs[Long]("n_click"))
    assert(r.getAs[Long]("n_click") >= r.getAs[Long]("n_purchase"))
    // plan shape: the two window passes and the per-user aggregate share
    // ONE hash exchange on user_id; only the closing single-row aggregate
    // adds its single-partition exchange (executedPlan: collect() above
    // finalized this QueryExecution's AQE plan)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyed === 1, s"funnel should shuffle once on user_id, planned $keyed:\n$plan")
  }

  test("session stats agree with the sessionize frame they summarize") {
    import spark.implicits._
    val sess = run("etl_sessionize").collect()
    val r = run("an_session_stats").collect()(0)
    assert(r.getAs[Long]("n_sessions") === sess.length.toLong)
    assert(r.getAs[Long]("n_users") ===
      sess.map(_.getAs[Long]("user_id")).distinct.length.toLong)
    assert(r.getAs[Long]("max_events") === sess.map(_.getAs[Long]("n_events")).max)
    val bounces = sess.count(_.getAs[Long]("n_events") == 1L)
    assert(math.abs(r.getAs[Double]("bounce_rate") -
      bounces.toDouble / sess.length) < 1e-6)
    val avgEv = sess.map(_.getAs[Long]("n_events")).sum.toDouble / sess.length
    assert(math.abs(r.getAs[Double]("avg_events") - avgEv) < 1e-6)
    assert(r.getAs[Double]("avg_duration_min") >= 0.0)
  }

  test("gini: histogram prefix-sum formula matches brute-force pairwise on a known table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_gini").toString
    // type "eq": 4 users x 3 events each -> G = 0
    // type "sk": counts 1,1,2,8 -> G = sum|ci-cj| / (2 N^2 mu)
    val rows =
      (1 to 4).flatMap(u => (1 to 3).map(i =>
        (u * 10L + i, java.sql.Timestamp.valueOf(s"2024-01-01 10:00:0$i"), u.toLong, "eq", 1.0, "{}"))) ++
      Seq(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 8).flatMap { case (u, c) =>
        (1 to c).map(i => (1000L + u * 20L + i,
          java.sql.Timestamp.valueOf(s"2024-01-02 10:00:${10 + i}"), u.toLong, "sk", 1.0, "{}")) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.gini.run(spark, tmp)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("eq").getAs[Double]("gini") === 0.0)
    assert(got("eq").getAs[Long]("n_users") === 4L)
    val cs = Seq(1L, 1L, 2L, 8L)
    val pair = (for (a <- cs; b <- cs) yield math.abs(a - b)).sum.toDouble
    val exp = pair / (2.0 * cs.length * cs.length * (cs.sum.toDouble / cs.length))
    assert(got("sk").getAs[Double]("gini") === math.floor(exp * 1e8 + 0.5) / 1e8)
    assert(got("sk").getAs[Long]("total_events") === 12L)
    // real corpus: valid range per type
    run("an_gini").collect().foreach { r =>
      val g = r.getAs[Double]("gini"); assert(g >= 0.0 && g < 1.0)
    }
  }

  test("hll sketch: portable estimate lands near planted distinct counts") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // type "big": 400 distinct users, one event each; type "sm": 40 users
    // seen 3 times each (duplicates must not move the sketch)
    val rows = (1 to 400).map(u => (u.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        u.toLong, "big", 1.0, "{}")) ++
      (1 to 40).flatMap(u => (1 to 3).map(i => (10000L + u * 10L + i,
        java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 900L + u, "sm", 1.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.hllUsers.run(spark, tmp)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("big").getAs[Long]("exact_users") === 400L)
    assert(got("sm").getAs[Long]("exact_users") === 40L)
    // raw HLL at m=64 has stddev ~1.04/sqrt(64) = 13%; 3 sigma bound
    got.values.foreach { r =>
      assert(r.getAs[Double]("rel_error") < 0.4,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("rel_error")}")
      assert(r.getAs[Double]("est_users") > 0.0)
    }
    // duplicates invariance: the same "sm" user set planted once each
    // under a new type (fresh dir — Spark caches file listings per path)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_hll2").toString
    (rows ++ rows.filter(_._4 == "sm").groupBy(_._3).map(_._2.head)
      .map(t => (90000L + t._1, t._2, t._3, "sm1", t._5, t._6)).toSeq)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp2/events.parquet")
    val got2 = operators.Analytics.hllUsers.run(spark, tmp2)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est_users")).toMap
    assert(got2("sm1") === got2("sm"), "estimate is a pure function of the distinct user set")
  }

  test("count-min sketch: estimates never undercount; a planted heavy hitter is exact-ish") {
    import spark.implicits._
    // real corpus: the CMS guarantee est >= exact must hold row-for-row,
    // and the probe set is the exact top-20 in order
    val rows = run("an_cm_topk").collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overestimate") >= 0L,
        s"user ${r.getAs[Long]("user_id")} undercounted")
      assert(r.getAs[Long]("est_count") ===
        r.getAs[Long]("exact_count") + r.getAs[Long]("overestimate"))
    }
    val exacts = rows.map(_.getAs[Long]("exact_count"))
    assert(exacts.sameElements(exacts.sortBy(-_)), "probes ordered by exact count")
    // planted corpus: one user with 1000 events among 10 singleton users —
    // a TRUE heavy hitter stands far above the sketch's ~N/w bias
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms").toString
    ((1 to 1000).map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        7L, "click", 1.0, "{}")) ++
      (1 to 10).map(u => (5000L + u, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"),
        100L + u, "click", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val planted = operators.Analytics.cmTopk.run(spark, tmp).collect()
    val hh = planted.find(_.getAs[Long]("user_id") == 7L).get
    assert(hh.getAs[Long]("exact_count") === 1000L)
    // worst case every singleton collides with the hitter in every row
    assert(hh.getAs[Long]("overestimate") <= 10L)
  }

  test("trend: closed-form slope matches a brute-force least squares on daily counts") {
    import spark.implicits._
    val daily = Registry.byName("an_timeline").run(spark, sfDir)
    // an_timeline is all types together; recompute per-type daily counts
    val perType = Tables.events(spark, sfDir)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    val got = run("an_trend").collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet === perType.keySet)
    perType.foreach { case (et, rws) =>
      val origin = java.sql.Date.valueOf("2024-01-01").toLocalDate
      val xy = rws.map { r =>
        val x = java.time.temporal.ChronoUnit.DAYS
          .between(origin, r.getAs[java.sql.Date]("day").toLocalDate).toDouble
        (x, r.getAs[Long]("y").toDouble)
      }
      val n = xy.length.toDouble
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(got(et).getAs[Double]("slope_per_day") - slope) < 1e-6, et)
      assert(got(et).getAs[Long]("n_days") === xy.length.toLong)
      assert(got(et).getAs[Long]("total_events") === sy.toLong)
    }
    assert(daily.count() > 0)
  }

  test("histogram quantile sketch: within one bucket of exact; planted interpolation is exact") {
    import spark.implicits._
    // real corpus: the sketch guarantee — est within one bucket width of
    // the exact quantile, row for row
    run("an_hist_quantiles").collect().foreach { r =>
      assert(r.getAs[Double]("abs_err") <= 8.0,
        s"${r.getAs[String]("event_type")} q=${r.getAs[Double]("q")}")
    }
    // planted corpus: values 0..79 -> 10 buckets of 8 each. t = 0.5*80 = 40
    // crosses in bucket 4 (cum 32->40): est = 32 + 8*(40-32)/8 = 40;
    // t = 72 crosses in bucket 8: est = 72. Exact interpolated quantiles
    // are 39.5 / 71.1, so the planted errors are 0.5 and 0.9.
    val tmp = java.nio.file.Files.createTempDirectory("graft_hq").toString
    (0 until 80).map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        i.toLong, "u", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.histQuantiles.run(spark, tmp)
      .collect().map(r => r.getAs[Double]("q") -> r).toMap
    assert(got(0.5).getAs[Double]("est_value") === 40.0)
    assert(got(0.5).getAs[Double]("exact_value") === 39.5)
    assert(got(0.9).getAs[Double]("est_value") === 72.0)
    assert(math.abs(got(0.9).getAs[Double]("abs_err") - 0.9) < 1e-6)
  }

  test("range join: planted boundary events prove [t-1h, t) inclusivity") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_range").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // purchase at 12:00; views at exactly -1h (IN, inclusive lower), -30m
    // (IN), 0 (OUT, exclusive upper), -1h-1s (OUT)
    val rows = Seq(
      (1L, ts("2024-01-01 12:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 11:30:00"), 3L, "view", 2.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 4L, "view", 4.0, "{}"),
      (5L, ts("2024-01-01 10:59:59"), 5L, "view", 8.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Relational.qRangeJoin.run(spark, tmp).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_views_1h") === 2L)
    assert(got.head.getAs[Double]("views_value") === 3.0)
  }

  test("pareto share: planted 91/1x9 distribution yields exact cutoff shares") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pareto").toString
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d")
    // user 1: 91 events; users 2..10: 1 each -> N=10 users, 100 events
    val rows = (1 to 91).map(i => (i.toLong, ts(i), 1L, "view", 1.0, "{}")) ++
      (2 to 10).map(u => (100L + u, ts(u), u.toLong, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.paretoShare.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("top_pct") ->
        (r.getAs[Long]("k_users"), r.getAs[Long]("events_topk"), r.getAs[Double]("share")))
      .toMap
    // k = ceil(10·p/100): p=1,5,10 -> 1 user (the heavy one, 91 events);
    // p=25 -> 3 users -> 93 events
    assert(got(1L) === ((1L, 91L, 0.91)))
    assert(got(5L) === ((1L, 91L, 0.91)))
    assert(got(10L) === ((1L, 91L, 0.91)))
    assert(got(25L) === ((3L, 93L, 0.93)))
  }

  test("active streaks: planted gap pattern yields islands of the right length") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_streak").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // u1 active on days 1,2,3,5,6 (streaks 3 and 2; two events on day 2
    // must not double-count); u2 one day
    val rows = Seq(
      (1L, ts(1), 1L), (2L, ts(2), 1L), (3L, ts(2), 1L), (4L, ts(3), 1L),
      (5L, ts(5), 1L), (6L, ts(6), 1L),
      (7L, ts(9), 2L))
      .map { case (e, t, u) => (e, t, u, "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.activeStreaks.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("max_streak"))).toMap
    assert(got(1L) === ((5L, 3L)))
    assert(got(2L) === ((1L, 1L)))
  }

  test("pipeline report: planted threshold breaches flip the gates; real corpus yields one row") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ops").toString
    // 60 docs: 50 long neutral + 5 long positive ("good good good") + 5
    // too-short ("hi", length 2 <= 5 -> unprocessed). processed = 55 >= 50
    // so the ML gate holds; only 3 distinct users so the network gate
    // (>= 30) breaches; 60 docs < 100 -> 'expand_sources'.
    val docs =
      (1L to 50L).map(i => (i, s"plain filler content row number $i", "en", "web")) ++
      (51L to 55L).map(i => (i, "good good good", "en", "web")) ++
      (56L to 60L).map(i => (i, "hi", "en", "web"))
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    (1L to 40L).map(i => (i, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
        i % 3, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = operators.Ops.pipelineReport.run(spark, tmp).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") === 60L)
    assert(row.getAs[Long]("n_events") === 40L)
    assert(row.getAs[Long]("n_processed") === 55L)
    assert(row.getAs[Long]("n_scored") === 5L)
    assert(row.getAs[Long]("n_users") === 3L)
    assert(row.getAs[Boolean]("ml_gate"))
    assert(!row.getAs[Boolean]("network_gate"))
    assert(!row.getAs[Boolean]("go"))
    assert(row.getAs[String]("recommendation") === "expand_sources")
    // coverage = 5/55
    assert(math.abs(row.getAs[Double]("coverage_pct") - 5.0 * 100 / 55).abs < 1e-4)
    // real corpus: exactly one row, coverage in [0, 100], counts positive
    val real = run("ops_pipeline_report").collect()
    assert(real.length === 1)
    assert(real.head.getAs[Long]("n_docs") > 0)
    val cov = real.head.getAs[Double]("coverage_pct")
    assert(cov >= 0.0 && cov <= 100.0)
  }

  test("infra gate: an empty temporal feed fails its floor and vetoes the composite go") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_infra").toString
    for (t <- Tables.names) {
      val src = if (t == "events") Tables.load(spark, sfDir, t).limit(0)
        else Tables.load(spark, sfDir, t).limit(12)
      src.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val got = operators.Ops.infraGate.run(spark, tmp).collect()
    assert(got.length === Tables.names.length)
    val byTbl = got.map(r => r.getAs[String]("tbl") -> r).toMap
    assert(!byTbl("events").getAs[Boolean]("rows_ok"), "empty feed must fail its floor")
    assert(!byTbl("events").getAs[Boolean]("ok"))
    assert(byTbl("documents").getAs[Boolean]("ok"), "populated tables stay green")
    assert(got.forall(!_.getAs[Boolean]("go")), "one red table vetoes the composite go")
    // real corpus: everything readable, floors met, 30-day span covers the horizon
    val real = run("ops_infra_gate").collect()
    assert(real.forall(_.getAs[Boolean]("ok")))
    assert(real.forall(_.getAs[Boolean]("go")))
    assert(real.find(_.getAs[String]("tbl") == "events").get
      .getAs[Long]("span_days") >= 7L)
  }

  test("relevance gate: list-order first match wins, case-insensitive, misses dropped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rel").toString
    val docs = Seq(
      (1L, "Using SPARK for analytics"),     // case-insensitive hit
      (2L, "stream first then merge data"),  // text order stream<merge, but
                                             // list order merge<stream wins
      (3L, "nothing relevant here at all"),  // miss -> dropped with reason
      (4L, "VECTOR search engine"))
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Etl.relevanceGate.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("keep"), r.getAs[String]("reason")))).toMap
    assert(got(1L) === ((true, "kw:spark")))
    assert(got(2L) === ((true, "kw:merge")))
    assert(got(3L) === ((false, "no_keyword")))
    assert(got(4L) === ((true, "kw:vector")))
    // scale shape: pure narrow map, zero exchanges
    val plan = planOf(run("etl_relevance_gate")).toLowerCase
    assert(!plan.contains("exchange"), s"relevance gate must not shuffle:\n$plan")
  }

  test("forecast naive: planted weekly-lag series scores exact MAE/MAPE") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_fc").toString
    // 'click' daily counts over Jan 1..10: 1,2,3,4,5,6,7,1,1,1 — only
    // days 8..10 have a day-7 predecessor (preds 1,2,3 -> |err| 0,1,2)
    val counts = Seq(1, 2, 3, 4, 5, 6, 7, 1, 1, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map { i =>
        (d * 100L + i,
          java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$i:00:00"),
          1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Analytics.forecastNaive.run(spark, tmp).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("event_type") === "click")
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("sum_abs_err") === 3L) // 0 + 1 + 2
    assert(r.getAs[Double]("mae") === 1.0)
    assert(r.getAs[Double]("mape") === 1.0) // (0/1 + 1/1 + 2/1) / 3
  }

  test("profile drift: a field going null on the arriving day shows as a null-rate jump") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pdrift").toString
    // history (Jan 1-2): props always present; arriving day (Jan 3): the
    // producer regressed and ships props = NULL on every event
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "click", Some("{}")),
      (2L, "2024-01-01 11:00:00", "view", Some("{}")),
      (3L, "2024-01-02 10:00:00", "click", Some("{}")),
      (4L, "2024-01-02 11:00:00", "view", Some("{}")),
      (5L, "2024-01-03 10:00:00", "click", None),
      (6L, "2024-01-03 11:00:00", "click", None))
      .map { case (e, t, ty, pr) =>
        (e, java.sql.Timestamp.valueOf(t), 1L, ty, 1.0, pr)
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Etl.profileDrift.run(spark, tmp).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val props = got("props")
    assert(props.getAs[Long]("n_base") === 4L)
    assert(props.getAs[Long]("n_batch") === 2L)
    assert(props.getAs[Double]("null_rate_base") === 0.0)
    assert(props.getAs[Double]("null_rate_batch") === 1.0) // the regression
    assert(props.getAs[Double]("null_rate_delta") === 1.0)
    assert(props.getAs[Long]("distinct_batch") === 0L) // nothing non-null left
    // the enum collapse shows too: event_type had 2 values, batch has 1
    val ty = got("event_type")
    assert(ty.getAs[Long]("distinct_base") === 2L)
    assert(ty.getAs[Long]("distinct_batch") === 1L)
    assert(ty.getAs[Double]("null_rate_delta") === 0.0) // no null story there
  }

  test("freshness: a quiet stream flags stale against the ingest high-water mark") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_fresh").toString
    // clicks flow until 12:00; errors went quiet at 02:00 (10h lag > 6h
    // horizon); views stopped 05:00 ago at 07:00 (5h lag, inside horizon)
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "click"), (2L, "2024-01-01 12:00:00", "click"),
      (3L, "2024-01-01 01:00:00", "error"), (4L, "2024-01-01 02:00:00", "error"),
      (5L, "2024-01-01 07:00:00", "view"))
      .map { case (e, t, ty) => (e, java.sql.Timestamp.valueOf(t), 1L, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = operators.Ops.freshness.run(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("lag_us"), r.getAs[Boolean]("stale")))).toMap
    assert(got("click") === ((0L, false))) // the high-water stream
    assert(got("error") === ((10L * 3600 * 1000000, true)))
    assert(got("view") === ((5L * 3600 * 1000000, false)))
  }

  test("dow anomaly: a Saturday burst flags in-cohort while the global test misses it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dowa").toString
    // six Saturdays 10,10,10,10,10,50 (burst z ≈ 2.24 in-cohort) and
    // three calm Mondays at 40 — the Mondays lift the GLOBAL σ enough
    // that an_spike_days does not flag the 50 (z_global ≈ 1.56), while
    // within the Saturday cohort it exceeds 2σ
    val days = Seq(
      ("2024-01-06", 10), ("2024-01-13", 10), ("2024-01-20", 10),
      ("2024-01-27", 10), ("2024-02-03", 10), ("2024-02-10", 50),
      ("2024-01-01", 40), ("2024-01-08", 40), ("2024-01-15", 40))
    val rows = days.zipWithIndex.flatMap { case ((d, c), i) =>
      (0 until c).map { j =>
        (i * 1000L + j, java.sql.Timestamp.valueOf(s"$d 12:00:00"),
          1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val dow = operators.Analytics.dowAnomaly.run(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Boolean]("is_spike"))
      .toMap
    assert(dow("2024-02-10"), "the Saturday burst must flag in-cohort")
    assert(dow.count(_._2) === 1, s"only the burst flags, got $dow")
    val global = operators.Analytics.spikeDays.run(spark, tmp).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Boolean]("is_spike"))
      .toMap
    assert(!global("2024-02-10"), "the global 2σ test must miss it (the point)")
  }

  test("mixture schedule: every prefix matches the stride weights, ties by lang") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix").toString
    // 8 en docs (weight 4) + 2 es docs (weight 1): stride positions are
    // en i/4 and es i/1, so the schedule interleaves 4 en per es
    val docs = (1L to 8L).map(i => (i, s"en doc $i", "en")) ++
      Seq((9L, "es doc 1", "es"), (10L, "es doc 2", "es"))
    docs.map { case (id, t, lg) => (id, t, lg, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = operators.Etl.mixtureSchedule.run(spark, tmp).collect()
    assert(got.length === 10)
    val order = got.sortBy(_.getAs[Long]("global_rank"))
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSeq
    // en4 (pos 1.0) ties es1 (pos 1.0): lang ascending puts en first
    assert(order === Seq(
      ("en", 1L), ("en", 2L), ("en", 3L), ("en", 4L), ("es", 9L),
      ("en", 5L), ("en", 6L), ("en", 7L), ("en", 8L), ("es", 10L)))
    // prefix property: any length-5k prefix carries 4k en + k es
    assert(order.take(5).count(_._1 == "en") === 4)
    assert(order.take(10).count(_._1 == "en") === 8)
    // positions are exact doubles (rank / power-of-two weight)
    val en1 = got.find(_.getAs[Long]("doc_id") == 1L).get
    assert(en1.getAs[Double]("pos") === 0.25)
  }
}
