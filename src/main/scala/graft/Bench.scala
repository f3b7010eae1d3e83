package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR,
  * emits ONE JSON line {"metric":...,"queries":{name:sec},...}. Failures
  * are reported explicitly under "errors" (never as a fake fast timing).
  *
  * The host shows intermittent 10-20x CPU throttling, so this main is
  * built to ALWAYS get a complete JSON line out before any external
  * `timeout` kills it:
  *   - queries run cheapest-first (previous round's timings, estimates for
  *     new queries), so a slow tail can never starve the cheap majority;
  *   - each query runs under a watchdog capped at budget/8 — one
  *     pathological query can no longer eat every other query's budget
  *     (round 3 lost 30 timings that way);
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 900s)
  *     caps total work, split 60% Spark pass / 40% oracle pass so the
  *     Spark sweep can never starve the oracle denominators; the optional
  *     second sample runs only while under half the Spark slice, and
  *     remaining queries are skipped (reported under "skipped") once the
  *     slice is spent;
  *   - all result collections are mutated under a lock and emit() copies
  *     under the same lock, so the SIGTERM shutdown hook can never race a
  *     mid-update mutation into a lost JSON line;
  *   - each sample gets a unique job group, so a stale watchdog from
  *     sample 1 can never cancel sample 2's jobs.
  *
  * After the Spark pass, if budget remains, the same query set's oracle
  * SQL is timed in DuckDB (via the driver-side python3+duckdb toolchain,
  * skipped silently if absent) and reported under "oracle" — the
  * denominator for the "within 2x of the reference at the same SF" bar.
  */
object Bench {

  /** Previous-round cost (sec at sf0.1, round-6 BENCH_SELF + TimeQ);
    * generous estimates for queries that have never been timed. Only the
    * ORDER matters — cheapest first guarantees full sweeps.
    */
  val priorCost: Map[String, Double] = Map(
    "an_value_buckets" -> 0.3, "an_comment_buckets" -> 0.4,
    "gr_graph_stats" -> 1.6,
    "an_explorer" -> 0.3, "an_top_groups" -> 0.4,
    "an_user_activity" -> 0.4, "an_timeline" -> 0.4, "an_quantiles" -> 0.5,
    "an_keyword_mentions" -> 0.5, "dd_exact" -> 0.5, "an_dow_activity" -> 0.7,
    "q1_pricing_summary" -> 0.5, "q3_top_orders" -> 0.7, "q5_region_revenue" -> 0.8,
    "q_rollup" -> 0.7, "q_window_rank" -> 1.0,
    "sent_lexicon" -> 0.8, "sent_distribution" -> 0.8, "sent_agreement" -> 1.0,
    "sent_emoji" -> 0.8,
    "tx_lang_id" -> 0.8, "tx_quality" -> 0.8, "tx_token_count" -> 0.6,
    "tx_fingerprint" -> 0.8, "mm_binary_meta" -> 0.8,
    "etl_clean_text" -> 1.0, "etl_filter_enrich" -> 1.0, "etl_dedup_ingest" -> 0.6,
    "etl_parse_json" -> 1.0, "etl_sessionize" -> 1.5, "st_window_agg" -> 1.2,
    "st_enrich_agg" -> 1.2,
    "dd_simhash" -> 1.5, "dd_embedding" -> 1.9, "dd_minhash_lsh" -> 1.4,
    "dd_ngram_jaccard" -> 1.8,
    "sim_pair_stats" -> 0.8, "sim_lsh_topk" -> 1.0, "sim_bruteforce_topk" -> 0.5,
    "dd_clusters" -> 2.7, "tx_contamination" -> 0.8, "tx_ngram_stats" -> 0.5,
    "tx_keyterms" -> 1.0, "q_asof_join" -> 1.0, "an_rolling_active" -> 0.7,
    "etl_stratified_sample" -> 0.5, "tx_repetition" -> 0.8,
    "etl_corpus_prep" -> 0.8, "tx_corpus_mixture" -> 0.4,
    "gr_edges" -> 1.5, "gr_degree" -> 1.4, "gr_degree_directed" -> 1.4,
    "gr_degree_buckets" -> 1.3,
    "gr_components" -> 2.2, "gr_closeness" -> 4.8, "gr_betweenness_approx" -> 9.0,
    "gr_pagerank" -> 4.5,
    "gr_eigenvector" -> 3.9, "gr_influencers" -> 4.5, "gr_communities" -> 3.0,
    "gr_community_stats" -> 3.1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "900").toDouble
    val spark = GraftSession.get(cpus)
    val sc = spark.sparkContext
    // WARN spam (shuffle cleanup, block manager) lands on the [error]
    // stream after emit() and pushed r5's JSON line out of the driver's
    // tail window — silence everything below ERROR.
    sc.setLogLevel("ERROR")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    // all four collections are guarded by `lock`: the SIGTERM shutdown
    // hook snapshots them while the main thread may still be mutating
    val lock = new Object
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val oracleT = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val printed = new AtomicBoolean(false)
    val lastJson = new java.util.concurrent.atomic.AtomicReference[String]("")

    def buildJson(partial: Boolean): String = {
      val (ts, os, es, sk) = lock.synchronized {
        (timings.toSeq, oracleT.toSeq, errors.toSeq, skipped.toSeq)
      }
      val qs = ts.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val or = os.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val er = es.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
      val skj = sk.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
      val total = ts.map(_._2).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"oracle":$or,"errors":$er,"skipped":$skj,"partial":$partial,"sf":"${esc(sfDir)}"}"""
    }
    def emit(partial: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      val line = buildJson(partial)
      lastJson.set(line)
      println(line)
      System.out.flush()
      // committed sidecar: timings survive any stdout-tail truncation
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_SELF.json"), line + "\n")
      catch { case _: Throwable => () }
    }
    // Backstop: external `timeout` sends SIGTERM; the JVM runs shutdown
    // hooks on TERM, so a partial JSON line still reaches stdout.
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(partial = true)))

    val bench0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - bench0) / 1e9
    def remaining: Double = budgetSec - elapsed
    // The Spark pass gets a HARD 60% of the budget; the DuckDB oracle pass
    // keeps a guaranteed ~30% (r5: the Spark sweep had first claim on the
    // whole budget and both oracle slices returned with zero denominators).
    val sparkBudgetSec = budgetSec * 0.6
    def sparkRemaining: Double = sparkBudgetSec - elapsed
    // cap any single query at 1/8 of the whole budget: a pathological
    // query costs one slot, not the rest of the sweep
    def perQueryCap: Double = math.min(sparkRemaining, budgetSec / 8)

    val sampleSeq = new AtomicInteger(0)
    // Run one evaluation under a cancellable, per-sample-unique job group:
    // if the query alone would exhaust its cap, its jobs get cancelled and
    // the query is reported as an error instead of hanging the whole bench.
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        limitSec: Double): Option[Double] = {
      spark.catalog.clearCache()
      // localCheckpoint blocks are freed by the ContextCleaner only after
      // the owning plan is GC'd; ~90 samples of graph/LSH checkpoints can
      // otherwise pile up in storage memory and inflate late queries
      // (gr_closeness was watchdog-cancelled three rounds running while
      // being seconds-fast in isolation).
      System.gc()
      val group = s"$name#${sampleSeq.incrementAndGet()}"
      val done = new AtomicBoolean(false)
      sc.setJobGroup(group, name, interruptOnCancel = true)
      val watchdog = new Thread(() => {
        try {
          Thread.sleep((limitSec * 1000).toLong.max(1L))
          if (!done.get()) sc.cancelJobGroup(group)
        } catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      val res = try {
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          lock.synchronized {
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          }
          None
      } finally {
        done.set(true)
        watchdog.interrupt()
        sc.clearJobGroup()
      }
      res
    }

    // warm the JVM/codegen once with the cheapest query so the first timed
    // query doesn't pay one-time session setup.
    try SparkEntry.queries.get("q1_pricing_summary").foreach(_(spark, sfDir).count()) catch { case _: Throwable => () }

    val ordered = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (priorCost.getOrElse(name, 5.0), name) }
    ordered.foreach { case (name, fn) =>
      if (sparkRemaining <= 0) {
        lock.synchronized { skipped += name }
      } else {
        val first = runOne(name, fn, perQueryCap)
        // extra samples only while comfortably inside the Spark slice.
        // The gr_* suite is included (r5 excluded it when the sweep was
        // budget-starved): the host's bursty 10-20x throttle spikes hit
        // the many-job iterative queries hardest, and min-of-N is the
        // only defense that smooths them — a third sample is taken for
        // queries over 1s, where a single spike costs whole seconds.
        val second = if (first.isDefined && elapsed < sparkBudgetSec / 2)
          runOne(name, fn, perQueryCap) else None
        val third = if (second.isDefined && (first.toSeq ++ second).min > 1.0
            && elapsed < sparkBudgetSec / 2)
          runOne(name, fn, perQueryCap) else None
        val runs = first.toSeq ++ second ++ third
        if (runs.nonEmpty) lock.synchronized {
          timings(name) = runs.min
          // a successful sample supersedes its own watchdog cancellation,
          // but a genuine intermittent failure stays visible
          if (errors.get(name).exists(_.contains("SPARK_JOB_CANCELLED"))) errors.remove(name)
        }
      }
    }

    // One retry for queries whose only sample was watchdog-cancelled: on a
    // host with documented 10-20x throttling spikes, a single cancellation
    // is usually a spike artifact (r4: dd_minhash_lsh cancelled at 112s
    // while its strict superset dd_ngram_jaccard finished in 4.7s in the
    // same sweep). A spike must cost one slot, not the timing forever.
    ordered.foreach { case (name, fn) =>
      val cancelled = lock.synchronized(
        !timings.contains(name) && errors.get(name).exists(_.contains("SPARK_JOB_CANCELLED")))
      if (cancelled && sparkRemaining > 0) {
        runOne(name, fn, perQueryCap).foreach { sec =>
          lock.synchronized {
            timings(name) = sec
            if (errors.get(name).exists(_.contains("SPARK_JOB_CANCELLED"))) errors.remove(name)
          }
        }
      }
    }

    // Oracle denominator: time each query's DuckDB oracle SQL at the same
    // SF through the driver-side python3+duckdb toolchain. Measurement
    // only — skipped silently when the toolchain is absent, and partial
    // results stream in line-by-line so a deadline kill keeps what
    // finished. Two slices: the cheap non-graph majority first (so a slow
    // graph CTE can never starve it), then the iterative-CTE graph suite
    // with its own budget — r4 ran one slice and lost every gr_* oracle
    // denominator to the shared deadline. Failures surface as
    // "oracle:<name>" errors instead of dying silently.
    val (grOracle, mainOracle) = ordered.map(_._1).partition(_.startsWith("gr_"))
    def reportOracle(name: String, res: Either[String, Double]): Unit =
      lock.synchronized {
        res match {
          case Right(sec) => oracleT(name) = sec
          case Left(err) => errors(s"oracle:$name") = err.take(200)
        }
      }
    // main slice capped so the gr_* slice (iterative CTEs, the expensive
    // denominators r4/r5 never recorded) keeps a guaranteed share of the
    // reserved 40%. The gr_* slice takes min-of-2 samples: the host's
    // 10-20x throttle windows swung identical gr oracle SQL 25.9→50.9s
    // across r6 sweeps, and min-of-2 is the same smoothing the Spark pass
    // already applies.
    try timeOracle(sfDir, math.min(remaining - 10, 150.0), 40.0, mainOracle, reps = 1)(reportOracle)
    catch { case _: Throwable => () }
    try timeOracle(sfDir, math.min(remaining - 10, 420.0), 120.0, grOracle, reps = 2)(reportOracle)
    catch { case _: Throwable => () }

    emit(partial = lock.synchronized(skipped.nonEmpty))
    spark.stop()
    // spark.stop() dumps shutdown/cleanup noise on stderr AND stdout; the
    // driver reads a tail window, so make the JSON line the LAST stdout.
    println(lastJson.get())
    System.out.flush()
  }

  /** Write oracle SQL + an interpreter script to temp files, stream
    * `name\tseconds` (or `name\tERR\treason`) lines back until EOF or
    * deadline. perQSec caps any single oracle query via con.interrupt.
    */
  private def timeOracle(sfDir: String, budgetSec: Double, perQSec: Double, order: Seq[String],
      reps: Int = 1)(
      report: (String, Either[String, Double]) => Unit): Unit = {
    if (budgetSec < 5) return
    val oracle = SparkEntry.oracleSql
    val items = order.flatMap(n => oracle.get(n).map(n -> _))
    if (items.isEmpty) return
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqlJson = items.map { case (k, v) => s"[${jq(k)},${jq(v)}]" }.mkString("[", ",", "]")
    val sqlFile = java.io.File.createTempFile("graft_oracle_", ".json")
    val pyFile = java.io.File.createTempFile("graft_oracle_", ".py")
    sqlFile.deleteOnExit(); pyFile.deleteOnExit()
    java.nio.file.Files.writeString(sqlFile.toPath, sqlJson)
    java.nio.file.Files.writeString(pyFile.toPath,
      """import sys, json, time, threading
        |import duckdb
        |sf, path, deadline, per_q, reps = (sys.argv[1], sys.argv[2],
        |    float(sys.argv[3]), float(sys.argv[4]), int(sys.argv[5]))
        |con = duckdb.connect()
        |for t in ["region", "nation", "customer", "supplier", "part",
        |          "orders", "lineitem", "events", "documents", "embeddings"]:
        |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        |start = time.time()
        |for name, sql in json.load(open(path)):
        |    best = None
        |    err = None
        |    for r in range(reps):
        |        remaining = deadline - (time.time() - start)
        |        if remaining <= 0:
        |            if best is None and err is None:
        |                err = "oracle pass deadline exhausted"
        |            break
        |        # per-query interrupt: one pathological oracle query (recursive
        |        # CTE) must cost one slot, not the whole oracle pass
        |        timer = threading.Timer(min(per_q, remaining), con.interrupt)
        |        timer.start()
        |        t0 = time.time()
        |        try:
        |            con.execute(sql).fetchall()
        |            dt = time.time() - t0
        |            best = dt if best is None else min(best, dt)
        |        except Exception as e:
        |            why = str(e).replace(chr(9), ' ').replace(chr(10), ' ')[:160]
        |            err = f"after {time.time() - t0:.1f}s: {why}"
        |        finally:
        |            timer.cancel()
        |    if best is not None:
        |        print(f"{name}\t{best:.3f}", flush=True)
        |    else:
        |        print(f"{name}\tERR\t{err or 'oracle query failed'}", flush=True)
        |""".stripMargin)
    val pb = new ProcessBuilder("python3", pyFile.getAbsolutePath,
      sfDir, sqlFile.getAbsolutePath, budgetSec.toLong.toString, perQSec.toString,
      reps.toString)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val killer = new Thread(() => {
      try { Thread.sleep((budgetSec * 1000).toLong + 5000); proc.destroyForcibly() }
      catch { case _: InterruptedException => () }
    })
    killer.setDaemon(true)
    killer.start()
    val rd = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
    try {
      var line = rd.readLine()
      while (line != null) {
        line.split('\t') match {
          case Array(n, s) if s != "ERR" =>
            try report(n, Right(s.toDouble)) catch { case _: NumberFormatException => () }
          case Array(n, _, why) => report(n, Left(why))
          case Array(n, _) => report(n, Left("oracle query failed"))
          case _ => ()
        }
        line = rd.readLine()
      }
    } finally {
      killer.interrupt()
      proc.destroyForcibly()
      rd.close()
    }
  }
}
