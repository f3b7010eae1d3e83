package graft

import java.util.concurrent.atomic.AtomicBoolean

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR,
  * emits ONE JSON line {"metric":...,"queries":{name:sec},...}. Failures
  * are reported explicitly under "errors" (never as a fake fast timing).
  *
  * The host shows intermittent 10-20x CPU throttling, so this main is
  * built to ALWAYS get a JSON line out before any external `timeout`
  * kills it:
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default 900s)
  *     caps total work: the optional second sample runs only while under
  *     half the budget, and remaining queries are skipped (reported under
  *     "skipped") once the budget is spent;
  *   - each query runs under a job group with a watchdog that cancels
  *     its Spark jobs if it alone would blow the remaining budget;
  *   - a JVM shutdown hook prints the partial JSON if the process gets
  *     SIGTERM'd anyway (external `timeout` sends TERM, hooks run).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "900").toDouble
    val spark = GraftSession.get(cpus)
    val sc = spark.sparkContext

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val printed = new AtomicBoolean(false)

    def emit(partial: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      val qs = timings.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val es = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
      val sk = skipped.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
      val total = timings.values.sum
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"skipped":$sk,"partial":$partial,"sf":"${esc(sfDir)}"}""")
      System.out.flush()
    }
    // Backstop: external `timeout` sends SIGTERM; the JVM runs shutdown
    // hooks on TERM, so a partial JSON line still reaches stdout.
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(partial = true)))

    val bench0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - bench0) / 1e9
    def remaining: Double = budgetSec - elapsed

    // Run one evaluation under a cancellable job group: if the query alone
    // would exhaust the remaining budget, its jobs get cancelled and the
    // query is reported as an error instead of hanging the whole bench.
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        limitSec: Double): Option[Double] = {
      spark.catalog.clearCache()
      sc.setJobGroup(name, name, interruptOnCancel = true)
      val watchdog = new Thread(() => {
        try { Thread.sleep((limitSec * 1000).toLong.max(1L)); sc.cancelJobGroup(name) }
        catch { case _: InterruptedException => () }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      val res = try {
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
      } finally {
        watchdog.interrupt()
        sc.clearJobGroup()
      }
      res
    }

    // warm the JVM/codegen once with the cheapest query so the first timed
    // query doesn't pay one-time session setup.
    try SparkEntry.queries.get("q1_pricing_summary").foreach(_(spark, sfDir).count()) catch { case _: Throwable => () }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (remaining <= 0) {
        skipped += name
      } else {
        val first = runOne(name, fn, remaining)
        // second sample only while comfortably inside the budget: under
        // throttling one pass is all we can afford, and a JSON line with
        // single-run timings beats no line at all.
        val runs = first.toSeq ++ (if (first.isDefined && elapsed < budgetSec / 2)
          runOne(name, fn, remaining) else None)
        if (runs.nonEmpty) {
          timings(name) = runs.min
          errors.remove(name) // a successful sample supersedes a cancelled one
        }
      }
    }
    emit(partial = skipped.nonEmpty)
    spark.stop()
  }
}
