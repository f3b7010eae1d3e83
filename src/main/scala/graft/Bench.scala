package graft
/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR,
  * emits ONE JSON line {"metric":...,"queries":{name:sec},...}. Failures
  * are reported explicitly under "errors" (never as a fake fast timing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(cpus)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // warm the JVM/codegen once with the cheapest query so the first timed
    // query doesn't pay one-time session setup.
    try SparkEntry.queries.get("q1_pricing_summary").foreach(_(spark, sfDir).count()) catch { case _: Throwable => () }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // best of 2 runs: the host shows intermittent multi-x CPU throttling,
      // so a single sample can be arbitrarily unlucky. Each run stands
      // alone (clearCache drops the previous run's persisted relations).
      val runs = (1 to 2).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            None
        }
      }
      if (runs.nonEmpty) timings(name) = runs.min
    }
    val qs = timings.map { case (k, v) => "\"" + esc(k) + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
