package graft.tools
import graft._
/** Dev-only: time each registered query twice (cold vs warm) at a given SF. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // same honest forcing as Bench: noop write materializes every
        // output column (count() lets Catalyst prune the projections)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name%-24s cold=${times(0)}%7.2f warm=${times(1)}%7.2f")
    }
    spark.stop()
  }
}
