package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Dev-only: A/B the edge-build join strategy — broadcast(orders) build
  * (single-threaded relation build, ~0.3-0.6s at sf0.1) vs shuffle-hash
  * (parallel exchanges of both sides). min-of-N wall time per variant.
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.get(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def build(hint: String) = {
      val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
      val o0 = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      val o = if (hint.isEmpty) o0 else o0.hint(hint)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .agg(count(lit(1)).as("weight"))
    }
    SparkEntry.queries("q1_pricing_summary")(spark, dir).count() // warm
    for (h <- Seq("", "shuffle_hash", "merge")) {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); build(h).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"EDGEPROBE ${if (h.isEmpty) "broadcast" else h}%-14s min=${ts.min}%6.3f all=${ts.map(t => f"$t%5.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
