package graft.tools
import graft._
import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Dev-only: print the physical plan of one pagerank-style round over the
  * cached iterRelation, to confirm whether the cache's HashPartitioning
  * reaches the per-round aggregation (exchange-free) or not.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val u = GraphOps.iterRelation(GraphOps.undirected(GraphOps.edgesNum(spark, dir)))
    u.count() // materialize cache
    val wdeg = u.groupBy($"node").agg(sum($"weight").as("wd"))
    println("=== wdeg over cached u (want: no exchange before partial agg) ===")
    wdeg.explain("formatted")
    val norm = u.join(broadcast(wdeg.localCheckpoint(false)), "node")
      .select($"node".as("src"), $"nb".as("dst"), ($"weight" / $"wd").as("p"))
      .repartition($"dst").persist()
    norm.count()
    val ranks = norm.select($"dst".as("node"), lit(1.0).as("r")).distinct().localCheckpoint(true)
    val contribs = norm.join(broadcast(ranks.withColumnRenamed("node", "src0")), $"src" === $"src0")
      .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
    println("=== one round contribs over cached norm (want: single stage, no exchange) ===")
    contribs.explain("formatted")
    spark.stop()
  }
}
