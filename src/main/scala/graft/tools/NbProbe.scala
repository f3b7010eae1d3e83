package graft.tools

import graft._
import graft.operators.GraphOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Dev-only: shuffle-byte accounting for the stateBroadcast=false (100 TB
  * posture) iteration path vs the broadcast path — the evidence that a
  * non-broadcast pagerank round exchanges only |V|-row state, not the |E|
  * relation.
  */
object NbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val shufW = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    if (sys.env.get("NBPROBE_EXPLAIN").contains("1")) {
      // one non-broadcast round, fully spelled out: where do exchanges land?
      import org.apache.spark.sql.functions._
      val u = GraphOps.iterRelation(GraphOps.undirected(GraphOps.edgesNum(spark, dir)))
      val wdeg = u.groupBy($"node").agg(sum($"weight").as("wd")).localCheckpoint(false)
      val n = wdeg.count()
      val norm = u.join(wdeg.hint("shuffle_hash"), "node")
        .select($"node".as("src"), $"nb".as("dst"), ($"weight" / $"wd").as("p"))
        .repartition($"src")
        .persist()
      val ranks = wdeg.select($"node", (lit(1.0) / n).as("r")).localCheckpoint(false)
      val contribs = norm.join(ranks.withColumnRenamed("node", "src0").hint("shuffle_hash"), $"src" === $"src0")
        .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
      contribs.count() // materialize norm + run one round so AQE settles
      println("==== one more round, executed plan ====")
      val r2 = norm.join(contribs.select($"dst".as("src0"), $"contrib".as("r")).localCheckpoint(false).hint("shuffle_hash"), $"src" === $"src0")
        .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
      r2.count()
      r2.explain("formatted")
      spark.stop()
      return
    }
    for (bcast <- Seq(true, false); rep <- 1 to 2) {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(300)
      shufW.set(0L); shufR.set(0L)
      val t0 = System.nanoTime()
      val u = GraphOps.iterRelation(GraphOps.undirected(GraphOps.edgesNum(spark, dir)))
      val n = GraphOps.pagerank(u, iters, stateBroadcast = bcast).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"NBPROBE pagerank bcast=$bcast%-5s rep=$rep rows=$n sec=$sec%6.2f shufWriteMB=${shufW.get() / 1e6}%8.2f shufReadMB=${shufR.get() / 1e6}%8.2f")
    }
    spark.stop()
  }
}
