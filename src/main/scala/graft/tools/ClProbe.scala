package graft.tools

import graft.GraftSession
import graft.operators.GraphOps

/** Bisects the landmark-closeness K against driver heap/time: runs
  * closeness at each K in args (default 8,12,16,20,24) on sf0.01 and
  * prints wall time — the r17 K-bump OOM'd at 8g and this isolates
  * where the cost turns.
  */
object ClProbe {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 12, 16, 20, 24)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get(8)
    // CLPROBE_CONF="k1=v1;k2=v2" — ';'-separated conf pairs (';' rather
    // than ',' so list-valued confs like extraJavaOptions keep their
    // commas); a malformed entry aborts with a clear message (r17
    // ADVICE: the old single-pair `val Array(k,v)=…` threw a bare
    // MatchError).
    sys.env.get("CLPROBE_CONF").foreach { confs =>
      confs.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"CLPROBE_CONF entry '$kv' is not key=value")
        }
      }
    }
    val u = GraphOps.sharedUnd(spark, dir)
    u.count()
    for (k <- ks) {
      val t0 = System.nanoTime()
      val n = GraphOps.closeness(u, k = k).count()
      println(f"CLPROBE k=$k%2d rows=$n%6d ${(System.nanoTime() - t0) / 1e9}%7.2f s heapMB=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576}")
      val t1 = System.nanoTime()
      val nw = GraphOps.closenessW(u, k = k).count()
      println(f"CWPROBE k=$k%2d rows=$nw%6d ${(System.nanoTime() - t1) / 1e9}%7.2f s heapMB=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576}")
    }
    spark.stop()
  }
}
