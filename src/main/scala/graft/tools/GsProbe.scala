package graft.tools
import graft._
import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import graft.functions.{Portable => P}

/** Dev-only: decompose gr_graph_stats wall time stage by stage (body
  * mirrors operators/GraphOps.grGraphStats).
  */
object GsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"GSPROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm once end-to-end
    SparkEntry.queries("gr_graph_stats")(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val e = GraphOps.edgesNum(spark, sfDir)
    t("edges_count")(e.count())
    val gn = e.select($"src".as("v")).union(e.select($"dst".as("v"))).distinct()
    t("gn_count")(gn.count())
    val cs = e.groupBy($"dst")
      .agg(slice(array_sort(collect_list($"src")), 1, GraphOps.ProjCap).as("m"))
      .select($"dst", explode($"m").as("src"))
      .persist()
    t("cs_persist")(cs.count())
    val proj = cs.select($"dst", $"src".as("a"))
      .join(cs.select($"dst", $"src".as("b")).hint("shuffle_hash"), "dst")
      .filter($"a" < $"b").select($"a", $"b").distinct()
      .localCheckpoint(false)
    t("proj_chk")(proj.count())
    val pn = proj.select($"a".as("v")).union(proj.select($"b".as("v"))).distinct()
    val smp = pn.orderBy($"v").limit(GraphOps.ClSampleK).localCheckpoint(false)
    t("smp_chk")(smp.count())
    val nbr = proj.join(broadcast(smp), $"a" === $"v").select($"v", $"b".as("n"))
      .union(proj.join(broadcast(smp), $"b" === $"v").select($"v", $"a".as("n")))
      .localCheckpoint(false)
    t("nbr_chk")(nbr.count())
    val dg = nbr.groupBy($"v").agg(P.cnt.as("d"))
    val tri = proj
      .join(broadcast(nbr.select($"v", $"n".as("a"))), "a")
      .join(broadcast(nbr.select($"v".as("v2"), $"n".as("n2"))),
        $"v2" === $"v" && $"n2" === $"b")
      .groupBy($"v").agg(P.cnt.as("t"))
    t("tri_count")(tri.count())
    val cl = dg.join(broadcast(tri), Seq("v"), "left")
      .select($"v", when($"d" >= 2,
        lit(2.0) * coalesce($"t", lit(0L)).cast("double") / ($"d" * ($"d" - 1)).cast("double"))
        .otherwise(lit(0.0)).as("c"))
      .localCheckpoint(false)
    t("ac_agg")(cl.agg(P.davg(P.prnd($"c", 9), 9).as("v")).collect())
    val scalars = gn.agg(P.cnt.cast("double").as("v")).select(lit("nn").as("k"), $"v")
      .union(e.agg(P.cnt.cast("double").as("v")).select(lit("ne").as("k"), $"v"))
      .union(cl.agg(P.davg(P.prnd($"c", 9), 9).as("v")).select(lit("ac").as("k"), $"v"))
      .union(cl.agg(P.cnt.cast("double").as("v")).select(lit("ss").as("k"), $"v"))
      .union(proj.agg(P.cnt.cast("double").as("v")).select(lit("pe").as("k"), $"v"))
    t("scalars_count")(scalars.count())
    cs.unpersist()
    spark.stop()
  }
}
