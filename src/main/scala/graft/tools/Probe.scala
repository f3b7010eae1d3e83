package graft.tools
import graft._
import org.apache.spark.sql.functions._
/** Dev-only: isolate where time goes on tiny inputs. */
object Probe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = GraftSession.get(8)
    import spark.implicits._
    t("read+count 1")(Tables.lineitem(spark, dir).count())
    t("read+count 2")(Tables.lineitem(spark, dir).count())
    val cached = t("read once")(Tables.lineitem(spark, dir))
    t("count cached plan 1")(cached.count())
    t("count cached plan 2")(cached.count())
    t("plain double agg")(
      Tables.lineitem(spark, dir).groupBy($"l_returnflag").agg(sum($"l_quantity")).count())
    t("plain double agg 2")(
      Tables.lineitem(spark, dir).groupBy($"l_returnflag").agg(sum($"l_quantity")).count())
    t("decimal agg")(
      Tables.lineitem(spark, dir).groupBy($"l_returnflag")
        .agg(sum($"l_quantity".cast("decimal(18,2)"))).count())
    t("q1 plan only")(SparkEntry.queries("q1_pricing_summary")(spark, dir))
    t("q1 exec 1")(SparkEntry.queries("q1_pricing_summary")(spark, dir).count())
    t("q1 exec 2")(SparkEntry.queries("q1_pricing_summary")(spark, dir).count())
    t("q1 exec 3")(SparkEntry.queries("q1_pricing_summary")(spark, dir).count())
    spark.stop()
  }
}
/** Dev-only: per-iteration pagerank timing at a given SF, mirroring the
  * production algorithm (broadcast state + repartitioned cached norm +
  * eager localCheckpoint) with per-phase prints.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val und = graft.operators.GraphOps.undirected(graft.operators.GraphOps.edges(spark, dir))
    val u = und.persist(); val nodes = u.select($"node").distinct().persist()
    val n = nodes.count()
    println(f"PRPROBE setup+nodes ${(System.nanoTime()-t0)/1e9}%6.2f n=$n")
    val t1 = System.nanoTime()
    val wdeg = u.groupBy($"node").agg(sum($"weight").as("wd"))
    val norm = u.join(wdeg, "node").select($"node".as("src"), $"nb".as("dst"), ($"weight"/$"wd").as("p"))
      .repartition($"src").persist()
    println(f"PRPROBE norm ${norm.count()} rows parts=${norm.rdd.getNumPartitions} ${(System.nanoTime()-t1)/1e9}%6.2f")
    var ranks = nodes.select($"node", (lit(1.0)/n).as("r")).localCheckpoint(true)
    if (args.length > 1 && args(1) == "noaqe") spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (i <- 1 to 10) {
      val t = System.nanoTime()
      val contribs = norm.join(broadcast(ranks.withColumnRenamed("node", "src0")), $"src" === $"src0")
        .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
      val next = contribs.select($"dst".as("node"), (lit(0.15)/n + lit(0.85)*$"contrib").as("r"))
      val tPlan = System.nanoTime()
      val ck = next.localCheckpoint(true)
      ranks = ck
      println(f"PRPROBE iter$i total=${(System.nanoTime()-t)/1e9}%6.2f ckpt=${(System.nanoTime()-tPlan)/1e9}%6.2f")
    }
    spark.stop()
  }
}
/** Dev-only: plan-smell audit across every registered query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.get(8)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "noPushedFilters" -> (plan.contains("PushedFilters: []") && plan.contains("Filter")),
          "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin")
        ).collect { case (s, true) => s }
        val nEx = "Exchange".r.findAllIn(plan).length
        println(f"AUDIT $name%-22s exchanges=$nEx%2d ${if (smells.isEmpty) "ok" else smells.mkString(",")}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    p.split("\n").filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Cartesian")).foreach(l => println("PLANLINE " + l.take(200)))
    spark.stop()
  }
}
/** Dev-only: pagerank with checkpoint every K rounds instead of every
  * round — measures whether fusing iterations cuts the per-round job
  * latency floor without letting Catalyst re-analysis blow up.
  */
object PrFuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val every = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val und = graft.operators.GraphOps.undirected(graft.operators.GraphOps.edges(spark, dir))
    val u = und.localCheckpoint(true)
    val nodes = u.select($"node").distinct().localCheckpoint(true)
    val n = nodes.count()
    val wdeg = u.groupBy($"node").agg(sum($"weight").as("wd"))
    val norm = u.join(wdeg, "node")
      .select($"node".as("src"), $"nb".as("dst"), ($"weight"/$"wd").as("p"))
      .repartition($"src").localCheckpoint(true)
    println(f"PRFUSE setup ${(System.nanoTime()-t0)/1e9}%6.2f every=$every")
    var ranks = nodes.select($"node", (lit(1.0)/n).as("r")).localCheckpoint(true)
    val tAll = System.nanoTime()
    for (i <- 1 to 10) {
      val t = System.nanoTime()
      val contribs = norm.join(broadcast(ranks.withColumnRenamed("node", "src0")), $"src" === $"src0")
        .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
      val next = contribs.select($"dst".as("node"), (lit(0.15)/n + lit(0.85)*$"contrib").as("r"))
      ranks = if (i % every == 0 || i == 10) next.localCheckpoint(true) else next
      println(f"PRFUSE iter$i ${(System.nanoTime()-t)/1e9}%6.2f")
    }
    println(f"PRFUSE iterations total ${(System.nanoTime()-tAll)/1e9}%6.2f")
    println("PRFUSE checksum " + ranks.agg(sum($"r")).head())
    spark.stop()
  }
}
/** Dev-only: dump full formatted physical plans for the headline queries
  * (source for the committed PLANS.md evidence artifact).
  */
object PlansDoc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = Seq("q1_pricing_summary", "q5_region_revenue", "etl_clean_text",
      "dd_minhash_lsh", "dd_embedding", "dd_simhash", "sim_bruteforce_topk",
      "q_asof_join", "gr_edges", "gr_graph_stats", "an_comment_buckets",
      "tx_keyterms", "sim_ivf_topk", "tx_pii_scrub",
      // late-r10 additions
      "q_bloom_prune", "etl_scd2", "an_hist_quantiles", "an_concurrency",
      "etl_chunk_overlap", "gr_random_walks", "sim_mmr_topk")
    val spark = graft.GraftSession.get(8)
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    // one min-label iteration round over the node-partitioned numeric
    // iteration relation — the per-round shape the iterative graph ops
    // share (numeric labels keep the partial aggregate hash-based)
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val g = graft.operators.GraphOps
      val u = g.iterRelation(g.numericUnd(spark, dir))
      val lbls = u.select($"node").distinct()
        .select($"node", $"node".as("lbl")).localCheckpoint(true)
      // neighbor-min (exchange-free over the cached relation) + least(own)
      // through the same reused broadcast — the components round shape
      val l2 = lbls.withColumnRenamed("node", "nb0")
      val round = u.join(broadcast(l2), $"nb" === $"nb0")
        .groupBy($"node").agg(min($"lbl").as("nl"))
        .join(broadcast(l2), $"node" === $"nb0")
        .select($"node", least($"nl", $"lbl").as("lbl"))
      println("===== graph_iteration_round =====")
      round.explain("formatted")
      // one pagerank round over the dst-partitioned norm relation — the
      // aggregation must be exchange-free (no Exchange between the
      // broadcast join and the HashAggregate pair)
      val wdeg = u.groupBy($"node").agg(sum(lit(1L)).as("wd")).localCheckpoint(true)
      val norm = u.join(broadcast(wdeg), "node")
        .select($"node".as("src"), $"nb".as("dst"), (lit(1.0) / $"wd").as("p"))
        .repartition($"dst").persist()
      // materialize the cache first: rounds 2+ plan against the FINALIZED
      // cached partitioning (AQE can only report it after execution), and
      // that steady-state round is the shape that matters 9 times out of 10
      norm.count()
      val ranks = wdeg.select($"node", lit(1.0).as("r")).localCheckpoint(true)
      val prRound = norm
        .join(broadcast(ranks.withColumnRenamed("node", "src0")), $"src" === $"src0")
        .groupBy($"dst").agg(sum($"r" * $"p").as("contrib"))
      println("===== pagerank_round =====")
      prRound.explain("formatted")
    }
    spark.stop()
  }
}
/** Dev-only: compare shared graph-prefix shapes (edges→und materialization)
  * and per-round iteration cost over each, plus the wdeg-join strategy.
  */
object UndProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get(32)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"UNDPROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm
    graft.SparkEntry.queries("q1_pricing_summary")(spark, dir).count()

    def rounds(u: org.apache.spark.sql.DataFrame, n: Int, label: String): Unit = {
      var lbls = u.select($"node").distinct()
        .select($"node", $"node".as("lbl")).localCheckpoint(true)
      t(s"$label: $n rounds") {
        for (_ <- 1 to n) {
          val nb = u.join(broadcast(lbls.withColumnRenamed("node", "nb0")), $"nb" === $"nb0")
            .select($"node", $"lbl")
          lbls = nb.union(lbls).groupBy($"node").agg(min($"lbl").as("lbl")).localCheckpoint(true)
        }
      }
    }

    // A: current shape
    val uA = t("A: ed.ckpt + union + repart(nb) + ckpt") {
      val und = graft.operators.GraphOps.undirected(graft.operators.GraphOps.edges(spark, dir))
      und.repartition($"nb").localCheckpoint(true)
    }
    println("UNDPROBE A parts=" + uA.rdd.getNumPartitions)
    rounds(uA, 6, "A")

    // B: single ckpt, union branches run twice in parallel
    val uB = t("B: union(no inner ckpt) + repart(node) + ckpt") {
      val e = graft.operators.GraphOps.edges(spark, dir)
      e.select($"src".as("node"), $"dst".as("nb"), $"weight")
        .union(e.select($"dst".as("node"), $"src".as("nb"), $"weight"))
        .repartition($"node").localCheckpoint(true)
    }
    println("UNDPROBE B parts=" + uB.rdd.getNumPartitions)
    rounds(uB, 6, "B")

    // C: ed ckpt + union only (no 2nd materialization), iterate over union view
    val uC = t("C: ed.ckpt + union (no 2nd ckpt)") {
      graft.operators.GraphOps.undirected(graft.operators.GraphOps.edges(spark, dir))
    }
    println("UNDPROBE C parts=" + uC.rdd.getNumPartitions)
    rounds(uC, 6, "C")

    // D: union + ckpt, NO repartition — partitioning stays file-split
    // shaped; tests whether the prefix exchange pays for itself
    val uD = t("D: union + ckpt (no repart)") {
      val e = graft.operators.GraphOps.edges(spark, dir)
      e.select($"src".as("node"), $"dst".as("nb"), $"weight")
        .union(e.select($"dst".as("node"), $"src".as("nb"), $"weight"))
        .localCheckpoint(true)
    }
    println("UNDPROBE D parts=" + uD.rdd.getNumPartitions)
    rounds(uD, 6, "D")

    // E: lazy-ckpt variants of B and D (the production cadence)
    val uE = t("E: B-shape lazy ckpt (materialized in round 1)") {
      val e = graft.operators.GraphOps.edges(spark, dir)
      e.select($"src".as("node"), $"dst".as("nb"), $"weight")
        .union(e.select($"dst".as("node"), $"src".as("nb"), $"weight"))
        .repartition($"node").localCheckpoint(false)
    }
    rounds(uE, 6, "E")

    // wdeg join strategy over shape A
    t("wdeg agg+join+repart+ckpt (auto)") {
      val wdeg = uA.groupBy($"node").agg(sum($"weight").as("wd"))
      uA.join(wdeg, "node")
        .select($"node".as("src"), $"nb".as("dst"), ($"weight" / $"wd").as("p"))
        .repartition($"src").localCheckpoint(true)
    }
    t("wdeg agg+join+ckpt (explicit bcast, no repart)") {
      val wdeg = uA.groupBy($"node").agg(sum($"weight").as("wd"))
      uA.join(broadcast(wdeg), "node")
        .select($"node".as("src"), $"nb".as("dst"), ($"weight" / $"wd").as("p"))
        .localCheckpoint(true)
    }
    spark.stop()
  }
}
