package graft

import org.apache.spark.sql.functions._

class GraphSpec extends GraftSuite {

  test("edges exclude the bot-account keys and carry positive weights") {
    val e = run("gr_edges")
    assert(e.count() > 0)
    assert(e.filter(col("src").isin("c1", "c2") || col("dst") === "s1").count() === 0)
    assert(e.filter(col("weight") <= 0).count() === 0)
  }

  test("pagerank mass sums to ~1") {
    val total = run("gr_pagerank").agg(sum("pagerank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-4, s"pagerank sum was $total")
  }

  test("eigenvector centrality is L2-normalized and positive") {
    val rows = run("gr_eigenvector").collect()
    assert(rows.nonEmpty)
    val sumSq = rows.map(r => math.pow(r.getAs[Double]("eigenvector"), 2)).sum
    assert(math.abs(sumSq - 1.0) < 1e-4, s"L2 norm^2 was $sumSq")
    assert(rows.forall(_.getAs[Double]("eigenvector") > 0))
  }

  test("every node gets a component and labels are canonical members") {
    val comp = run("gr_components")
    val nodes = operators.GraphOps.undirected(operators.GraphOps.edges(spark, sfDir))
      .select("node").distinct().count()
    assert(comp.count() === nodes)
    // component label is itself a node of the component
    assert(comp.filter(col("comp") > col("node")).count() === 0)
  }

  test("influencers are 20 deterministic rows with scores in [0,1]") {
    val rows = run("gr_influencers").collect()
    assert(rows.length === 20)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
  }

  test("community stats member counts cover all nodes") {
    val stats = run("gr_community_stats")
    val nodes = run("gr_components").count()
    assert(stats.agg(sum("n_members")).head().getLong(0) === nodes)
  }
}
