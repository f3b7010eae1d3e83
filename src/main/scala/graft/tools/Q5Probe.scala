package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.{Portable => P}
import org.apache.spark.sql.functions._

/** Breaks q5_region_revenue's wall time into its floor components at a
  * given SF (default sf0.1): the bare 4-column lineitem decode (one
  * task — the testdata writes lineitem as a single row group, so the
  * scan cannot parallelize), the filtered orders scan, the current q5
  * plan, and a literal-regionkey variant that folds the constant
  * region dim into a pushed filter on nation. min-of-4 warm samples.
  */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    import spark.implicits._
    def t(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"Q5PROBE $label%-28s min=${ts.min}%6.3f all=${ts.map(x => f"$x%5.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("lineitem 4col scan")(noop(Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")))
    t("orders filtered scan")(noop(Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")))
    t("q5 current")(noop(graft.Registry.byName("q5_region_revenue").run(spark, dir)))
    // literal-regionkey variant — this is what Relational.q5 now SHIPS;
    // the probe keeps its own copy only to time it against the old
    // region-join form above, and must mirror the production expression
    // (including the long cast) or it measures a different plan
    def q5lit(): org.apache.spark.sql.DataFrame = {
      val rk = Tables.region(spark, dir).filter($"r_name" === "ASIA")
        .select($"r_regionkey".cast("long")).as[Long].head()
      val n = Tables.nation(spark, dir).filter($"n_regionkey" === rk)
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      val l = Tables.lineitem(spark, dir)
      val sup = Tables.supplier(spark, dir)
      o.join(c.join(broadcast(n), $"c_nationkey" === $"n_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(l, $"l_orderkey" === $"o_orderkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
        .groupBy($"n_name")
        .agg(P.dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }
    t("q5 literal regionkey")(noop(q5lit()))
    // AQE off comparison for the same two
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("q5 current (AQE off)")(noop(graft.Registry.byName("q5_region_revenue").run(spark, dir)))
    t("q5 literal rk (AQE off)")(noop(q5lit()))
    spark.stop()
  }
}
