package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Breaks q5_region_revenue's wall time into its floor components at a
  * given SF (default sf0.1): the bare 4-column lineitem decode (one
  * task — the testdata writes lineitem as a single row group, so the
  * scan cannot parallelize), the filtered orders scan, the shipped q5
  * plan (which since r17 IS the literal-regionkey form), and the same
  * plan with AQE off to expose the re-planning overhead. min-of-4 warm
  * samples. Historical r17 readings that drove the design: the old
  * region-join form 0.725s vs the literal form 0.694s; AQE off 0.59s.
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
    t("q5 shipped plan")(noop(graft.Registry.byName("q5_region_revenue").run(spark, dir)))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("q5 shipped (AQE off)")(noop(graft.Registry.byName("q5_region_revenue").run(spark, dir)))
    spark.stop()
  }
}
