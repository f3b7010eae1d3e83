package graft.tools
import graft._
import org.apache.spark.sql.functions._
import graft.functions.{Portable => P}

/** Dev-only: decompose q1_pricing_summary's wall time — scan vs decimal
  * agg vs double agg vs forcing mode — to find where the 12x-vs-oracle
  * residual under noop forcing lives.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    import spark.implicits._
    def t(tag: String)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body)
      val t0 = System.nanoTime()
      body
      println(f"Q1PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val li = Tables.lineitem(spark, sfDir)
    println("rows=" + li.count())
    t("scan_count")(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count())
    def aggD = li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(P.dsum($"l_quantity").as("sum_qty"),
        P.dsum($"l_extendedprice").as("sum_base_price"),
        P.dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("sum_disc_price"),
        P.dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).as("sum_charge"),
        P.davg($"l_quantity").as("avg_qty"),
        P.davg($"l_extendedprice").as("avg_price"),
        P.davg($"l_discount", 4).as("avg_disc"),
        P.cnt.as("count_order"))
    def aggF = li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"),
        sum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
        avg($"l_quantity").as("avg_qty"), avg($"l_extendedprice").as("avg_price"),
        avg($"l_discount").as("avg_disc"), count(lit(1)).as("count_order"))
    t("agg_decimal_count")(aggD.count())
    t("agg_decimal_noop")(aggD.write.format("noop").mode("overwrite").save())
    t("agg_double_noop")(aggF.write.format("noop").mode("overwrite").save())
    t("full_q1_noop")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    t("full_q1_count")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count())
    spark.stop()
  }
}
