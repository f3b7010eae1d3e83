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
