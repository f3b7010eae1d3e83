package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Dev-only: decompose an_retention wall time (scan vs collect_set
  * shuffle vs cells vs final join+sort) under noop forcing.
  */
object RetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    import spark.implicits._
    def t(tag: String)(body: => Unit): Unit = {
      (1 to 2).foreach(_ => body)
      val t0 = System.nanoTime()
      body
      println(f"RETPROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val ev = Tables.events(spark, sfDir)
    println("events rows = " + ev.count())
    t("scan_count")(ev.select($"user_id").count())
    def perUser = ev
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("w"))
      .groupBy($"user_id").agg(collect_set($"w").as("ws"))
    t("perUser_count")(perUser.count())
    def cells = perUser
      .select(array_min($"ws").as("cw"), explode($"ws").as("w"))
      .select($"cw", (datediff($"w", $"cw") / 7).cast("long").as("week_offset"))
      .filter($"week_offset" <= 3)
      .groupBy($"cw", $"week_offset")
      .agg(count(lit(1)).as("n_active"))
    t("cells_count")(cells.count())
    t("full_noop")(SparkEntry.queries("an_retention")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
