package graft.tools
import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dev-only: measure how much of a narrow-map query's wall time is the
  * global sort's range-boundary sampling pass re-executing the child
  * (etl_parse_json as the specimen).
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    def t(tag: String)(body: => Unit): Unit = {
      (1 to 2).foreach(_ => body)
      val t0 = System.nanoTime()
      body
      println(f"SORTPROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def base = Tables.events(spark, sfDir)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"),
        col("value"))
    t("no_sort_noop")(base.write.format("noop").mode("overwrite").save())
    t("sort_noop")(base.orderBy("event_id").write.format("noop").mode("overwrite").save())
    t("chk_sort_noop")(base.localCheckpoint(false).orderBy("event_id")
      .write.format("noop").mode("overwrite").save())
    t("repart1_sort_noop")(base.repartition(1).sortWithinPartitions("event_id")
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
