package graft.tools
/** Dev-only: formatted plan for ONE query (PLANS.md section refresh). */
object PlansDocOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01").explain("formatted")
    spark.stop()
  }
}
