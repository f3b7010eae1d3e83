package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Dev-only: print the FORMATTED physical plan of one BPE merge round as
  * produced by the production learner ([[graft.operators.TextAnalysis
  * .bpeSegTaps]]) — the per-round plan shape is the whole cost of
  * `tx_bpe_tuning` (32 unrolled rounds), and this is the before/after
  * evidence for plans/r19. Usage:
  * `runMain graft.tools.BpeRoundPlan [sfDir] [round]`.
  */
object BpeRoundPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val round = if (args.length > 1) args(1).toInt else 1
    val s = GraftSession.get(4)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val vf = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"w".as("word"), $"freq")
    var roundPlan: org.apache.spark.sql.DataFrame = null
    val seg = graft.operators.TextAnalysis.bpeSegTaps(vf, Seq(round),
      (r, pre) => if (r == round) roundPlan = pre)(round)
    seg.collect()
    println(s"== Round $round pre-checkpoint plan ==")
    roundPlan.explain("formatted")
    s.stop()
  }
}
