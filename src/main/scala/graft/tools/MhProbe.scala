package graft.tools

import graft._
import graft.functions.{Portable => P}
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the minhash-LSH path at a given SF. */
object MhProbe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"MHPROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get(32)
    import spark.implicits._
    (1 to 2).foreach { round =>
      println(s"MHPROBE -- round $round")
      spark.catalog.clearCache()
      // ALIASED words array, matching the production minhashBands shape —
      // the earlier inline-`w` formulation duplicated split() into every
      // element_at of the shingle lambda and measured 5-8x the real cost,
      // which misled one round of profiling.
      def withW = Tables.documents(spark, dir)
        .select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= 5)
      val shingles = transform(
        sequence(lit(1), size($"w") - 4),
        i => concat_ws(" ", (0 until 5).map(o => element_at($"w", i + o)): _*))
      t("read+filter count")(withW.count())
      t("explode shingles count")(withW
        .select($"doc_id", explode(shingles).as("sgl")).count())
      t("+md5+hexToLong agg")(withW
        .select($"doc_id", explode(shingles).as("sgl"))
        .select($"doc_id", P.hexToLong(md5($"sgl"), 1, 8).as("h"))
        .agg(sum($"h")).collect())
      t("16-min groupBy")(
        {
          val shH = withW
            .select($"doc_id", explode(shingles).as("sgl"))
            .select($"doc_id", P.hexToLong(md5($"sgl"), 1, 8).as("h"))
          val mhAggs = (0 until 16).map { j =>
            min((lit(operators.Dedup.minhashA(j)) * $"h" + lit(operators.Dedup.minhashB(j))) % operators.Dedup.MinhashP).as(s"mh$j")
          }
          shH.groupBy($"doc_id").agg(mhAggs.head, mhAggs.tail: _*).count()
        })
      t("bands (no cap, no ckpt)")(operators.Dedup.minhashBands(spark, dir).count())
      t("capped+checkpointed bands")(
        operators.Dedup.lshCandidates(operators.Dedup.minhashBands(spark, dir)).count())
      t("full dd_minhash_lsh")(Registry.byName("dd_minhash_lsh").run(spark, dir).count())
    }
    spark.stop()
  }
}
