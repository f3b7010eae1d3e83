package graft.tools
import graft._
import org.apache.spark.sql.functions._

/** Dev-only: plan-size probe of the BPE merge chain — does the per-round
  * ckpt truncate the logical plan, and how does per-round cost scale
  * with merge depth over the real corpus vocabulary?
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.Ckpt._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "").ckpt
    val vf = toks.groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"w".as("word"), $"freq").ckpt
    println(s"vocab=${vf.count()}")
    var seg = vf.select($"word", explode(sequence(lit(1), length($"word"))).as("i"))
      .select($"word", ($"i" - 1).cast("long").as("pos"),
        expr("substring(word, i, 1)").as("sym"))
      .ckpt
    for (r <- 1 to 32) {
      val t0 = System.nanoTime()
      val nxt = seg.select($"word".as("w2"), $"pos".as("p2"), $"sym".as("nxt"))
      val pc = seg.join(nxt, $"word" === $"w2" && $"p2" === $"pos" + 1)
        .join(vf.select($"word".as("w3"), $"freq"), $"word" === $"w3")
        .groupBy($"sym", $"nxt").agg(sum($"freq").cast("long").as("cnt"))
        .select($"sym".as("s1"), $"nxt".as("s2"), $"cnt")
      val best = pc.orderBy($"cnt".desc, $"s1".asc, $"s2".asc).limit(1)
        .select($"s1".as("bs1"), $"s2".as("bs2"))
      val mk = seg.join(nxt, $"word" === $"w2" && $"p2" === $"pos" + 1, "left")
        .join(broadcast(best), lit(true), "left")
        .select($"word", $"pos", $"sym", $"nxt",
          when($"sym" === $"bs1" && $"nxt" === $"bs2", 1).otherwise(0).as("m"))
      val isl = mk.withColumn("grp",
        $"pos" - row_number().over(Window.partitionBy($"word", $"m").orderBy($"pos")))
      val sel = isl.withColumn("mg",
        when($"m" === 1 && row_number()
          .over(Window.partitionBy($"word", $"m", $"grp").orderBy($"pos")) % 2 === 1, 1)
          .otherwise(0))
      val lg = sel.withColumn("pmg",
        coalesce(lag($"mg", 1).over(Window.partitionBy($"word").orderBy($"pos")), lit(0)))
      val pre = lg.filter($"pmg" === 0)
        .select($"word", $"pos".as("opos"),
          when($"mg" === 1, concat($"sym", $"nxt")).otherwise($"sym").as("sym"))
        .select($"word",
          (row_number().over(Window.partitionBy($"word").orderBy($"opos")) - 1)
            .cast("long").as("pos"),
          $"sym")
      val preLen = pre.queryExecution.logical.toString.length
      seg = pre.ckpt
      val segLen = seg.queryExecution.logical.toString.length
      val statDigits = seg.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length
      println(f"BPEPROBE r=$r%2d preplan=$preLen%9d postplan=$segLen%6d statDigits=$statDigits%9d t=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
