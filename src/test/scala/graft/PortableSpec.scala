package graft

import org.apache.spark.sql.functions._
import graft.functions.{Portable => P}

/** Randomized (seeded) checks for the portability-critical primitives:
  * the exact fixed-point sum must be bit-identical across partitionings
  * and equal to a driver-side BigDecimal reference, and the portable
  * rounding/hex helpers must match their plain-Scala definitions on
  * adversarial values (negatives, magnitudes near the scale limits,
  * values ending in an exact 5 at the rounded digit).
  */
class PortableSpec extends GraftSuite {

  private val rnd = new scala.util.Random(42)

  test("dsum is partition-invariant and equals the exact BigDecimal reference") {
    import spark.implicits._
    // magnitudes spanning cents to ~1e9, both signs, plus exact-half ties
    val xs = Seq.fill(400)(
      (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(9))) ++
      Seq(0.005, -0.005, 1.115, -1.115, 123.455, 0.0)
    val scale = 2
    val f = math.pow(10, scale)
    // reference: the SAME per-row IEEE rounding, exact integer sum
    val expected = xs.map(x => BigDecimal(math.floor(x * f + 0.5).toLong))
      .sum.toDouble / f
    for (parts <- Seq(1, 7, 32)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(P.dsum($"x", scale).as("s")).head.getDouble(0)
      assert(got === expected, s"dsum diverged at $parts partitions")
    }
  }

  test("prnd matches the plain-Scala floor formulation, including half ties") {
    import spark.implicits._
    val xs = Seq.fill(300)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6))) ++
      Seq(0.5, -0.5, 2.5, -2.5, 0.0000005, 1.0 / 3.0)
    for (d <- Seq(0, 4, 6)) {
      val f = math.pow(10, d)
      val got = xs.toDF("x").select(P.prnd($"x", d).as("r"))
        .collect().map(_.getDouble(0))
      val exp = xs.map(x => math.floor(x * f + 0.5) / f)
      assert(got.toSeq === exp, s"prnd($d) diverged")
    }
  }

  test("hexToLong parses md5 slices exactly like Long.parseLong(_, 16)") {
    import spark.implicits._
    val ss = Seq.fill(200)(rnd.nextLong().toString)
    val got = ss.toDF("s")
      .select(md5($"s").as("h"))
      .select($"h", P.hexToLong($"h", 3, 15).as("v"))
      .collect()
    got.foreach { r =>
      val h = r.getString(0)
      assert(r.getLong(1) === java.lang.Long.parseLong(h.substring(2, 17), 16))
    }
  }
}
