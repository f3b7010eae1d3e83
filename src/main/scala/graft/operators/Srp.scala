package graft.operators

import graft.functions.{Portable => P, PortableSql => PS}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sign-random-projection LSH over the `embeddings` table, shared by
  * embedding near-dup (SURVEY §2f dd_embedding) and ANN search
  * (§2g sim_lsh_topk).
  *
  * The ±1 hyperplanes are derived from md5(p,j) parity, so the identical
  * planes are reproducible in the DuckDB oracle. Per-plane dots run
  * through an exact decimal sum so the sign (bucket bit) is deterministic
  * across engines regardless of summation order.
  *
  * Scale notes: the plane table is tiny (planes × dims) and broadcast;
  * signatures are one exploded join + two keyed aggregations, all partial
  * — at 100 TB the bucket join prunes the candidate space to matching
  * buckets instead of the quadratic all-pairs space.
  */
object Srp {

  val Dim = 64

  /** ±1 plane table: (p, j∈1..Dim, sign). */
  def planes(s: SparkSession, nPlanes: Int): DataFrame = {
    import s.implicits._
    s.range(nPlanes).toDF("p").crossJoin(s.range(1, Dim + 1).toDF("j"))
      .select($"p", $"j",
        when(P.hexToLong(md5(concat($"p".cast("string"), lit(","), $"j".cast("string"))), 1, 1) % 2 === 0, 1)
          .otherwise(-1).as("sign"))
  }

  /** Per-vector band keys: (vec_id, band, bkey). nPlanes/bandSize bands. */
  def bandKeys(emb: DataFrame, nPlanes: Int, bandSize: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val expl = emb.select($"vec_id", posexplode($"embedding").as(Seq("j0", "x")))
      .select($"vec_id", ($"j0" + 1).as("j"), $"x")
    val dots = expl.join(broadcast(planes(s, nPlanes)), "j")
      .groupBy($"vec_id", $"p")
      .agg(sum($"x".cast("double").cast(DecimalType(18, 9)) * $"sign").as("dot"))
    dots.groupBy($"vec_id", expr(s"p div $bandSize").as("band"))
      .agg(sum(when($"dot" > 0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $bandSize AS INT))"))
        .otherwise(lit(0L))).as("bkey"))
  }

  /** DuckDB twin of [[planes]] + [[bandKeys]] as CTE text; exposes
    * `srp_bk(vec_id, band, bkey)`.
    */
  def bandKeysSql(nPlanes: Int, bandSize: Int): String = {
    val sign = PS.hexToLong("md5(p || ',' || j)", 1, 1)
    s"""srp_expl AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS j,
       |    unnest(embedding) AS x FROM embeddings),
       |srp_pl AS MATERIALIZED (SELECT p, j,
       |    CASE WHEN $sign % 2 = 0 THEN 1 ELSE -1 END AS sign
       |  FROM generate_series(0, ${nPlanes - 1}) tp(p), generate_series(1, $Dim) tj(j)),
       |srp_dots AS MATERIALIZED (SELECT vec_id, p,
       |    SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) * sign) AS dot
       |  FROM srp_expl JOIN srp_pl USING (j) GROUP BY vec_id, p),
       |srp_bk AS MATERIALIZED (SELECT vec_id, p // $bandSize AS band,
       |    SUM(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << CAST(p % $bandSize AS INT) ELSE 0 END) AS bkey
       |  FROM srp_dots GROUP BY vec_id, p // $bandSize)""".stripMargin
  }
}
