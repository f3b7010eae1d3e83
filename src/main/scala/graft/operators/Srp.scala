package graft.operators

import graft.functions.{PortableSql => PS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Scale notes: the ±1 signs are plan-time constants, so signatures are a
  * pure narrow projection (no plane join, no shuffle) — at 100 TB the
  * bucket join then prunes the candidate space to matching buckets
  * instead of the quadratic all-pairs space.
  */
object Srp {

  val Dim = 64

  /** JVM-side twin of the md5-parity sign (same md5 of "p,j", same
    * first-hex-char parity as [[planes]] / the SQL derivation) — computed
    * once at plan-build time so signatures need no plane-table join.
    */
  private def signOf(p: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p,$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Per-vector band keys: (vec_id, band, bkey). nPlanes/bandSize bands.
    *
    * dot_p = Σ_j x_j·sign(p,j), matched to the oracle's exact
    * DECIMAL(18,9) sum through SCALED LONG arithmetic: the oracle's
    * decimal term is exactly round-half-away(x·1e9)/1e9, and a float
    * mantissa (24 bits) times 5^9 (21 bits) fits a double's 53-bit
    * significand, so x·1e9 and the ±0.5 adjust are computed EXACTLY in
    * double — the long term equals the decimal term·1e9 bit-for-bit, the
    * long sum is exact, and sign(Σ long) = sign(Σ decimal). That turns
    * 16 plane folds of 64 BigDecimal multiply-adds per row (measured
    * 1.7-1.9s of sim_lsh_topk's 2.3s at sf0.1) into primitive long
    * codegen. The in-row array aggregate itself already replaced the
    * earlier posexplode→plane-join→re-aggregate pipeline (N·planes·dims
    * intermediate rows and two shuffles → zero shuffles), so signatures
    * stay a pure narrow projection that scales embarrassingly at 100 TB.
    */
  def bandKeys(emb: DataFrame, nPlanes: Int, bandSize: Int): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    // r_j = round-half-away-from-zero(x_j · 1e9) as an exact long — the
    // decimal(18,9) value scaled by 1e9 (HALF_UP in BigDecimal rounds
    // away from zero, hence the explicit signum)
    val scaled = transform($"embedding", x =>
      (signum(x).cast("double") * floor(abs(x.cast("double")) * 1e9 + lit(0.5)))
        .cast("long"))
    def dot(p: Int): Column = {
      val sgn = typedlit((1 to Dim).map(j => signOf(p, j).toLong))
      aggregate(
        zip_with($"sc", sgn, (r, sg) => r * sg),
        lit(0L), (acc, v) => acc + v)
    }
    val dots = (0 until nPlanes).map(dot)
    val bands = (0 until nPlanes / bandSize).map { b =>
      val bkey = (0 until bandSize).map { i =>
        when(dots(b * bandSize + i) > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).cast("long").as("band"), bkey.as("bkey"))
    }
    emb.select($"vec_id", scaled.as("sc"))
      .select($"vec_id", explode(array(bands: _*)).as("bb"))
      .select($"vec_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
  }

  /** Materialized SRP band keys over the corpus `embeddings` table —
    * the shared signature table (see [[graft.MatStore]]) that
    * sim_lsh_topk, sim_recall, and dd_embedding all consume instead of
    * each rebuilding the same projection.
    */
  def bandKeysM(s: SparkSession, dir: String, nPlanes: Int, bandSize: Int): DataFrame =
    graft.MatStore.of(s, s"srp_bk:$nPlanes:$bandSize:$dir")(
      bandKeys(graft.Tables.embeddings(s, dir), nPlanes, bandSize))

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
