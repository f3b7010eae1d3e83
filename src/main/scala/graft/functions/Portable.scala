package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make Spark results bit-identical to a DuckDB oracle.
  *
  * Floating-point SUM/AVG over a shuffled dataset is order-dependent, so a
  * double aggregate can differ in the last ulp between engines (and between
  * runs). We route money-style aggregates through an exact fixed-point
  * path: each row is scaled and floor-rounded once (`floor(x·10^s + 0.5)`
  * — the same IEEE multiply/add/floor on both engines, so identical
  * longs), the sum is exact integer arithmetic, and the final divide back
  * to double is a single correctly-rounded conversion. This also scales:
  * the integer sums use partial aggregation exactly like double sums.
  *
  * The per-row rounding is deliberately LONG arithmetic, not a
  * double→decimal cast: `CAST(double AS DECIMAL)` allocates a BigDecimal
  * per row (Decimal.fromDouble → BigDecimal.valueOf().setScale), which
  * measured 3.4x slower end-to-end on q1's 8-aggregate pass (1.02s vs
  * 0.30s at sf0.1 under noop forcing). The row value ×10^s must fit a
  * long (≤ 9.2e18 — prices at scale 6 are ~1e11, centralities at scale
  * 12 are ~1e12; all fine); the SUM then runs as decimal(38,0) so the
  * accumulator never overflows at 100 TB row counts (DuckDB's
  * SUM(BIGINT) is already HUGEINT).
  *
  * Each Spark helper has a [[PortableSql]] twin that emits the equivalent
  * DuckDB SQL text, used when building `SparkEntry.oracleSql`.
  */
object Portable {

  /** Exact sum of a double expression via scaled-long rounding and a
    * decimal(38,0) accumulator, as double.
    */
  def dsum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    // the long hop matters: double→decimal casts through
    // BigDecimal.valueOf(double).setScale (two allocations per row),
    // while long→decimal(38,0) takes Decimal's compact-long constructor
    // and the sum's add stays on the compact fast path (measured ~2.4x
    // on q1's 8-aggregate pass at sf0.1)
    sum(floor(c * f + lit(0.5)).cast("long").cast(DecimalType(38, 0))).cast("double") / f
  }

  /** Exact mean of a double expression: [[dsum]] / count. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** count(*) as long (DuckDB COUNT is BIGINT already). */
  def cnt: Column = count(lit(1))

  /** Portable round-half-up: floor(x·10^d + 0.5)/10^d. Spark's round()
    * (BigDecimal HALF_UP over the shortest decimal representation) and
    * DuckDB's round() (scaled multiply) disagree on values whose decimal
    * expansion terminates in an exact 5 at the rounded digit; this
    * formulation is the same IEEE multiply/add/floor/divide on both
    * engines, so results are bit-identical.
    */
  def prnd(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + lit(0.5)) / f
  }

  /** Parse `width` hex chars of `c` starting at 1-based `pos` into a long.
    * ONE codegen'd conv(_, 16, 10) instead of the earlier per-char
    * instr+substring chain (15 string probes per row on the simhash
    * path); identical semantics in DuckDB via [[PortableSql.hexToLong]].
    * Used for md5-derived integers (simhash, LSH planes, bucket ids) so
    * oracle SQL can reproduce them exactly.
    */
  def hexToLong(c: Column, pos: Int, width: Int): Column = {
    require(width >= 1 && width <= 15, "fits in a positive long")
    conv(substring(c, pos, width), 16, 10).cast("long")
  }
}

/** DuckDB SQL text twins of [[Portable]]. */
object PortableSql {
  def dsum(e: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST(floor(($e) * 1e$scale + 0.5) AS BIGINT)) AS DOUBLE) / 1e$scale)"

  def davg(e: String, scale: Int = 2): String =
    s"(${dsum(e, scale)} / COUNT(*))"

  /** DuckDB twin of [[Portable.prnd]]. */
  def prnd(e: String, digits: Int): String =
    s"(floor(($e) * 1e$digits + 0.5) / 1e$digits)"

  /** CTE exposing events with ts truncated to a micros TIMESTAMP — the
    * DuckDB-side twin of [[graft.Tables.events]]'s nanos→micros read. Use
    * as `WITH $evCte SELECT ... FROM ev`.
    */
  val evCte: String =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** DuckDB twin of [[Portable.hexToLong]] (1-based pos, width hex chars). */
  def hexToLong(e: String, pos: Int, width: Int): String =
    (0 until width).map { i =>
      s"(CAST(strpos('0123456789abcdef', substr($e, ${pos + i}, 1)) AS BIGINT) - 1) * ${1L << (4 * (width - 1 - i))}"
    }.mkString("(", " + ", ")")
}
