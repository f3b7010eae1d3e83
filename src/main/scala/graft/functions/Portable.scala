package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make Spark results bit-identical to a DuckDB oracle.
  *
  * Floating-point SUM/AVG over a shuffled dataset is order-dependent, so a
  * double aggregate can differ in the last ulp between engines (and between
  * runs). We route money-style aggregates through an exact decimal cast:
  * each row is rounded once (deterministically — scale boundaries like .005
  * are not representable in binary, so both engines round identically), the
  * sum is exact integer arithmetic, and the final cast back to double is a
  * single deterministic conversion. This also scales: decimal sums use
  * partial aggregation exactly like double sums.
  *
  * Each Spark helper has a [[PortableSql]] twin that emits the equivalent
  * DuckDB SQL text, used when building `SparkEntry.oracleSql`.
  */
object Portable {

  /** Exact sum of a double expression via decimal(18,scale), as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean of a double expression via decimal sum / count, as double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

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
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,$scale))) AS DOUBLE)"

  def davg(e: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST(($e) AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT(*))"

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
