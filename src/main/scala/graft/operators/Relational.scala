package graft.operators

import graft.Ckpt._
import graft.{QueryDef, Tables}
import graft.functions.{Portable => P, PortableSql => PS}
import org.apache.spark.sql.functions._

/** TPC-H-grade relational core (SURVEY §2e) — the benchmark backbone.
  *
  * Scale notes (SURVEY §5): filters/projections sit directly on the parquet
  * scan (pushdown + pruning); aggregates are partial (map-side combine);
  * dimension tables (region/nation/customer/supplier) stay under the 64 MiB
  * broadcast threshold at any SF so the multi-way joins are broadcast-hash,
  * not shuffle; the one unavoidable big shuffle (orders⋈lineitem) is keyed
  * on the join key and AQE coalesces/skew-splits it at runtime.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary (aggregate over filtered lineitem). */
  val q1 = QueryDef(
    "q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${PS.dsum("l_quantity")} AS sum_qty,
       |  ${PS.dsum("l_extendedprice")} AS sum_base_price,
       |  ${PS.dsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
       |  ${PS.dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |  ${PS.davg("l_quantity")} AS avg_qty,
       |  ${PS.davg("l_extendedprice")} AS avg_price,
       |  ${PS.davg("l_discount", 4)} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // Two-level exact sum: level 1 accumulates the scaled-long row values
    // in LONG buffers per (group, partition) — a long add per row instead
    // of a decimal add (Spark's decimal agg buffer costs ~45ns/row in
    // (de)serialization and overflow checks; measured 2x on this
    // 8-aggregate pass). Level 2 merges the per-partition longs in
    // decimal(38,0), so the 100 TB total still never overflows. A
    // partition's long subtotal is bounded by rows-per-partition
    // (maxPartitionBytes → ~1e6-1e7 rows) x the 1e11 max scaled row
    // value ≈ 1e18 < 2^63 — sized for the target, not the bench. Integer
    // addition is associative, so the result is partition-invariant
    // (the multi-SF and AQE-off gates prove it).
    def sl(c: org.apache.spark.sql.Column, scale: Int) =
      sum(floor(c * math.pow(10, scale) + lit(0.5)).cast("long"))
    val pre = Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus", spark_partition_id().as("pid"))
      .agg(
        sl($"l_quantity", 2).as("q2"),
        sl($"l_extendedprice", 2).as("p2"),
        sl($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("dp4"),
        sl($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).as("ch6"),
        sl($"l_discount", 4).as("d4"),
        P.cnt.as("n"))
    def dec(c: org.apache.spark.sql.Column, scale: Int) =
      sum(c.cast(DecimalType(38, 0))).cast("double") / math.pow(10, scale)
    pre.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dec($"q2", 2).as("sum_qty"),
        dec($"p2", 2).as("sum_base_price"),
        dec($"dp4", 4).as("sum_disc_price"),
        dec($"ch6", 6).as("sum_charge"),
        (dec($"q2", 2) / sum($"n")).as("avg_qty"),
        (dec($"p2", 2) / sum($"n")).as("avg_price"),
        (dec($"d4", 4) / sum($"n")).as("avg_disc"),
        sum($"n").as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3-shaped: top-10 unshipped-revenue orders for one segment. */
  val q3 = QueryDef(
    "q3_top_orders",
    s"""SELECT l_orderkey,
       |  ${PS.dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       |  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    import s.implicits._
    val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, dir).filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
    // No forced broadcast of customer: TPC-H customer SCALES with SF
    // (15B rows at SF100k), so the plan choice is left size-driven —
    // the static planner/AQE broadcasts it at bench SF where it is
    // megabytes and shuffle-joins once it outgrows the threshold.
    // orders⋈lineitem is the real shuffle either way.
    o.join(c, $"c_custkey" === $"o_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(P.dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
      .select($"l_orderkey", $"revenue", $"o_orderdate".cast("date").as("orderdate"), $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-shaped: local-supplier revenue per nation for one region+year. */
  val q5 = QueryDef(
    "q5_region_revenue",
    s"""SELECT n_name,
       |  ${PS.dsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM region
       |JOIN nation ON n_regionkey = r_regionkey
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1999-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    import s.implicits._
    // region is the TPC-H CONSTANT 5-row dim (fixed at every SF), so the
    // r_name filter folds to a literal regionkey pushed into nation's
    // scan — one driver limit-1 collect on a 5-row relation replaces a
    // whole broadcast-exchange stage (r16 verdict item 3; probed at
    // sf0.1: 0.725s → 0.694s min-of-4 warm — this query's wall is fixed
    // overhead, 0.145s lineitem decode + broadcast builds + ~0.13s AQE
    // re-planning rounds, so every removed stage counts).
    val rk = Tables.region(s, dir).filter($"r_name" === "ASIA")
      .select($"r_regionkey".cast("long")).limit(1).as[Long].collect().headOption
    // missing region → empty result with the right schema (the old
    // join-based plan's behavior on degenerate inputs), never a
    // driver-side NoSuchElementException mid-sweep (r17 review)
    val n = rk.map(k => Tables.nation(s, dir).filter($"n_regionkey" === k))
      .getOrElse(Tables.nation(s, dir).filter(lit(false)))
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    // Only the genuinely constant-cardinality dim (nation ≤ 25 rows) is
    // force-broadcast. customer and supplier SCALE with SF, so their
    // joins are left size-driven: AQE broadcasts the region-filtered
    // customer side and supplier at bench SF (both are megabytes) and
    // falls back to shuffle joins once they outgrow the threshold — the
    // 100 TB plan. The fact-fact join (orders⋈lineitem) shuffles once
    // on the order key either way.
    o.join(c.join(broadcast(n), $"c_nationkey" === $"n_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(l, $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(P.dsum($"l_extendedprice" * (lit(1) - $"l_discount"), 4).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Per-customer order ranking (window function), top-3 per customer. */
  val qWindowRank = QueryDef(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).cast("long").as("rnk"))
      .filter($"rnk" <= 3)
  }

  /** As-of join — for each purchase event, the latest prior (ts ≤) view
    * event of the same user, with the gap in microseconds. Spark has no
    * native ASOF JOIN; the scalable re-expression is the union-marker +
    * running `last(ignoreNulls)` window: ONE shuffle on the join key and a
    * per-partition sort, versus a per-row point lookup (driver loop) or an
    * exploding range join. Ties at the same timestamp: the view sorts
    * before the purchase (inclusive as-of) and the max view event_id wins
    * — both deterministic, mirrored in the oracle's window ORDER BY.
    * At 100 TB this is the standard time-series enrichment shape: state is
    * one running value per partition, and AQE splits skewed users.
    */
  val qAsofJoin = QueryDef(
    "q_asof_join",
    s"""WITH ${PS.evCte},
       |u AS MATERIALIZED (
       |  SELECT user_id, ts AS t, 1 AS is_view, event_id AS v_id,
       |    CAST(NULL AS BIGINT) AS p_id FROM ev WHERE event_type = 'view'
       |  UNION ALL
       |  SELECT user_id, ts, 0, CAST(NULL AS BIGINT), event_id
       |  FROM ev WHERE event_type = 'purchase'),
       |m AS MATERIALIZED (
       |  SELECT user_id, t, is_view, p_id,
       |    last_value(v_id IGNORE NULLS) OVER w AS asof_view_id,
       |    last_value(CASE WHEN is_view = 1 THEN t END IGNORE NULLS) OVER w AS asof_view_ts
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id
       |    ORDER BY t, is_view DESC, COALESCE(v_id, p_id)
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT p_id AS event_id, user_id, t AS ts, asof_view_id, asof_view_ts,
       |  epoch_us(t) - epoch_us(asof_view_ts) AS gap_us
       |FROM m WHERE is_view = 0""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select($"event_id", $"user_id", $"ts", $"event_type")
    val v = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("t"), lit(1).as("is_view"),
        $"event_id".as("v_id"), lit(null).cast("long").as("p_id"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("t"), lit(0).as("is_view"),
        lit(null).cast("long").as("v_id"), $"event_id".as("p_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"t", $"is_view".desc, coalesce($"v_id", $"p_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.union(p)
      .select($"user_id", $"t", $"is_view", $"p_id",
        last($"v_id", ignoreNulls = true).over(w).as("asof_view_id"),
        last(when($"is_view" === 1, $"t"), ignoreNulls = true).over(w).as("asof_view_ts"))
      .filter($"is_view" === 0)
      .select($"p_id".as("event_id"), $"user_id", $"t".as("ts"),
        $"asof_view_id", $"asof_view_ts",
        (unix_micros($"t") - unix_micros($"asof_view_ts")).as("gap_us"))
  }

  /** Multi-level rollup aggregate (returnflag × linestatus). */
  val qRollup = QueryDef(
    "q_rollup",
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  ${PS.dsum("l_quantity")} AS sum_qty,
       |  ${PS.dsum("l_extendedprice")} AS sum_price,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // Pre-aggregate the finest level BEFORE the rollup: Spark plans
    // ROLLUP as Expand(x3 grouping sets) ahead of the partial aggregate,
    // so a direct rollup pushes 3x the fact rows through the map side.
    // The pre-aggregation uses q1's two-level scaled-long shape (LONG
    // buffers per (group, partition), decimal only at the merge), and
    // the rollup then runs over |groups x partitions| rows — the shape
    // that survives a 100 TB fact table.
    val base = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus", spark_partition_id().as("pid"))
      .agg(
        sum(floor($"l_quantity" * 100 + lit(0.5)).cast("long")).cast(DecimalType(38, 0)).as("sq"),
        sum(floor($"l_extendedprice" * 100 + lit(0.5)).cast("long")).cast(DecimalType(38, 0)).as("sp"),
        P.cnt.as("pn"))
    base.rollup($"l_returnflag", $"l_linestatus")
      .agg(
        (sum($"sq").cast("double") / 100).as("sum_qty"),
        (sum($"sp").cast("double") / 100).as("sum_price"),
        sum($"pn").as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"sum_price", $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  /** Bloom filter geometry: M positions, k salted hashes, B=62 usable
    * bits per BIGINT word (bit 63 would overflow DuckDB's checked `<<`;
    * 62 keeps every mask positive in both engines). ~67 words total —
    * constant size at any corpus scale. With |P| purchasers the expected
    * false-positive rate is (1 − e^(−k|P|/M))^k; M is the knob a
    * deployment sizes as ~10·|build| bits.
    */
  private val BloomM = 4096L
  private val BloomK = 3
  private val BloomB = 62L

  /** The r-th salted bloom position of `u` — md5-derived, so both
    * engines compute the identical bit layout (the an_cm_topk hashing
    * posture).
    */
  private def bpos(u: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    P.hexToLong(md5(concat(r.cast("string"), lit(":"), u.cast("string"))), 1, 15) % BloomM

  private def bposSql(u: String, r: String) =
    s"(${PS.hexToLong(s"md5(CAST($r AS VARCHAR) || ':' || CAST($u AS VARCHAR))", 1, 15)} % $BloomM)"

  /** Runtime bloom-filter semi-join pruning, with the exact semi-join
    * alongside as the eval pair (the honest-eval posture of
    * an_hll_users): "viewers who ever made a high-value purchase" is a semi-join of the
    * view side against the purchaser set; the bloom path compresses the
    * purchaser set into a CONSTANT-size bitmap (one bit_or aggregate
    * with map-side partials — purchaser ids never shuffle), broadcasts
    * it, and filters the probe side in place. This is the engine-level
    * pattern behind Spark's runtime bloom-filter join pruning and
    * DPP-style semi-join pushdown: at 100 TB the probe scan drops
    * non-matching rows BEFORE the join shuffle, paying ~67 broadcast
    * longs instead of a |purchasers|-row exchange per probe partition.
    *
    * The report quantifies the trade: no false negatives by
    * construction (n_missed is structurally 0 — a member's bits are all
    * set), and the measured false-positive rate is the extra join input
    * the prune lets through. Every count is an integer and the bit
    * layout is md5-derived, so the sketch itself hash-matches across
    * engines.
    */
  val qBloomPrune = QueryDef(
    "q_bloom_prune",
    s"""WITH ${PS.evCte},
       |pur AS MATERIALIZED (SELECT DISTINCT user_id FROM ev
       |  WHERE event_type = 'purchase' AND value > 150),
       |vw AS MATERIALIZED (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
       |bp AS MATERIALIZED (SELECT ${bposSql("user_id", "r")} AS p
       |  FROM pur CROSS JOIN range($BloomK) t(r)),
       |bloom AS MATERIALIZED (SELECT p // $BloomB AS w,
       |    bit_or(CAST(1 AS BIGINT) << CAST(p % $BloomB AS INT)) AS bits
       |  FROM bp GROUP BY 1),
       |vp AS MATERIALIZED (SELECT user_id, ${bposSql("user_id", "r")} AS p
       |  FROM vw CROSS JOIN range($BloomK) t(r)),
       |hit AS MATERIALIZED (SELECT v.user_id,
       |    CASE WHEN (COALESCE(b.bits, 0) & (CAST(1 AS BIGINT) << CAST(v.p % $BloomB AS INT))) <> 0
       |      THEN 1 ELSE 0 END AS ok
       |  FROM vp v LEFT JOIN bloom b ON b.w = v.p // $BloomB),
       |pass AS MATERIALIZED (SELECT user_id, MIN(ok) AS pass FROM hit GROUP BY 1),
       |tj AS MATERIALIZED (SELECT v.user_id, CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS isp
       |  FROM vw v LEFT JOIN pur p ON p.user_id = v.user_id),
       |j AS MATERIALIZED (SELECT t.isp, s.pass FROM tj t JOIN pass s ON s.user_id = t.user_id)
       |SELECT CAST((SELECT COUNT(*) FROM vw) AS BIGINT) AS n_viewers,
       |  CAST((SELECT COUNT(*) FROM pur) AS BIGINT) AS n_purchasers,
       |  CAST(SUM(pass) AS BIGINT) AS n_bloom_pass,
       |  CAST(SUM(isp) AS BIGINT) AS n_true,
       |  CAST(SUM(CASE WHEN pass = 1 AND isp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |  CAST(SUM(CASE WHEN pass = 0 AND isp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
       |  ${PS.prnd("CASE WHEN COUNT(*) = SUM(isp) THEN 0.0 ELSE CAST(SUM(CASE WHEN pass = 1 AND isp = 0 THEN 1 ELSE 0 END) AS DOUBLE) / (COUNT(*) - SUM(isp)) END", 6)} AS fp_rate,
       |  ${PS.prnd("1.0 - CAST(SUM(pass) AS DOUBLE) / COUNT(*)", 6)} AS pruned_frac
       |FROM j""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pur = Tables.events(s, dir)
      .filter($"event_type" === "purchase" && $"value" > 150)
      .select($"user_id").distinct()
    val vw = Tables.events(s, dir).filter($"event_type" === "view")
      .select($"user_id").distinct()
    val bloom = pur
      .select(explode(sequence(lit(0), lit(BloomK - 1))).as("r"), $"user_id")
      .select(bpos($"user_id", $"r").as("p"))
      .groupBy(expr(s"p div $BloomB").as("w"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % $BloomB AS INT)))").as("bits"))
    val vp = vw
      .select($"user_id", explode(sequence(lit(0), lit(BloomK - 1))).as("r"))
      .select($"user_id", bpos($"user_id", $"r").as("p"))
    // the bitmap is CONSTANT-size: always broadcast, never a shuffle
    val hit = vp.join(broadcast(bloom), expr(s"w = p div $BloomB"), "left")
      .select($"user_id",
        when((coalesce($"bits", lit(0L))
          .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $BloomB AS INT))"))) =!= 0L,
          1L).otherwise(0L).as("ok"))
    val pass = hit.groupBy($"user_id").agg(min($"ok").as("pass"))
    // exact semi-join truth — the eval side the bloom path avoids
    val tj = vw.join(pur.withColumnRenamed("user_id", "p_uid"),
        $"user_id" === $"p_uid", "left")
      .select($"user_id", when($"p_uid".isNull, 0L).otherwise(1L).as("isp"))
    val nv = vw.agg(P.cnt.as("n_viewers"))
    val np = pur.agg(P.cnt.as("n_purchasers"))
    tj.join(pass, "user_id")
      .agg(
        sum($"pass").as("n_bloom_pass"),
        sum($"isp").as("n_true"),
        sum(when($"pass" === 1 && $"isp" === 0, 1L).otherwise(0L)).as("n_false_pos"),
        sum(when($"pass" === 0 && $"isp" === 1, 1L).otherwise(0L)).as("n_missed"),
        P.prnd(when(count(lit(1)) === sum($"isp"), 0.0)
          .otherwise(sum(when($"pass" === 1 && $"isp" === 0, 1L).otherwise(0L)).cast("double")
            / (count(lit(1)) - sum($"isp"))), 6).as("fp_rate"),
        P.prnd(lit(1.0) - sum($"pass").cast("double") / count(lit(1)), 6).as("pruned_frac"))
      .crossJoin(broadcast(nv)).crossJoin(broadcast(np))
      .select($"n_viewers", $"n_purchasers", $"n_bloom_pass", $"n_true",
        $"n_false_pos", $"n_missed", $"fp_rate", $"pruned_frac")
  }

  /** TPC-H Q22-shaped anti-join: customers with above-average account
    * balance and NO orders in the window, counted per market segment —
    * the NOT EXISTS pattern every warehouse runs (dormant/churned-entity
    * reports). The plan is the scalable shape: a LEFT ANTI hash join
    * keyed on custkey (never a per-customer correlated probe — at 100 TB
    * the anti join shuffles both sides once and streams), with the
    * average-balance scalar as a 1-row broadcast.
    */
  val qAntiJoin = QueryDef(
    "q_anti_join",
    s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_dormant,
       |  ${PS.dsum("c_acctbal")} AS total_balance
       |FROM customer
       |WHERE c_acctbal > (SELECT ${PS.davg("c_acctbal")} FROM customer)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '1998-01-01')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    import s.implicits._
    val c = Tables.customer(s, dir)
    val avgBal = Tables.customer(s, dir).agg(P.davg($"c_acctbal").as("ab"))
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(P.cnt.as("n_dormant"), P.dsum($"c_acctbal").as("total_balance"))
      .orderBy($"c_mktsegment")
  }

  /** Point-in-time (temporal) feature lookup — enrich every view event
    * with the user's tier AS OF that instant, where tiers come from the
    * SCD2 change stream (`Etl.tierChanges`, shared with etl_scd2 so the
    * lookup and the dimension are one history). This is the
    * feature-store join that keeps training data leakage-free: a naive
    * "current tier" join leaks the FUTURE into past examples, the
    * classic offline/online skew bug. Re-expression is the q_asof_join
    * shape — union-marker + running last(ignoreNulls) window. TWO
    * user-keyed exchanges total (one inside the shared change-detection
    * window, one for the union lookup window — the probes enter
    * unpartitioned, so the second is unavoidable without co-partitioned
    * storage), per-partition state is one running value; never a
    * per-probe interval scan or an exploding range join against the
    * validity table. Ties at the same timestamp: the change sorts
    * before the probe (a view at the purchase instant sees the new
    * tier), multiple same-ts changes resolve by event_id — both
    * deterministic and mirrored in the oracle. Views before any
    * purchase keep NULL tier (no history yet — the honest answer).
    */
  val qPointInTime = QueryDef(
    "q_point_in_time",
    s"""WITH ${PS.evCte},
       |${graft.operators.Etl.scdChangeSql},
       |pv AS MATERIALIZED (SELECT user_id, ts, event_id FROM ev
       |  WHERE event_type = 'view'),
       |u AS MATERIALIZED (
       |  SELECT user_id, ts, 1 AS is_chg, event_id AS mid, tier,
       |    CAST(NULL AS BIGINT) AS probe_id FROM sc
       |  UNION ALL
       |  SELECT user_id, ts, 0, event_id, CAST(NULL AS VARCHAR), event_id FROM pv),
       |m AS MATERIALIZED (SELECT user_id, ts, is_chg, probe_id,
       |    last_value(tier IGNORE NULLS) OVER w AS tier,
       |    last_value(CASE WHEN is_chg = 1 THEN ts END IGNORE NULLS) OVER w AS tier_since
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_chg DESC, mid
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT probe_id AS event_id, user_id, ts, tier, tier_since
       |FROM m WHERE is_chg = 0""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sc = graft.operators.Etl.tierChanges(s, dir)
    val pv = Tables.events(s, dir).filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id")
    val chg = sc.select($"user_id", $"ts", lit(1).as("is_chg"),
      $"event_id".as("mid"), $"tier", lit(null).cast("long").as("probe_id"))
    val prb = pv.select($"user_id", $"ts", lit(0).as("is_chg"),
      $"event_id".as("mid"), lit(null).cast("string").as("tier"),
      $"event_id".as("probe_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_chg".desc, $"mid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg.union(prb)
      .select($"user_id", $"ts", $"is_chg", $"probe_id",
        last($"tier", ignoreNulls = true).over(w).as("tier"),
        last(when($"is_chg" === 1, $"ts"), ignoreNulls = true).over(w).as("tier_since"))
      .filter($"is_chg" === 0)
      .select($"probe_id".as("event_id"), $"user_id", $"ts", $"tier", $"tier_since")
  }

  /** Pre-join skew audit — the top-20 heaviest join keys of the
    * orders⋈lineitem fact join by OUTPUT cardinality (n_l·n_o), with each
    * key's share of the total join output. The report a data engineer
    * runs BEFORE a big join ships: one hot key producing 10% of the
    * output is the thing AQE's skew-split will have to save you from,
    * and better to know at design time (salt, pre-aggregate, or filter).
    * Two keyed count aggregates (map-side partials), a keyed join of the
    * two count relations (key-cardinality-sized, far smaller than the
    * facts), a 1-row total broadcast, and a TakeOrderedAndProject —
    * the audit never touches fact-row pairs, only per-key COUNTS, so it
    * costs a fraction of the join it derisks at any scale.
    */
  val qSkewAudit = QueryDef(
    "q_skew_audit",
    s"""WITH lc AS MATERIALIZED (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n_l
       |  FROM lineitem GROUP BY 1),
       |oc AS MATERIALIZED (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n_o
       |  FROM orders GROUP BY 1),
       |j AS MATERIALIZED (SELECT lc.k AS k, n_l, n_o, n_l * n_o AS out_rows
       |  FROM lc JOIN oc ON lc.k = oc.k),
       |t AS MATERIALIZED (SELECT SUM(out_rows) AS tot FROM j)
       |SELECT k, n_l, n_o, out_rows,
       |  ${PS.prnd("CAST(out_rows AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)", 6)} AS out_share
       |FROM j ORDER BY out_rows DESC, k LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val lc = Tables.lineitem(s, dir).groupBy($"l_orderkey".as("k")).agg(P.cnt.as("n_l"))
    val oc = Tables.orders(s, dir).groupBy($"o_orderkey".as("k")).agg(P.cnt.as("n_o"))
    // j feeds BOTH the grand total and the final projection — without a
    // barrier the two aggregates + join re-execute per consumer (the
    // r11 recompute defect class); per-key counts are bounded by the
    // distinct-key count, so the checkpoint is the cheap side
    val j = lc.join(oc, "k")
      .select($"k", $"n_l", $"n_o", ($"n_l" * $"n_o").as("out_rows"))
      .ckpt
    val t = j.agg(sum($"out_rows".cast(DecimalType(38, 0))).as("tot"))
    j.crossJoin(broadcast(t))
      .select($"k", $"n_l", $"n_o", $"out_rows",
        P.prnd($"out_rows".cast("double") / $"tot".cast("double"), 6).as("out_share"))
      .orderBy($"out_rows".desc, $"k").limit(20)
  }

  /** Band width (= bin width) of the range join, in microseconds. */
  private val BandUs = 3600L * 1000000L

  /** Time-band (range) join — for each purchase event, the count and
    * exact value mass of ALL view events (any user) in the preceding
    * hour; the demand-attribution / lead-window shape every
    * event-analytics stack runs. Spark plans a pure inequality join as
    * BroadcastNestedLoopJoin (O(|P|·|V|) comparisons with one side fully
    * materialized per task — a non-starter at 100 TB), so the scalable
    * re-expression is BIN DECOMPOSITION: both sides key by
    * floor(ts / band), each probe row explodes into exactly 2 bins
    * (band = bin width, so a candidate lives in the probe's bin or the
    * one before), the join is a plain keyed equi-join shuffle, and the
    * residual inequality filters the ~2·band-density candidates per
    * probe. Cost is linear in |P| + |V| + |matches|, bins inherit
    * calendar locality (a day's work touches a day's bins), and a hot
    * bin (traffic spike) is an AQE skew-split, not a planning cliff.
    * The value mass goes through the scaled-long exact-sum path so the
    * band aggregate hash-matches bit-for-bit.
    */
  val qRangeJoin = QueryDef(
    "q_range_join",
    s"""WITH ${PS.evCte},
       |p AS MATERIALIZED (SELECT event_id, epoch_us(ts) AS pus FROM ev
       |  WHERE event_type = 'purchase'),
       |v AS MATERIALIZED (SELECT epoch_us(ts) AS vus, value FROM ev
       |  WHERE event_type = 'view')
       |SELECT p.event_id, CAST(COUNT(v.vus) AS BIGINT) AS n_views_1h,
       |  COALESCE(${PS.dsum("v.value")}, 0.0) AS views_value
       |FROM p LEFT JOIN v
       |  ON v.vus >= p.pus - $BandUs AND v.vus < p.pus
       |GROUP BY p.event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts").as("pus"))
    val v = ev.filter($"event_type" === "view")
      .select(unix_micros($"ts").as("vus"), $"value")
      .withColumn("bin", expr(s"vus div $BandUs"))
    // band ⊆ [bin-1, bin]: vus ≥ pus − Band ⇒ vbin ≥ pbin − 1, and
    // vus < pus ⇒ vbin ≤ pbin — so 2 probe bins cover every candidate,
    // and the two bins differ, so no candidate is matched twice.
    // Bin arithmetic assumes non-negative epoch micros (post-1970):
    // Spark's `div` truncates toward zero while DuckDB's `//` floors,
    // so pre-epoch timestamps would bin differently per engine — shift
    // the epoch before binning if that domain ever appears.
    val probes = p.select($"event_id", $"pus",
      explode(array(expr(s"pus div $BandUs"), expr(s"pus div $BandUs - 1"))).as("bin"))
    val matched = probes.join(v, Seq("bin"))
      .filter($"vus" >= $"pus" - BandUs && $"vus" < $"pus")
      .groupBy($"event_id")
      .agg(P.cnt.as("n"), P.dsum($"value").as("vv"))
    // purchases with an empty band re-enter through the left join (the
    // oracle's LEFT JOIN zeros); event_id-keyed, size-driven plan choice
    p.join(matched, Seq("event_id"), "left")
      .select($"event_id",
        coalesce($"n", lit(0L)).as("n_views_1h"),
        coalesce($"vv", lit(0.0)).as("views_value"))
  }

  val defs: Seq[QueryDef] = Seq(q1, q3, q5, qWindowRank, qAsofJoin, qRollup,
    qBloomPrune, qAntiJoin, qRangeJoin, qPointInTime, qSkewAudit)
}
