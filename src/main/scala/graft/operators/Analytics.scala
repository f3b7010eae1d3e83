package graft.operators

import graft.Ckpt._
import graft.{QueryDef, Tables}
import graft.functions.{Portable => P, PortableSql => PS}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard analytics (SURVEY §2b) — the reference's primary user surface
  * (reference: dashboard/dashboard.py:256-287,823-1085).
  *
  * Scale notes: every query here is a single hash aggregation over a
  * filtered scan with low-cardinality group keys (days / groups / buckets /
  * users) — partial aggregation shrinks the shuffle to the key cardinality,
  * so these scale linearly with input at any SF. Quantiles use exact
  * `percentile` at oracle SF; at 100 TB the documented switch is
  * `percentile_approx` (same plan shape, bounded-memory sketch).
  */
object Analytics {

  /** Events per day + daily value (posts-per-day timeline). */
  val timeline = QueryDef(
    "an_timeline",
    s"""WITH ${PS.evCte}
       |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
       |  ${PS.dsum("value")} AS sum_value
       |FROM ev GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"ts".cast("date").as("day"))
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .orderBy($"day")
  }

  /** Zero-filled (dense) daily timeline of a SPARSE event class —
    * high-value purchases per day over the full observed calendar. A
    * groupBy timeline silently drops empty days, which a dashboard axis
    * (and any day-over-day delta / anomaly rule downstream) cannot
    * tolerate: a missing day reads as "no data", not "zero". The dense
    * calendar derives from a 1-row min/max aggregate exploded with
    * `sequence` — the relation is bounded by ELAPSED TIME (≤ tens of
    * thousands of rows for decades), not by data volume, so the
    * backfill join is day-keyed against a constant-ish side at any
    * corpus scale; the per-day aggregate is the only data-scale work
    * (one hash agg, map-side partials).
    */
  val timelineDense = QueryDef(
    "an_timeline_dense",
    s"""WITH ${PS.evCte},
       |b AS MATERIALIZED (SELECT min(CAST(ts AS DATE)) AS d0,
       |  max(CAST(ts AS DATE)) AS d1 FROM ev),
       |cal AS MATERIALIZED (SELECT CAST(unnest(generate_series(
       |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b),
       |c AS MATERIALIZED (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
       |    ${PS.dsum("value")} AS sv
       |  FROM ev WHERE event_type = 'purchase' AND value > 180 GROUP BY 1)
       |SELECT cal.day AS day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_high,
       |  COALESCE(c.sv, 0.0) AS sum_value
       |FROM cal LEFT JOIN c ON c.day = cal.day
       |ORDER BY cal.day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val cal = ev
      .agg(min($"ts".cast("date")).as("d0"), max($"ts".cast("date")).as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val c = ev.filter($"event_type" === "purchase" && $"value" > 180)
      .groupBy($"ts".cast("date").as("day"))
      .agg(P.cnt.as("n"), P.dsum($"value").as("sv"))
    cal.join(c, Seq("day"), "left")
      .select($"day", coalesce($"n", lit(0L)).as("n_high"),
        coalesce($"sv", lit(0.0)).as("sum_value"))
      .orderBy($"day")
  }

  /** Daily active users split into NEW vs RETURNING — the acquisition/
    * retention headline every dashboard pairs with the timeline. One
    * (user, day) dedup aggregate, then the user's first-seen day as a
    * whole-partition window min (WindowExec sorts by user_id only — no
    * (user, ts) sort) riding the user-keyed exchange, then a day-keyed
    * rollup. Every relation is user- or day-cardinality and every join/
    * window key is the partitioning key — nothing broadcast, nothing
    * quadratic; AQE splits skewed users.
    */
  val newVsReturning = QueryDef(
    "an_new_vs_returning",
    s"""WITH ${PS.evCte},
       |d AS MATERIALIZED (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
       |m AS MATERIALIZED (SELECT day,
       |    min(day) OVER (PARTITION BY user_id) AS first_day FROM d)
       |SELECT day, CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |  CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
       |FROM m GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.events(s, dir)
      .select($"user_id", $"ts".cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id")
    d.withColumn("first_day", min($"day").over(w))
      .groupBy($"day")
      .agg(sum(when($"day" === $"first_day", 1L).otherwise(0L)).as("n_new"),
        sum(when($"day" > $"first_day", 1L).otherwise(0L)).as("n_returning"))
      .orderBy($"day")
  }

  /** Top-8 sources by document count (top-subreddits analog). */
  val topGroups = QueryDef(
    "an_top_groups",
    """SELECT source, COUNT(*) AS n FROM documents
      |GROUP BY source ORDER BY n DESC, source LIMIT 8""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source").agg(P.cnt.as("n"))
      .orderBy($"n".desc, $"source").limit(8)
  }

  /** Day-of-week activity histogram (1=Sunday..7, Spark convention). */
  val dowActivity = QueryDef(
    "an_dow_activity",
    s"""WITH ${PS.evCte}
       |SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, COUNT(*) AS n,
       |  ${PS.dsum("value")} AS sum_value
       |FROM ev GROUP BY 1 ORDER BY dow""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(dayofweek($"ts").cast("long").as("dow"))
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .orderBy($"dow")
  }

  /** Longest consecutive-day activity streak per user (gaps-and-islands)
    * — the engagement metric behind streak badges and churn-risk rules.
    * The islands trick: within a user, `day − row_number(day)` is
    * constant exactly along a consecutive run, so streaks fall out of
    * ONE user-keyed window plus two aggregates that reuse the window's
    * partitioning — no self-join, no per-user iteration, per-key state
    * bounded by the user's own active days. Both engines compute the
    * same integer date arithmetic, so the output is bit-portable.
    */
  val activeStreaks = QueryDef(
    "an_active_streaks",
    s"""WITH ${PS.evCte},
       |d AS MATERIALIZED (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
       |r AS MATERIALIZED (SELECT user_id, day,
       |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS rn
       |  FROM d),
       |i AS MATERIALIZED (SELECT user_id, day - CAST(rn AS INT) AS grp,
       |    CAST(COUNT(*) AS BIGINT) AS len
       |  FROM r GROUP BY 1, 2)
       |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       |  CAST(MAX(len) AS BIGINT) AS max_streak
       |FROM i GROUP BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"day")
    Tables.events(s, dir)
      .select($"user_id", $"ts".cast("date").as("day")).distinct()
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy($"user_id", date_sub($"day", $"rn".cast("int")).as("grp"))
      .agg(P.cnt.as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"), max($"len").as("max_streak"))
  }

  /** Inter-event gap distribution per user — the histogram that JUSTIFIES
    * the sessionization threshold (etl_sessionize's 30-min gap is a knob;
    * this is the data it should be read off of: a bimodal gap
    * distribution separates within-session activity from between-visit
    * silence, and the valley is the right cutoff). One user-keyed
    * exchange (lag window — the same partitioning the session chain
    * uses), then a CASE over DECLARED gap buckets into a bounded
    * histogram; never a global sort, never per-user state beyond the one
    * running lag value.
    */
  val eventGapDist = QueryDef(
    "an_event_gap_dist",
    s"""WITH ${PS.evCte},
       |g AS MATERIALIZED (SELECT
       |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS gap_us
       |  FROM ev),
       |b AS MATERIALIZED (SELECT CASE
       |    WHEN gap_us < 60000000 THEN 'a_lt_1m'
       |    WHEN gap_us < 300000000 THEN 'b_1_5m'
       |    WHEN gap_us < 1800000000 THEN 'c_5_30m'
       |    WHEN gap_us < 7200000000 THEN 'd_30m_2h'
       |    ELSE 'e_gt_2h' END AS bucket,
       |    gap_us
       |  FROM g WHERE gap_us IS NOT NULL)
       |SELECT bucket, COUNT(*) AS n,
       |  CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val g = Tables.events(s, dir)
      .select((unix_micros($"ts")
        - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"))
      .filter($"gap_us".isNotNull)
    g.select(
        when($"gap_us" < 60000000L, "a_lt_1m")
          .when($"gap_us" < 300000000L, "b_1_5m")
          .when($"gap_us" < 1800000000L, "c_5_30m")
          .when($"gap_us" < 7200000000L, "d_30m_2h")
          .otherwise("e_gt_2h").as("bucket"),
        $"gap_us")
      .groupBy($"bucket")
      .agg(P.cnt.as("n"), min($"gap_us").as("min_gap_us"),
        max($"gap_us").as("max_gap_us"))
      .orderBy($"bucket")
  }

  /** Day-of-week × hour activity heatmap — the traffic-rhythm panel next
    * to the reference's day-of-week histogram. One hash aggregate to a
    * 7×24-bounded matrix; scan-bound at any SF.
    */
  val hourlyHeatmap = QueryDef(
    "an_hourly_heatmap",
    s"""WITH ${PS.evCte}
       |SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       |  CAST(hour(ts) AS BIGINT) AS hour, COUNT(*) AS n,
       |  ${PS.dsum("value")} AS sum_value
       |FROM ev GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(dayofweek($"ts").cast("long").as("dow"),
        hour($"ts").cast("long").as("hour"))
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .orderBy($"dow", $"hour")
  }

  /** Value-bucket distribution (reference score categories >100/50/10/<10). */
  val valueBuckets = QueryDef(
    "an_value_buckets",
    s"""WITH ${PS.evCte}
       |SELECT CASE WHEN value > 100 THEN 'viral'
       |  WHEN value > 50 THEN 'popular'
       |  WHEN value > 10 THEN 'average' ELSE 'low' END AS bucket,
       |  COUNT(*) AS n, ${PS.dsum("value")} AS sum_value
       |FROM ev GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(
        when($"value" > 100, "viral")
          .when($"value" > 50, "popular")
          .when($"value" > 10, "average")
          .otherwise("low").as("bucket"))
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .orderBy($"bucket")
  }

  /** Per-user engagement-count histogram — the dashboard's second bucket
    * panel (comment-count buckets rendered next to the score buckets,
    * reference: dashboard/dashboard.py:823-918): users bucketed by how
    * many events they produced. Two partial aggregations (per-user count,
    * then a CASE-bucket rollup over |users| rows) — scan-bound at any SF.
    */
  val commentBuckets = QueryDef(
    "an_comment_buckets",
    s"""WITH ${PS.evCte},
       |uc AS MATERIALIZED (SELECT user_id, COUNT(*) AS n_events FROM ev GROUP BY user_id)
       |SELECT CASE WHEN n_events > 100 THEN 'power'
       |  WHEN n_events > 50 THEN 'heavy'
       |  WHEN n_events > 10 THEN 'regular' ELSE 'casual' END AS bucket,
       |  COUNT(*) AS n_users,
       |  CAST(SUM(n_events) AS BIGINT) AS total_events
       |FROM uc GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id").agg(P.cnt.as("n_events"))
      .groupBy(
        when($"n_events" > 100, "power")
          .when($"n_events" > 50, "heavy")
          .when($"n_events" > 10, "regular")
          .otherwise("casual").as("bucket"))
      .agg(P.cnt.as("n_users"), sum($"n_events").as("total_events"))
      .orderBy($"bucket")
  }

  /** Exact p25/p50/p75/p90 of value per event_type (quantile insights). */
  val quantiles = QueryDef(
    "an_quantiles",
    s"""WITH ${PS.evCte}
       |SELECT event_type,
       |  ${PS.prnd("quantile_cont(value, 0.25)", 6)} AS p25,
      |  ${PS.prnd("quantile_cont(value, 0.50)", 6)} AS p50,
      |  ${PS.prnd("quantile_cont(value, 0.75)", 6)} AS p75,
      |  ${PS.prnd("quantile_cont(value, 0.90)", 6)} AS p90
      |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.9D))").as("ps"))
      .select($"event_type",
        P.prnd($"ps".getItem(0), 6).as("p25"),
        P.prnd($"ps".getItem(1), 6).as("p50"),
        P.prnd($"ps".getItem(2), 6).as("p75"),
        P.prnd($"ps".getItem(3), 6).as("p90"))
      .orderBy($"event_type")
  }

  private val Keywords = Seq("spark", "join", "merge", "stream", "vector")

  /** Total occurrence count per keyword over documents.text (country
    * keyword mentions, dashboard.py:1049-1057). Single pass: one scan
    * computes all keyword counters, then unpivots — no per-keyword rescan.
    */
  val keywordMentions = QueryDef(
    "an_keyword_mentions",
    Keywords.map { k =>
      s"""SELECT '$k' AS keyword, CAST(SUM((length(text) - length(replace(text, '$k', ''))) // ${k.length}) AS BIGINT) AS mentions FROM documents"""
    }.mkString("", " UNION ALL ", " ORDER BY keyword")) { (s, dir) =>
    val aggs = Keywords.map { k =>
      sum(((length(col("text")) - length(expr(s"replace(text, '$k', '')"))) / k.length)
        .cast("long")).as(s"m_$k")
    }
    val wide = Tables.documents(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = Keywords.map(k => s"'$k', m_$k").mkString(", ")
    wide.selectExpr(s"stack(${Keywords.size}, $stackArgs) as (keyword, mentions)")
      .orderBy("keyword")
  }

  /** Filter + sort + top-N explorer (posts page). */
  val explorer = QueryDef(
    "an_explorer",
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE lang = 'en' AND n_chars > 200
      |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"lang" === "en" && $"n_chars" > 200)
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"n_chars".desc, $"doc_id").limit(20)
  }

  /** The explorer's page size and the strictly-after-(n_chars DESC,
    * doc_id) keyset predicate — THE pagination primitive: the cursor is
    * the last row the client saw, and the next page is a filtered
    * top-k, never an OFFSET (OFFSET n re-scans and re-sorts n rows to
    * throw them away — at 100 TB page 50 would re-read page 1-49's
    * data; the keyset page's cost is the same as page 1's).
    */
  val ExplorerPageSize = 20
  private def afterKey(chars: Column, id: Column,
      lastChars: Column, lastId: Column): Column =
    chars < lastChars || (chars === lastChars && id > lastId)

  /** Keyset continuation of the explorer with a LITERAL cursor — the
    * real serving API (the dashboard holds the last row of the page it
    * rendered and passes it back). With literal bounds the continuation
    * predicate reaches the parquet scan (`PushedFilters` on n_chars),
    * so on the curated range-sorted layout later pages SKIP the files
    * earlier pages came from — proved in SourcesSpec.
    */
  def explorerPage(docs: DataFrame, lastChars: Long, lastId: Long,
      pageSize: Int = ExplorerPageSize): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter($"lang" === "en" && $"n_chars" > 200 &&
        afterKey($"n_chars", $"doc_id", lit(lastChars), lit(lastId)))
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"n_chars".desc, $"doc_id").limit(pageSize)
  }

  /** PAGE 2 of the explorer through the keyset cursor (r14 verdict
    * item 7: the reference dashboard pages through results; `an_explorer`
    * serves page 1 only). The oracled form derives the cursor — the
    * last row of page 1 in (n_chars DESC, doc_id) order — inside the
    * query as a 1-row broadcast so the result is deterministic at any
    * SF; production passes the cursor as literals instead
    * ([[explorerPage]]) and pays ONE top-k scan per page.
    */
  val explorerPage2 = QueryDef(
    "an_explorer_page",
    s"""WITH p1 AS MATERIALIZED (SELECT doc_id, n_chars FROM documents
       |  WHERE lang = 'en' AND n_chars > 200
       |  ORDER BY n_chars DESC, doc_id LIMIT $ExplorerPageSize),
       |lastk AS MATERIALIZED (SELECT n_chars AS lc, doc_id AS li FROM p1
       |  ORDER BY n_chars, doc_id DESC LIMIT 1)
       |SELECT doc_id, source, lang, n_chars FROM documents, lastk
       |WHERE lang = 'en' AND n_chars > 200
       |  AND (n_chars < lc OR (n_chars = lc AND doc_id > li))
       |ORDER BY n_chars DESC, doc_id LIMIT $ExplorerPageSize""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Tables.documents(s, dir)
      .filter($"lang" === "en" && $"n_chars" > 200)
    // the page-1 cursor: last row of the page in serve order (= first
    // row under the reversed order) — a bounded top-k, then a 1-row
    // broadcast into the page-2 top-k
    val lastk = base.select($"n_chars", $"doc_id")
      .orderBy($"n_chars".desc, $"doc_id").limit(ExplorerPageSize)
      .orderBy($"n_chars", $"doc_id".desc).limit(1)
      .select($"n_chars".as("lc"), $"doc_id".as("li"))
    base.crossJoin(broadcast(lastk))
      .filter(afterKey($"n_chars", $"doc_id", $"lc", $"li"))
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"n_chars".desc, $"doc_id").limit(ExplorerPageSize)
  }

  /** Strictly-after predicate of the COMPOSITE (source ASC, n_chars
    * DESC, doc_id ASC) explorer order — the general form of the
    * dashboard's filter+sort explorer (r15 verdict stretch): lexicographic
    * continuation across a mixed-direction sort, still one pushable
    * boolean expression.
    */
  private def afterKeyMc(src: Column, chars: Column, id: Column,
      lastSrc: Column, lastChars: Column, lastId: Column): Column =
    src > lastSrc ||
      (src === lastSrc &&
        (chars < lastChars || (chars === lastChars && id > lastId)))

  /** Keyset continuation of the MULTI-COLUMN explorer with a LITERAL
    * cursor — [[explorerPage]]'s composite twin: ordered (source ASC,
    * n_chars DESC, doc_id ASC), cursor = the full last row of the
    * previous page. With literal bounds the whole Or-of-Ands predicate
    * reaches the parquet scan (source AND n_chars in PushedFilters), so
    * on a source/n_chars-sorted curated layout later pages skip the
    * files earlier pages came from — proved in SourcesSpec.
    */
  def explorerPageMc(docs: DataFrame, lastSrc: String, lastChars: Long,
      lastId: Long, pageSize: Int = ExplorerPageSize): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter($"lang" === "en" && $"n_chars" > 200 &&
        afterKeyMc($"source", $"n_chars", $"doc_id",
          lit(lastSrc), lit(lastChars), lit(lastId)))
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"source", $"n_chars".desc, $"doc_id").limit(pageSize)
  }

  /** PAGE 2 of the multi-column explorer through the composite keyset
    * cursor (r15 verdict stretch). Same shape as [[explorerPage2]]: the
    * oracled form derives the cursor — the last row of page 1 under
    * (source ASC, n_chars DESC, doc_id ASC) — inside the query as a
    * 1-row broadcast; production passes it as literals
    * ([[explorerPageMc]]) and pays ONE top-k scan per page, never an
    * OFFSET.
    */
  val explorerPageMc2 = QueryDef(
    "an_explorer_page_mc",
    s"""WITH p1 AS MATERIALIZED (SELECT source, n_chars, doc_id FROM documents
       |  WHERE lang = 'en' AND n_chars > 200
       |  ORDER BY source, n_chars DESC, doc_id LIMIT $ExplorerPageSize),
       |lastk AS MATERIALIZED (SELECT source AS lsrc, n_chars AS lc, doc_id AS li FROM p1
       |  ORDER BY source DESC, n_chars, doc_id DESC LIMIT 1)
       |SELECT doc_id, source, lang, n_chars FROM documents, lastk
       |WHERE lang = 'en' AND n_chars > 200
       |  AND (source > lsrc OR (source = lsrc
       |    AND (n_chars < lc OR (n_chars = lc AND doc_id > li))))
       |ORDER BY source, n_chars DESC, doc_id LIMIT $ExplorerPageSize""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Tables.documents(s, dir)
      .filter($"lang" === "en" && $"n_chars" > 200)
    val lastk = base.select($"source", $"n_chars", $"doc_id")
      .orderBy($"source", $"n_chars".desc, $"doc_id").limit(ExplorerPageSize)
      .orderBy($"source".desc, $"n_chars", $"doc_id".desc).limit(1)
      .select($"source".as("lsrc"), $"n_chars".as("lc"), $"doc_id".as("li"))
    base.crossJoin(broadcast(lastk))
      .filter(afterKeyMc($"source", $"n_chars", $"doc_id", $"lsrc", $"lc", $"li"))
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"source", $"n_chars".desc, $"doc_id").limit(ExplorerPageSize)
  }

  /** Per-user activity stats (network_analysis.py:256-292 analog). */
  val userActivity = QueryDef(
    "an_user_activity",
    s"""WITH ${PS.evCte}
       |SELECT user_id, COUNT(*) AS n_events,
       |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
       |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
       |  ${PS.dsum("value")} AS total_value,
       |  ${PS.davg("value")} AS avg_value,
       |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days
       |FROM ev GROUP BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(
        P.cnt.as("n_events"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("n_views"),
        P.dsum($"value").as("total_value"),
        P.davg($"value").as("avg_value"),
        countDistinct($"ts".cast("date")).as("n_active_days"))
  }

  /** 7-day rolling active users per day (the dashboard's DAU/WAU panel).
    * Scale shape: the day dimension is bounded by the time horizon (tiny —
    * broadcast into a range join), while per-(day, user) actives come from
    * one partial pre-aggregation of the event stream; COUNT(DISTINCT)
    * then groups by day only. Never a window-over-raw-events plan, whose
    * per-row distinct state would not survive 100 TB.
    */
  val rollingActive = QueryDef(
    "an_rolling_active",
    s"""WITH ${PS.evCte},
       |daily AS MATERIALIZED (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM ev),
       |days AS MATERIALIZED (SELECT DISTINCT d FROM daily)
       |SELECT a.d AS day, CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS active_7d
       |FROM days a JOIN daily b ON b.d >= a.d - 6 AND b.d <= a.d
       |GROUP BY a.d ORDER BY day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = Tables.events(s, dir)
      .select($"ts".cast("date").as("d"), $"user_id").distinct()
    val days = daily.select($"d".as("day")).distinct()
    broadcast(days)
      .join(daily, $"d" >= date_sub($"day", 6) && $"d" <= $"day")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("active_7d"))
      .orderBy($"day")
  }

  /** Spike/anomaly days — the dashboard's "unusual activity" panel: days
    * whose event count deviates from the corpus mean by more than 2
    * population standard deviations. The test is EXACT INTEGER
    * arithmetic end to end: with D = #days, S = Σcount, Q = Σcount²
    * (all BIGINT), |c − S/D| > 2σ  ⇔  (c·D − S)² > 4·(Q·D − S²), so no
    * float stddev (whose Welford-vs-naive accumulation differs between
    * engines) ever enters the comparison — the flag is bit-portable by
    * construction. Scale shape: one day aggregation (map-side partial,
    * calendar-bounded key), one 1-row stats aggregate broadcast back.
    * HUGEINT note: counts fit int32 at any SF that bounds a day's events
    * below ~2^31, so the BIGINT products stay within 2^63 headroom; at
    * larger day volumes the same test runs at decimal(38,0).
    */
  val spikeDays = QueryDef(
    "an_spike_days",
    s"""WITH ${PS.evCte},
       |d AS MATERIALIZED (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM ev GROUP BY 1),
       |st AS MATERIALIZED (SELECT COUNT(*) AS nd, CAST(SUM(c) AS BIGINT) AS s,
       |    CAST(SUM(c * c) AS BIGINT) AS q FROM d)
       |SELECT day, c AS n_events,
       |  CAST((c * st.nd - st.s) * (c * st.nd - st.s) AS BIGINT) AS dev2_scaled,
       |  CAST(4 * (st.q * st.nd - st.s * st.s) AS BIGINT) AS thr_scaled,
       |  (c * st.nd - st.s) * (c * st.nd - st.s) > 4 * (st.q * st.nd - st.s * st.s) AS is_spike
       |FROM d CROSS JOIN st""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables.events(s, dir)
      .groupBy($"ts".cast("date").as("day")).agg(P.cnt.as("c"))
    val st = d.agg(P.cnt.as("nd"), sum($"c").as("s"), sum($"c" * $"c").as("q"))
    val dev = $"c" * $"nd" - $"s"
    d.crossJoin(broadcast(st))
      .select($"day", $"c".as("n_events"),
        (dev * dev).as("dev2_scaled"),
        (lit(4) * ($"q" * $"nd" - $"s" * $"s")).as("thr_scaled"),
        (dev * dev > lit(4) * ($"q" * $"nd" - $"s" * $"s")).as("is_spike"))
  }

  /** Weekly cohort retention — users grouped by their FIRST active week,
    * tracked for 4 weeks of subsequent activity (the engagement panel
    * next to the dashboard's DAU/WAU view). ONE wide shuffle total: the
    * per-user week set is gathered with a map-side-partial `collect_set`
    * (its size is bounded by the number of weeks in the corpus time
    * window, not by data volume), the cohort week is `array_min` of that
    * set, and exploding it back yields (cohort, offset) cells whose
    * aggregate is a plain `count` — each user's weeks are distinct, and
    * offset is injective in week for a fixed user, so no distinct
    * aggregate is needed. Nothing per-user is ever broadcast (a |users|-
    * row broadcast was the r9 scale defect here); the only broadcast is
    * `base`, one row per cohort WEEK — calendar-bounded, not data-scaled.
    * ISO Monday weeks (date_trunc 'week') and day-difference / 7
    * arithmetic are integer-exact in both engines; only the final rate
    * needs prnd.
    */
  val retention = QueryDef(
    "an_retention",
    s"""WITH ${PS.evCte},
       |uw AS MATERIALIZED (SELECT DISTINCT user_id,
       |    CAST(date_trunc('week', ts) AS DATE) AS w FROM ev),
       |fw AS MATERIALIZED (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id),
       |cells AS MATERIALIZED (SELECT f.cw, CAST((u.w - f.cw) / 7 AS BIGINT) AS week_offset,
       |    COUNT(DISTINCT u.user_id) AS n_active
       |  FROM uw u JOIN fw f ON u.user_id = f.user_id
       |  WHERE (u.w - f.cw) / 7 <= 3 GROUP BY 1, 2),
       |base AS MATERIALIZED (SELECT cw, n_active AS cohort_size FROM cells WHERE week_offset = 0)
       |SELECT c.cw AS cohort_week, c.week_offset, CAST(c.n_active AS BIGINT) AS n_active,
       |  ${PS.prnd("CAST(c.n_active AS DOUBLE) / b.cohort_size", 6)} AS retention
       |FROM cells c JOIN base b ON c.cw = b.cw
       |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
    import s.implicits._
    val perUser = Tables.events(s, dir)
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("w"))
      .groupBy($"user_id").agg(collect_set($"w").as("ws"))
    val cells = perUser
      .select(array_min($"ws").as("cw"), explode($"ws").as("w"))
      .select($"cw", (datediff($"w", $"cw") / 7).cast("long").as("week_offset"))
      .filter($"week_offset" <= 3)
      .groupBy($"cw", $"week_offset")
      .agg(count(lit(1)).as("n_active"))
    val base = cells.filter($"week_offset" === 0)
      .select($"cw", $"n_active".as("cohort_size"))
    cells.join(broadcast(base), "cw")
      .select($"cw".as("cohort_week"), $"week_offset", $"n_active",
        P.prnd($"n_active".cast("double") / $"cohort_size", 6).as("retention"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Ordered conversion funnel view → click → purchase (ClickHouse
    * windowFunnel-style; the per-pair streaming twin is
    * `st_funnel_join`): per user, the first view, the first click
    * STRICTLY AFTER that view, and the first purchase strictly after that
    * click, summarized to stage counts, conversion rates, and mean
    * hours-to-advance. ONE exchange total: both per-user "first qualifying
    * ts" columns are whole-partition window minima over the SAME
    * partitioning (no orderBy, so WindowExec sorts by user_id only — no
    * (user, ts) sort), and the closing groupBy(user) reuses that hash
    * partitioning, so partial and final aggregate fuse with no second
    * shuffle. The whole-partition running minima equal the oracle's
    * join-based formulation exactly: the first click after the first view
    * is the global min over clicks with ts > min(view ts). Time sums are
    * exact integer micros through a decimal accumulator (a long sum could
    * overflow at ~3.5M converting users × a 30-day corpus window), cast
    * to double ONCE, so the means are bit-portable.
    */
  val conversion = QueryDef(
    "an_conversion",
    s"""WITH ${PS.evCte},
       |v1 AS MATERIALIZED (SELECT user_id, MIN(ts) AS v1 FROM ev
       |  WHERE event_type = 'view' GROUP BY user_id),
       |c1 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS c1 FROM ev e
       |  JOIN v1 ON e.user_id = v1.user_id
       |  WHERE e.event_type = 'click' AND e.ts > v1.v1 GROUP BY e.user_id),
       |p1 AS MATERIALIZED (SELECT e.user_id, MIN(e.ts) AS p1 FROM ev e
       |  JOIN c1 ON e.user_id = c1.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > c1.c1 GROUP BY e.user_id)
       |SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM ev) AS BIGINT) AS n_users,
       |  CAST((SELECT COUNT(*) FROM v1) AS BIGINT) AS n_view,
       |  CAST((SELECT COUNT(*) FROM c1) AS BIGINT) AS n_click,
       |  CAST((SELECT COUNT(*) FROM p1) AS BIGINT) AS n_purchase,
       |  ${PS.prnd("CAST((SELECT COUNT(*) FROM c1) AS DOUBLE) / (SELECT COUNT(*) FROM v1)", 6)} AS view_to_click,
       |  ${PS.prnd("CAST((SELECT COUNT(*) FROM p1) AS DOUBLE) / (SELECT COUNT(*) FROM c1)", 6)} AS click_to_purchase,
       |  ${PS.prnd("CAST((SELECT COUNT(*) FROM p1) AS DOUBLE) / (SELECT COUNT(*) FROM v1)", 6)} AS overall_conversion,
       |  ${PS.prnd("CAST((SELECT SUM(epoch_us(c.c1) - epoch_us(v.v1)) FROM c1 c JOIN v1 v USING (user_id)) AS DOUBLE) / (SELECT COUNT(*) FROM c1) / 3.6e9", 6)} AS avg_hours_to_click,
       |  ${PS.prnd("CAST((SELECT SUM(epoch_us(p.p1) - epoch_us(c.c1)) FROM p1 p JOIN c1 c USING (user_id)) AS DOUBLE) / (SELECT COUNT(*) FROM p1) / 3.6e9", 6)} AS avg_hours_to_purchase
       |""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id")
    // sv/sc are whole-partition minima (default frame = the entire
    // partition when there is no orderBy): sv = first view ts, sc = first
    // click strictly after it; both Window nodes share one partitioning
    val staged = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_type")
      .withColumn("sv", min(when($"event_type" === "view", $"ts")).over(byUser))
      .withColumn("qc", when($"event_type" === "click" && $"sv" < $"ts", $"ts"))
      .withColumn("sc", min($"qc").over(byUser))
    val per = staged.groupBy($"user_id").agg(
      min(when($"event_type" === "view", $"ts")).as("v1"),
      min($"qc").as("c1"),
      min(when($"event_type" === "purchase" && $"sc" < $"ts", $"ts")).as("p1"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    per.agg(
      P.cnt.as("n_users"),
      count($"v1").as("n_view"), count($"c1").as("n_click"), count($"p1").as("n_purchase"),
      P.prnd(count($"c1").cast("double") / count($"v1"), 6).as("view_to_click"),
      P.prnd(count($"p1").cast("double") / count($"c1"), 6).as("click_to_purchase"),
      P.prnd(count($"p1").cast("double") / count($"v1"), 6).as("overall_conversion"),
      P.prnd(sum((unix_micros($"c1") - unix_micros($"v1")).cast(dec)).cast("double")
        / count($"c1") / lit(3.6e9), 6).as("avg_hours_to_click"),
      P.prnd(sum((unix_micros($"p1") - unix_micros($"c1")).cast(dec)).cast("double")
        / count($"p1") / lit(3.6e9), 6).as("avg_hours_to_purchase"))
  }

  /** Session-level engagement panel over the 30-min-gap sessionization
    * (the dashboard companion to `etl_sessionize`, which ships the raw
    * per-session frame): session/user counts, mean events per session,
    * bounce rate (single-event sessions), and mean session duration.
    * Reuses Etl's shared session chain — one keyed exchange for the
    * per-user windows + session aggregate, then a single-row summary;
    * duration micros sum through a decimal accumulator (exact at any
    * session count), one cast to double, portable-rounded.
    */
  val sessionStats = QueryDef(
    "an_session_stats",
    s"""WITH ${PS.evCte}, ${Etl.sessionCteSql},
       |sess AS MATERIALIZED (SELECT user_id, session_idx, min(ts) AS st,
       |    max(ts) AS en, COUNT(*) AS ne
       |  FROM numbered GROUP BY user_id, session_idx)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  ${PS.prnd("CAST(SUM(ne) AS DOUBLE) / COUNT(*)", 6)} AS avg_events,
       |  CAST(MAX(ne) AS BIGINT) AS max_events,
       |  ${PS.prnd("CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 6)} AS bounce_rate,
       |  ${PS.prnd("CAST(SUM(epoch_us(en) - epoch_us(st)) AS DOUBLE) / COUNT(*) / 6e7", 6)} AS avg_duration_min
       |FROM sess""".stripMargin) { (s, dir) =>
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    Etl.sessions(s, dir).agg(
      P.cnt.as("n_sessions"),
      countDistinct($"user_id").as("n_users"),
      P.prnd(sum($"n_events").cast("double") / count(lit(1)), 6).as("avg_events"),
      max($"n_events").as("max_events"),
      P.prnd(sum(when($"n_events" === 1, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6).as("bounce_rate"),
      P.prnd(sum((unix_micros($"session_end") - unix_micros($"session_start")).cast(dec))
        .cast("double") / count(lit(1)) / lit(6e7), 6).as("avg_duration_min"))
  }

  /** Engagement-inequality panel: EXACT Gini coefficient of per-user
    * event counts, per event type (the "is activity concentrated in a few
    * power users" question every community dashboard asks; for a
    * training-data pipeline the same statistic over per-source doc
    * counts is the corpus-concentration report).
    *
    * The scale trick: Gini needs a rank over all N users, but the
    * mean-absolute-difference form only needs the VALUE HISTOGRAM —
    * G = Σ_v n_v·(v·P_v − S_v) / (N·T) with P_v/S_v the
    * users/event-mass strictly below value v. Per-user counts and the
    * histogram are plain hash aggregates (map-side partials); the
    * prefix sums run over DISTINCT COUNT VALUES only — bounded by the
    * max per-user activity (thousands), not by N (billions) — so the
    * per-type ordered window touches a constant-size relation at any
    * corpus size. Every term is an exact integer (decimal accumulator;
    * DuckDB's SUM(BIGINT) is HUGEINT), one final double division, so
    * the coefficient is tie-invariant and bit-portable by construction
    * — no float ranks, no sort of the user relation.
    */
  val gini = QueryDef(
    "an_gini",
    s"""WITH ${PS.evCte},
       |ua AS MATERIALIZED (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ev GROUP BY 1, 2),
       |h AS MATERIALIZED (SELECT event_type, c AS v, CAST(COUNT(*) AS BIGINT) AS nv
       |  FROM ua GROUP BY 1, 2),
       |p AS MATERIALIZED (SELECT event_type, v, nv,
       |    COALESCE(SUM(nv) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pv,
       |    COALESCE(SUM(nv * v) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sv
       |  FROM h),
       |g AS MATERIALIZED (SELECT event_type, SUM(nv) AS n, SUM(nv * v) AS t,
       |    SUM(nv * (v * pv - sv)) AS num
       |  FROM p GROUP BY event_type)
       |SELECT event_type, CAST(n AS BIGINT) AS n_users, CAST(t AS BIGINT) AS total_events,
       |  ${PS.prnd("CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))", 8)} AS gini
       |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val ua = Tables.events(s, dir)
      .groupBy($"event_type", $"user_id").agg(P.cnt.as("c"))
    val h = ua.groupBy($"event_type", $"c".as("v")).agg(P.cnt.as("nv"))
    val w = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val p = h.select($"event_type", $"v", $"nv",
      coalesce(sum($"nv").over(w), lit(0L)).as("pv"),
      coalesce(sum($"nv" * $"v").over(w), lit(0L)).as("sv"))
    // decimal(38,0) accumulators: exact at any N where a long sum of
    // nv·(v·pv − sv) terms could overflow (DuckDB SUM(BIGINT) is
    // already HUGEINT)
    p.groupBy($"event_type")
      .agg(sum($"nv".cast(DecimalType(38, 0))).as("n"),
        sum(($"nv" * $"v").cast(DecimalType(38, 0))).as("t"),
        sum(($"nv" * ($"v" * $"pv" - $"sv")).cast(DecimalType(38, 0))).as("num"))
      .select($"event_type", $"n".cast("long").as("n_users"),
        $"t".cast("long").as("total_events"),
        P.prnd($"num".cast("double") / ($"n".cast("double") * $"t".cast("double")), 8)
          .as("gini"))
      .orderBy($"event_type")
  }

  /** The declared top-fractions (percent) the concentration report
    * evaluates.
    */
  private val ParetoPcts = Seq(1L, 5L, 10L, 25L)

  /** Activity concentration ("top X% of users produce Y% of events") —
    * an_gini's actionable sibling: the Pareto shares a capacity planner
    * or abuse team actually reads. Same 100 TB trick as an_gini: never
    * rank users individually (that is a global sort of a user-cardinality
    * relation); aggregate to the DISTINCT-ACTIVITY-VALUE histogram
    * (bounded by max per-user activity, thousands of rows at any corpus
    * size), take exclusive prefix sums from the top, and locate each
    * declared cutoff rank k = ⌈N·p/100⌉ inside its histogram bucket —
    * mass = se + (k − pu)·v, all exact integers. The windows and the
    * 4-row cutoff join run over the BOUNDED histogram (the global window
    * and the inequality join are constant-size by construction — the
    * corpus-scale work is the two hash aggregates feeding it).
    */
  val paretoShare = QueryDef(
    "an_pareto_share",
    s"""WITH ${PS.evCte},
       |ua AS MATERIALIZED (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ev GROUP BY 1),
       |h AS MATERIALIZED (SELECT c AS v, CAST(COUNT(*) AS BIGINT) AS nv FROM ua GROUP BY 1),
       |t AS MATERIALIZED (SELECT SUM(nv) AS n, SUM(nv * v) AS tot FROM h),
       |p AS MATERIALIZED (SELECT v, nv,
       |    COALESCE(SUM(nv) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pu,
       |    COALESCE(SUM(nv * v) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS se
       |  FROM h),
       |ks AS MATERIALIZED (SELECT pct,
       |    CAST(((SELECT n FROM t) * pct + 99) // 100 AS BIGINT) AS k
       |  FROM (SELECT unnest([${ParetoPcts.mkString(", ")}]) AS pct)),
       |m AS MATERIALIZED (SELECT ks.pct, ks.k,
       |    CAST(p.se + (ks.k - p.pu) * p.v AS BIGINT) AS mass
       |  FROM ks JOIN p ON p.pu < ks.k AND ks.k <= p.pu + p.nv)
       |SELECT CAST(pct AS BIGINT) AS top_pct, k AS k_users, mass AS events_topk,
       |  (SELECT CAST(tot AS BIGINT) FROM t) AS total_events,
       |  ${PS.prnd("CAST(mass AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)", 6)} AS share
       |FROM m ORDER BY top_pct""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val ua = Tables.events(s, dir).groupBy($"user_id").agg(P.cnt.as("c"))
    val h = ua.groupBy($"c".as("v")).agg(P.cnt.as("nv"))
    val t = h.agg(sum($"nv".cast(DecimalType(38, 0))).as("n"),
      sum(($"nv" * $"v").cast(DecimalType(38, 0))).as("tot"))
    // global window over the HISTOGRAM — bounded by distinct activity
    // values, not users, so the single-partition sort is constant-size
    val w = Window.orderBy($"v".desc).rowsBetween(Window.unboundedPreceding, -1)
    val p = h.select($"v", $"nv",
      coalesce(sum($"nv").over(w), lit(0L)).as("pu"),
      coalesce(sum($"nv" * $"v").over(w), lit(0L)).as("se"))
    val ks = t.select(
        explode(array(ParetoPcts.map(lit(_)): _*)).as("pct"), $"n", $"tot")
      .select($"pct", expr("(n * pct + 99) div 100").as("k"), $"tot")
    // 4-row cutoff relation × bounded histogram: the inequality join is
    // constant-size by construction (never corpus-scaling data)
    ks.join(p, $"pu" < $"k" && $"k" <= $"pu" + $"nv")
      .select($"pct".as("top_pct"), $"k".as("k_users"),
        ($"se" + ($"k" - $"pu") * $"v").cast("long").as("events_topk"),
        $"tot".cast("long").as("total_events"),
        P.prnd(($"se" + ($"k" - $"pu") * $"v").cast("double")
          / $"tot".cast("double"), 6).as("share"))
      .orderBy($"top_pct")
  }

  /** Bit-portable HyperLogLog distinct-user sketch per event type, with
    * the exact count and relative error alongside (the honest eval pair,
    * like sim_recall): 64 registers from the md5 of the user id — 6 index
    * bits, ρ = leading-zero rank of the remaining 54 bits computed as
    * 55 − length(bin(w)) (pure integer/string ops, no log), register
    * maxes, and the raw HLL harmonic estimate α·m²/Σ2^−M with each
    * 2^−M built by integer shift + exact power-of-two division. Every
    * step — md5, integer split, bin length, max, dsum — is identical SQL
    * semantics on both engines, so the ESTIMATE itself hash-matches:
    * a sketch whose value is reproducible across engines and runs.
    *
    * Why it matters at 100 TB: the sketch side is one narrow scan +
    * a (|types|·64)-group aggregate with map-side partials — register
    * maxes merge associatively, so no shuffle of user ids at all. The
    * exact COUNT(DISTINCT) column is the eval harness (it IS the
    * expensive dedup shuffle the sketch avoids); production reads only
    * the estimate.
    *
    * Small-range (raw ≤ 2.5m, empty registers remain) uses the standard
    * linear-counting correction m·ln(m/V) — and because V has only m
    * possible values, ln arrives as a 64-entry LITERAL TABLE
    * ([[HllLnCase]]) instead of a runtime log(): the one place the
    * estimator touches a transcendental is frozen into decimal literals
    * both engines parse to the identical double, so even the corrected
    * estimate is bit-portable. (A general log() would hang the result
    * on two libms agreeing — the same reason tx_lm_score avoids
    * log-probs.)
    */
  /** ln(64/V) for V = 1..64 as 17-significant-digit literals — enough
    * digits that any correctly-rounding parser (Java's and DuckDB's)
    * reconstructs the identical IEEE double. References a column `v`.
    */
  private val HllLnCase: String = {
    val branches = (1 to 64)
      .map(v => f"WHEN $v THEN CAST(${math.log(64.0 / v)}%1.17g AS DOUBLE)")
    s"(CASE v ${branches.mkString(" ")} ELSE CAST(0.0 AS DOUBLE) END)"
  }

  /** Raw harmonic HLL estimate over ssum — shared expression TEXT so
    * Spark (via expr) and DuckDB parse the identical arithmetic.
    */
  // every constant explicitly DOUBLE: a bare decimal literal parses as
  // DECIMAL in both engines, and Spark's and DuckDB's decimal-DIVISION
  // rounding rules differ — at sf0.1 the raw estimate landed exactly on a
  // prnd boundary and the two decimal paths split it (1926.9375 vs .9376).
  // With CASTs the whole estimator is IEEE double arithmetic, identical
  // everywhere.
  private val HllRawExpr =
    "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE))) * CAST(64.0 AS DOUBLE) * CAST(64.0 AS DOUBLE) / ssum"

  /** Corrected estimate: linear counting below 2.5·m when empty
    * registers remain, raw harmonic estimate otherwise.
    */
  private val HllEstExpr =
    s"(CASE WHEN $HllRawExpr <= CAST(160.0 AS DOUBLE) AND v > 0 THEN CAST(64.0 AS DOUBLE) * $HllLnCase ELSE $HllRawExpr END)"

  val hllUsers = QueryDef(
    "an_hll_users",
    s"""WITH ${PS.evCte},
       |hh AS MATERIALIZED (SELECT event_type,
       |    ${PS.hexToLong("md5(CAST(user_id AS VARCHAR))", 1, 15)} AS h FROM ev),
       |mx AS MATERIALIZED (SELECT event_type, h % 64 AS j,
       |    MAX(CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - length(bin(h // 64)) END) AS mj
       |  FROM hh GROUP BY 1, 2),
       |types AS MATERIALIZED (SELECT DISTINCT event_type FROM ev),
       |filled AS MATERIALIZED (SELECT t.event_type, r.j, COALESCE(m.mj, 0) AS mj
       |  FROM types t CROSS JOIN range(64) r(j)
       |  LEFT JOIN mx m ON m.event_type = t.event_type AND m.j = r.j),
       |s AS MATERIALIZED (SELECT event_type,
       |    ${PS.dsum("1.0 / CAST(CAST(1 AS BIGINT) << mj AS DOUBLE)", 15)} AS ssum,
       |    CAST(SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM filled GROUP BY event_type),
       |ex AS MATERIALIZED (SELECT event_type,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users FROM ev GROUP BY 1)
       |SELECT s.event_type AS event_type,
       |  ${PS.prnd(HllEstExpr, 4)} AS est_users,
       |  ex.exact_users,
       |  ${PS.prnd(s"abs(${PS.prnd(HllEstExpr, 4)} - ex.exact_users) / ex.exact_users", 6)} AS rel_error
       |FROM s JOIN ex ON ex.event_type = s.event_type
       |ORDER BY s.event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    val w = expr("h div 64")
    val mx = ev
      .select($"event_type", P.hexToLong(md5($"user_id".cast("string")), 1, 15).as("h"))
      .groupBy($"event_type", ($"h" % 64).as("j"))
      .agg(max(when(w === 0, lit(55)).otherwise(lit(55) - length(bin(w)))).as("mj"))
    val allreg = ev.select($"event_type").distinct()
      .select($"event_type", explode(sequence(lit(0), lit(63))).as("j"))
    val ssum = allreg.join(mx, Seq("event_type", "j"), "left")
      .select($"event_type", coalesce($"mj", lit(0)).as("mj"))
      .groupBy($"event_type")
      .agg(P.dsum(
        expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(mj AS INT)) AS DOUBLE)"),
        15).as("ssum"),
        sum(when($"mj" === 0, 1L).otherwise(0L)).as("v"))
    val ex = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("exact_users"))
    // the estimator expression TEXT is shared with the oracle: Spark's
    // SQL parser and DuckDB's both round the same literals to the same
    // doubles and apply the same IEEE arithmetic
    val est = P.prnd(expr(HllEstExpr), 4)
    ssum.join(ex, "event_type")
      .select($"event_type", est.as("est_users"), $"exact_users",
        P.prnd(abs(est - $"exact_users") / $"exact_users", 6).as("rel_error"))
      .orderBy($"event_type")
  }

  /** Count-min sketch depth (independent hash rows) and width (buckets
    * per row). Width is the precision knob — expected overestimate is
    * ~N/w per probe — and the synthetic corpus is deliberately the
    * ADVERSARIAL case: per-user counts are near-uniform, so nobody is a
    * true heavy hitter and at sf0.1 (N ≈ 100k, counts ≈ 70) the bias
    * visibly dominates, while at sf0.01 (N ≈ 10k) estimates are nearly
    * exact. The eval columns document exactly that crossover (the
    * honest-eval posture of an_hll_users / sim_recall); a production
    * run sizes w ≈ e/ε for target error ε·N.
    */
  private val CmDepth = 4
  private val CmWidth = 256

  /** The bucket index of user `u` under hash row `r` — md5-salted by the
    * row id, so the [[CmDepth]] hashes are independent; shared TEXT shape
    * with the oracle twin below.
    */
  private def cmBucket(u: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    P.hexToLong(md5(concat(r.cast("string"), lit(":"), u.cast("string"))), 1, 15) % CmWidth

  private def cmBucketSql(u: String, r: String) =
    s"(${PS.hexToLong(s"md5(CAST($r AS VARCHAR) || ':' || CAST($u AS VARCHAR))", 1, 15)} % $CmWidth)"

  /** Heavy-hitter panel backed by a count-min sketch, with the exact
    * counts alongside (the honest eval pair, like an_hll_users): every
    * event increments [[CmDepth]] md5-salted counters, a user's estimate
    * is the min over its counters, and the guarantee est ≥ exact holds by
    * construction (counters only ever over-count). The top-20 users by
    * exact count are the eval probes; production reads only the sketch.
    *
    * Why it matters at 100 TB: the sketch side is a narrow map into a
    * CONSTANT-size aggregate (d·w cells with map-side partials — no
    * shuffle of user ids, no per-user state), mergeable across days/
    * streams by cell-wise addition, and any key's frequency is answered
    * from d cells. The exact side IS the per-user shuffle the sketch
    * avoids — it exists here as the eval harness. Every count is an
    * integer and the hashes are md5-derived, so the estimate itself is
    * bit-portable across engines.
    */
  val cmTopk = QueryDef(
    "an_cm_topk",
    s"""WITH ${PS.evCte},
       |ex AS MATERIALIZED (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
       |  FROM ev GROUP BY 1),
       |hh AS MATERIALIZED (SELECT user_id, exact_count, r,
       |    ${cmBucketSql("user_id", "r")} AS b
       |  FROM ex CROSS JOIN range($CmDepth) t(r)),
       |cells AS MATERIALIZED (SELECT r, b, CAST(SUM(exact_count) AS BIGINT) AS cell
       |  FROM hh GROUP BY 1, 2),
       |top AS MATERIALIZED (SELECT user_id, exact_count FROM ex
       |  ORDER BY exact_count DESC, user_id LIMIT 20),
       |te AS MATERIALIZED (SELECT t.user_id, t.exact_count, r,
       |    ${cmBucketSql("t.user_id", "r")} AS b
       |  FROM top t CROSS JOIN range($CmDepth) t2(r))
       |SELECT t.user_id, CAST(MIN(c.cell) AS BIGINT) AS est_count, t.exact_count,
       |  CAST(MIN(c.cell) - t.exact_count AS BIGINT) AS overestimate
       |FROM te t JOIN cells c ON c.r = t.r AND c.b = t.b
       |GROUP BY t.user_id, t.exact_count
       |ORDER BY t.exact_count DESC, t.user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    // the eval pair already pays the per-user exact aggregate, so the
    // sketch is built from (user, count) with WEIGHTED inserts — cell
    // values identical to streaming +1 inserts, but the CmDepth-way
    // explode runs over |users| rows, not |events| (a pure streaming
    // build without the exact side would explode the raw stream — that
    // shape lives in streaming.TrendingStream). ex feeds both the
    // sketch and the probe top-20: checkpoint, not recompute.
    val ex = ev.groupBy($"user_id").agg(P.cnt.as("exact_count"))
      .ckpt
    val cells = ex
      .select($"user_id", $"exact_count",
        explode(sequence(lit(0), lit(CmDepth - 1))).as("r"))
      .groupBy($"r", cmBucket($"user_id", $"r").as("b"))
      .agg(sum($"exact_count").as("cell"))
    val top = ex.orderBy($"exact_count".desc, $"user_id").limit(20)
    // both sides of this join are constant-size (20·d probe rows, d·w
    // cells) — broadcast is safe at any corpus scale
    top
      .select($"user_id", $"exact_count",
        explode(sequence(lit(0), lit(CmDepth - 1))).as("r"))
      .withColumn("b", cmBucket($"user_id", $"r"))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy($"user_id", $"exact_count")
      .agg(min($"cell").as("est_count"))
      .select($"user_id", $"est_count", $"exact_count",
        ($"est_count" - $"exact_count").as("overestimate"))
      .orderBy($"exact_count".desc, $"user_id")
  }

  /** Activity-trend panel: exact least-squares slope of daily event
    * counts per event type (the dashboard's "is this community growing"
    * number). Each (x=day index, y=daily count) term is an integer; the
    * five sums run through decimal accumulators (HUGEINT in DuckDB), so
    * the closed-form slope/intercept divide two EXACT integers cast to
    * double once — identical IEEE arithmetic on both engines, no
    * regression library, no float accumulation order anywhere.
    *
    * Scale shape: one calendar-bounded daily aggregation (map-side
    * partials; |types|·|days| rows at any corpus size) then a |types|-row
    * closed-form aggregate. Nothing iterative, nothing driver-side.
    */
  val trend = QueryDef(
    "an_trend",
    s"""WITH ${PS.evCte},
       |daily AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y FROM ev GROUP BY 1, 2),
       |xy AS MATERIALIZED (SELECT event_type,
       |    CAST(datediff('day', DATE '2024-01-01', day) AS BIGINT) AS x, y FROM daily),
       |ag AS MATERIALIZED (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
       |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx,
       |    CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(y) AS BIGINT) AS total_events
       |  FROM xy GROUP BY event_type)
       |SELECT event_type, n_days, total_events,
       |  ${PS.prnd("CASE WHEN n * sxx - sx * sx = 0.0 THEN 0.0 ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END", 8)} AS slope_per_day,
       |  ${PS.prnd("CASE WHEN n * sxx - sx * sx = 0.0 THEN sy / n ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END", 8)} AS intercept
       |FROM ag ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(P.cnt.as("y"))
    val xy = daily.select($"event_type",
      datediff($"day", lit("2024-01-01").cast("date")).cast("long").as("x"), $"y")
    val ag = xy.groupBy($"event_type").agg(
      count(lit(1)).cast("double").as("n"),
      sum($"x".cast(dec)).cast("double").as("sx"),
      sum($"y".cast(dec)).cast("double").as("sy"),
      sum(($"x" * $"y").cast(dec)).cast("double").as("sxy"),
      sum(($"x" * $"x").cast(dec)).cast("double").as("sxx"),
      count(lit(1)).as("n_days"),
      sum($"y".cast(dec)).cast("long").as("total_events"))
    val den = $"n" * $"sxx" - $"sx" * $"sx"
    val slope = when(den === 0.0, lit(0.0))
      .otherwise(($"n" * $"sxy" - $"sx" * $"sy") / den)
    val icept = when(den === 0.0, $"sy" / $"n")
      .otherwise(($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") / den) * $"sx") / $"n")
    ag.select($"event_type", $"n_days", $"total_events",
      P.prnd(slope, 8).as("slope_per_day"),
      P.prnd(icept, 8).as("intercept"))
      .orderBy($"event_type")
  }

  /** Peak-concurrency panel: per day, the maximum number of sessions
    * open at one instant (the "how many users are on RIGHT NOW at the
    * worst moment" capacity number), over the shared 30-min-gap session
    * chain ([[Etl.sessions]]). Classic sweep line: each session emits
    * +1 at its (day-clipped) start and −1 at its end, and the peak is
    * the maximum of the running sum; intervals are closed, with starts
    * ordered before ends at the same instant, so zero-duration
    * (single-event) sessions still count. Sessions crossing midnight
    * count toward every day they touch (clipped to the day).
    *
    * The running sum is NOT one window per day (a single day at 100 TB
    * has millions of concurrent sessions → one reducer): it is the
    * exact PREFIX-MAX DECOMPOSITION — level 1 sweeps within (day, hour)
    * slices, level 2 composes per-slice totals: with o_h the sum of all
    * deltas before hour h, peak = max_h(o_h + max running sum within h).
    * Identical to the flat sweep (the oracle runs that one), associative
    * by construction. The slice width is the task-size knob: hour slices
    * here; a deployment sizes slices (minute, second, or a third level)
    * so no task sorts more than its share. All arithmetic is integer
    * micros — bit-portable.
    */
  val concurrency = QueryDef(
    "an_concurrency",
    s"""WITH ${PS.evCte}, ${Etl.sessionCteSql},
       |sess AS MATERIALIZED (SELECT user_id, session_idx, min(ts) AS st, max(ts) AS en
       |  FROM numbered GROUP BY 1, 2),
       |sd AS MATERIALIZED (SELECT st, en,
       |    CAST(unnest(generate_series(CAST(st AS DATE), CAST(en AS DATE),
       |      INTERVAL 1 DAY)) AS DATE) AS day FROM sess),
       |cl AS MATERIALIZED (SELECT day,
       |    greatest(epoch_us(st), epoch_us(CAST(day AS TIMESTAMP))) AS cs,
       |    least(epoch_us(en), epoch_us(CAST(day + 1 AS TIMESTAMP)) - 1) AS ce
       |  FROM sd),
       |deltas AS MATERIALIZED (
       |  SELECT day, cs AS t, 1 AS delta, 1 AS sm FROM cl
       |  UNION ALL SELECT day, ce AS t, -1 AS delta, 0 AS sm FROM cl),
       |sw AS MATERIALIZED (SELECT day, sm,
       |    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
       |      ROWS UNBOUNDED PRECEDING) AS rs
       |  FROM deltas)
       |SELECT day, CAST(MAX(rs) AS BIGINT) AS peak_concurrent,
       |  CAST(SUM(sm) AS BIGINT) AS n_sessions
       |FROM sw GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val se = Etl.sessions(s, dir)
      .select($"session_start".as("st"), $"session_end".as("en"))
    val sd = se.select($"st", $"en",
      explode(sequence($"st".cast("date"), $"en".cast("date"))).as("day"))
    val cl = sd.select($"day",
      greatest(unix_micros($"st"), unix_micros($"day".cast("timestamp"))).as("cs"),
      least(unix_micros($"en"),
        unix_micros(date_add($"day", 1).cast("timestamp")) - 1).as("ce"))
    val deltas = cl.select($"day", $"cs".as("t"), lit(1).as("delta"), lit(1L).as("sm"))
      .unionAll(cl.select($"day", $"ce".as("t"), lit(-1).as("delta"), lit(0L).as("sm")))
      .withColumn("h", expr("t div 3600000000"))
    // level 1: running sum + its max within each (day, hour) slice
    val w1 = Window.partitionBy($"day", $"h").orderBy($"t", $"delta".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hb = deltas.withColumn("rs", sum($"delta").over(w1))
      .groupBy($"day", $"h")
      .agg(sum($"delta").as("tot"), max($"rs").as("mx"), sum($"sm").as("ns"))
    // level 2: exclusive prefix of slice totals over the ≤24 hour rows
    val w2 = Window.partitionBy($"day").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, -1)
    hb.withColumn("off", coalesce(sum($"tot").over(w2), lit(0L)))
      .groupBy($"day")
      .agg(max($"off" + $"mx").cast("long").as("peak_concurrent"),
        sum($"ns").cast("long").as("n_sessions"))
      .orderBy($"day")
  }

  /** Path / flow analysis panel — the top-20 most common session
    * journeys as ordered event-type sequences ("view>click>purchase"),
    * the funnel-discovery view next to `an_conversion`'s fixed funnel
    * and `an_session_stats`' aggregates, over the SAME shared 30-min
    * session chain ([[Etl.numbered]]). Ordering inside a session is
    * (ts, event_id) — the sessionization's own total order — so the
    * path strings are deterministic and engine-portable (the oracle's
    * `string_agg(... ORDER BY)` equals the struct-sorted collect here).
    *
    * Scale shape: one keyed exchange (shared with the session windows),
    * a per-session hash aggregate whose state is the session's own
    * ordered type list (bounded by per-entity activity), then a
    * path-frequency aggregate with map-side partials into
    * TakeOrderedAndProject — never a global sort of the paths.
    */
  val sessionPaths = QueryDef(
    "an_session_paths",
    s"""WITH ${PS.evCte}, ${Etl.sessionCteSql},
       |p AS MATERIALIZED (SELECT user_id, session_idx,
       |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
       |  FROM numbered GROUP BY 1, 2)
       |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    Etl.numbered(s, dir)
      .groupBy($"user_id", $"session_idx")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy($"path").agg(P.cnt.as("n_sessions"))
      .orderBy($"n_sessions".desc, $"path").limit(20)
  }

  /** The pivot's EXPLICIT column list — at 100 TB a pivot must never
    * infer its output schema from the data (that is a full extra scan
    * and an unbounded-width plan); the bounded, declared event-type
    * vocabulary is the contract.
    */
  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Daily activity matrix — the long→wide pivot every BI layer asks for
    * (one row per day, one count column per event type plus the row
    * total). Spark's `.pivot()` with an EXPLICIT value list compiles to
    * exactly the CASE-sum aggregate the oracle spells out: one hash
    * aggregation with map-side partials, calendar-bounded output, no
    * second scan, no inferred schema.
    */
  val pivotDaily = QueryDef(
    "an_pivot_daily",
    s"""WITH ${PS.evCte}
       |SELECT CAST(ts AS DATE) AS day,
       |${PivotTypes.map(t => s"  CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS n_$t,").mkString("\n")}
       |  CAST(${PivotTypes.map(t => s"COUNT(*) FILTER (WHERE event_type = '$t')").mkString(" + ")} AS BIGINT) AS n_total
       |FROM ev GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    import s.implicits._
    val wide = Tables.events(s, dir)
      .groupBy($"ts".cast("date").as("day"))
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
    val renamed = PivotTypes.foldLeft(wide) { (df, t) =>
      df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
    }
    renamed
      .withColumn("n_total", PivotTypes.map(t => col(s"n_$t")).reduce(_ + _))
      .orderBy($"day")
  }

  /** Histogram bucket width for [[histQuantiles]] — the precision knob:
    * the estimate is exact to within one bucket (worst case W, typical
    * W/n_b). events.value spans ~[0, 500], so W=8 gives ~64 buckets.
    */
  private val HqWidth = 8.0

  /** Mergeable histogram quantile sketch per event type, with the exact
    * quantile alongside (the honest eval pair — the third sketch next to
    * `an_hll_users` (distinct) and `an_cm_topk` (frequency), completing
    * the streaming-summary trio every monitoring pipeline carries).
    * Each value lands in a constant-width bucket (b = floor(value/W));
    * a quantile q is answered from the bucket where the cumulative count
    * crosses t = q·N by linear interpolation within the bucket:
    * est = W·b + W·(t − cum_below)/n_b.
    *
    * Why it matters at 100 TB: the sketch side is ONE hash aggregation
    * into |types|·|range/W| cells — map-side partials do nearly all the
    * work, cells merge by addition (mergeable across days/streams like
    * the CM cells), and the cumulative pass runs over the constant-size
    * cell relation, never the data. The exact side (a full per-type
    * `percentile` sort-buffer) IS the cost the sketch avoids — it exists
    * here as the eval harness; production reads only the estimate.
    * Every count is an integer, t = q·N and the interpolation divide two
    * exact integers cast to double once — bit-portable by construction.
    */
  val histQuantiles = QueryDef(
    "an_hist_quantiles",
    s"""WITH ${PS.evCte},
       |h AS MATERIALIZED (SELECT event_type, CAST(floor(value / $HqWidth) AS BIGINT) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS nb FROM ev GROUP BY 1, 2),
       |c AS MATERIALIZED (SELECT event_type, b, nb,
       |    SUM(nb) OVER (PARTITION BY event_type ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(nb) OVER (PARTITION BY event_type) AS n FROM h),
       |p AS MATERIALIZED (SELECT event_type, b, nb, cum, cum - nb AS cumprev,
       |    q, q * CAST(n AS DOUBLE) AS t
       |  FROM c CROSS JOIN (SELECT CAST(0.5 AS DOUBLE) AS q
       |    UNION ALL SELECT CAST(0.9 AS DOUBLE)) qs
       |  WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)
       |    AND CAST(cum - nb AS DOUBLE) < q * CAST(n AS DOUBLE)),
       |ex AS MATERIALIZED (SELECT event_type,
       |    ${PS.prnd("quantile_cont(value, 0.50)", 6)} AS p50,
       |    ${PS.prnd("quantile_cont(value, 0.90)", 6)} AS p90 FROM ev GROUP BY 1)
       |SELECT p.event_type AS event_type, q,
       |  ${PS.prnd(s"$HqWidth * b + $HqWidth * (t - CAST(cumprev AS DOUBLE)) / CAST(nb AS DOUBLE)", 6)} AS est_value,
       |  CASE WHEN q = 0.5 THEN p50 ELSE p90 END AS exact_value,
       |  ${PS.prnd(s"abs(${PS.prnd(s"$HqWidth * b + $HqWidth * (t - CAST(cumprev AS DOUBLE)) / CAST(nb AS DOUBLE)", 6)} - CASE WHEN q = 0.5 THEN p50 ELSE p90 END)", 6)} AS abs_err
       |FROM p JOIN ex ON ex.event_type = p.event_type
       |ORDER BY event_type, q""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = Tables.events(s, dir)
      .groupBy($"event_type", floor($"value" / HqWidth).cast("long").as("b"))
      .agg(P.cnt.as("nb"))
    val wCum = Window.partitionBy($"event_type").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"event_type")
    val c = h.select($"event_type", $"b", $"nb",
      sum($"nb").over(wCum).as("cum"), sum($"nb").over(wAll).as("n"))
    val p = c
      .select($"event_type", $"b", $"nb", $"cum", ($"cum" - $"nb").as("cumprev"),
        explode(array(lit(0.5), lit(0.9))).as("q"), $"n")
      .withColumn("t", $"q" * $"n".cast("double"))
      .filter($"cum".cast("double") >= $"t" && $"cumprev".cast("double") < $"t")
    val est = P.prnd(lit(HqWidth) * $"b" +
      lit(HqWidth) * ($"t" - $"cumprev".cast("double")) / $"nb".cast("double"), 6)
    val ex = Tables.events(s, dir).groupBy($"event_type")
      .agg(expr("percentile(value, array(0.5D, 0.9D))").as("ps"))
      .select($"event_type", P.prnd($"ps".getItem(0), 6).as("p50"),
        P.prnd($"ps".getItem(1), 6).as("p90"))
    val exact = when($"q" === 0.5, $"p50").otherwise($"p90")
    p.join(ex, "event_type")
      .select($"event_type", $"q", est.as("est_value"), exact.as("exact_value"),
        P.prnd(abs(est - exact), 6).as("abs_err"))
      .orderBy($"event_type", $"q")
  }

  /** Hash-bucketed A/B panel: users deterministically split into two
    * arms by an md5 bit (EXACTLY how a real experiment system assigns —
    * stable per user, engine-portable, never rand()), conversion = the
    * user made a high-value purchase (value > 150 — the q_bloom_prune
    * cohort, giving a ~45% base rate with variance on this corpus), and the two-proportion z-test decides whether the
    * arms differ. On the synthetic corpus the arms are exchangeable by
    * construction, so the expected reading is |z| < 1.96 — the panel is
    * the A/A sanity check every experimentation stack runs first.
    *
    * Portability: every input to the statistic is an exact integer
    * (user counts, converter counts); the rates, pooled variance, and
    * z pass through IEEE divides/multiplies and ONE sqrt — which IEEE
    * 754 requires correctly rounded, so z is bit-identical across
    * engines (same posture as gr_assortativity's Pearson). The
    * significance flag compares the UNROUNDED z, so it can never flip
    * against the reported value. Scale shape: one distinct-user
    * aggregation with map-side partials, then a 2-row closed form.
    */
  val abTest = QueryDef(
    "an_ab_test",
    s"""WITH ${PS.evCte},
       |ua AS MATERIALIZED (SELECT user_id,
       |    ${PS.hexToLong("md5(CAST(user_id AS VARCHAR))", 1, 1)} % 2 AS arm,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
       |  FROM ev GROUP BY 1),
       |a AS MATERIALIZED (SELECT
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM ua),
       |z AS MATERIALIZED (SELECT n_a, conv_a, n_b, conv_b,
       |    CASE WHEN n_a > 0 AND n_b > 0
       |        AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
       |      THEN (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
       |        / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
       |          * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
       |          * (1.0 / n_a + 1.0 / n_b))
       |      ELSE NULL END AS zv
       |  FROM a)
       |SELECT n_a, conv_a, n_b, conv_b,
       |  CASE WHEN n_a > 0 THEN ${PS.prnd("CAST(conv_a AS DOUBLE) / n_a", 6)} END AS rate_a,
       |  CASE WHEN n_b > 0 THEN ${PS.prnd("CAST(conv_b AS DOUBLE) / n_b", 6)} END AS rate_b,
       |  ${PS.prnd("zv", 6)} AS z_score,
       |  COALESCE(abs(zv) > 1.96, false) AS significant
       |FROM z""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ua = Tables.events(s, dir)
      .groupBy($"user_id",
        (P.hexToLong(md5($"user_id".cast("string")), 1, 1) % 2).as("arm"))
      .agg(max(when($"event_type" === "purchase" && $"value" > 150, 1)
        .otherwise(0)).as("conv"))
    val a = ua.agg(
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when($"arm" === 0, $"conv".cast("long")).otherwise(0L)).as("conv_a"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when($"arm" === 1, $"conv".cast("long")).otherwise(0L)).as("conv_b"))
    val pool = ($"conv_a" + $"conv_b").cast("double") / ($"n_a" + $"n_b")
    // degenerate-input guard (r10 ADVICE): an empty arm or a pooled rate
    // of exactly 0 or 1 zeroes the denominator — Spark would emit
    // NaN/Infinity where DuckDB emits NULL, so z diverges across engines
    // and `significant` silently reads false instead of flagging an
    // invalid test. Both twins emit NULL z (and an explicit false) so a
    // broken experiment is visibly broken on either engine.
    val zv = when($"n_a" > 0 && $"n_b" > 0 &&
        ($"conv_a" + $"conv_b") > 0 && ($"conv_a" + $"conv_b") < ($"n_a" + $"n_b"),
      ($"conv_a".cast("double") / $"n_a" - $"conv_b".cast("double") / $"n_b") /
        sqrt(pool * (lit(1.0) - pool) * (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
    a.select($"n_a", $"conv_a", $"n_b", $"conv_b",
      when($"n_a" > 0, P.prnd($"conv_a".cast("double") / $"n_a", 6)).as("rate_a"),
      when($"n_b" > 0, P.prnd($"conv_b".cast("double") / $"n_b", 6)).as("rate_b"),
      P.prnd(zv, 6).as("z_score"),
      coalesce(abs(zv) > 1.96, lit(false)).as("significant"))
  }

  /** KMV sketch size (k minimum hash values per audience). */
  val KmvK = 64
  /** Hash domain: 15 md5 hex chars → [0, 2^60), exactly representable
    * as a double (needed by the estimator's division).
    */
  val KmvDomain = 1L << 60

  /** Audience-overlap estimation via KMV/theta sketches, with the exact
    * eval pair — the sketch family's set-INTERSECTION member (HLL
    * answers "how many distinct", count-min "which are heavy"; this
    * answers "how much do two audiences overlap" without ever shuffling
    * the full user sets to one place). Per declared event type, the
    * sketch is the [[KmvK]] smallest 60-bit user hashes (mergeable,
    * constant size — ship k longs per segment at 100 TB, not user
    * lists); for a pair, θ = min(θ_a, θ_b) and the estimate is
    * |{h ∈ A ∩ B : h < θ}| · D/θ — the DataSketches theta-intersection
    * rule. Everything is in hash space (two users colliding at 60 bits
    * merge in BOTH the sketch and the exact pair, so the eval is
    * apples-to-apples and the output engine-portable).
    *
    * Scale shape: ONE distinct (type, h) pass over events
    * (materialized, the signature-table posture), then per DECLARED
    * type a bounded orderBy+limit (TakeOrderedAndProject — partial
    * top-k map-side, k rows to the driver-side merge, never a
    * per-type shuffle of all users); the exact pair is one hash-keyed
    * aggregate with map-side partials. All estimator arithmetic is
    * (k−1)·D/θ style — exact-double multiplies of powers of two and one
    * correctly-rounded divide, bit-identical across engines.
    */
  val kmvOverlap = QueryDef(
    "an_kmv_overlap", {
      val types = Seq("view", "click", "purchase")
      val d = s"CAST($KmvDomain AS DOUBLE)"
      val h = PS.hexToLong("md5(CAST(user_id AS VARCHAR))", 1, 15)
      def est(n: String, th: String) =
        s"CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE) ELSE CAST(${KmvK - 1} AS DOUBLE) * $d / CAST($th AS DOUBLE) END"
      val kcte = types.zipWithIndex.map { case (t, i) =>
        s"""k$i AS MATERIALIZED (SELECT h FROM u WHERE event_type = '$t' ORDER BY h LIMIT $KmvK),
           |s$i AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS theta FROM k$i)""".stripMargin
      }.mkString(",\n")
      val flags = types.zipWithIndex
        .map { case (t, i) => s"MAX(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS f$i" }
        .mkString(", ")
      val pairs = for { i <- types.indices; j <- i + 1 until types.size } yield (i, j)
      val pairSel = pairs.map { case (i, j) =>
        s"""SELECT '${types(i)}' AS type_a, '${types(j)}' AS type_b,
           |  ${PS.prnd(est(s"(SELECT n FROM s$i)", s"(SELECT theta FROM s$i)"), 4)} AS est_a,
           |  ${PS.prnd(est(s"(SELECT n FROM s$j)", s"(SELECT theta FROM s$j)"), 4)} AS est_b,
           |  ${PS.prnd(s"""CAST((SELECT COUNT(*) FROM k$i JOIN k$j USING (h)
           |      WHERE h < least((SELECT theta FROM s$i), (SELECT theta FROM s$j))) AS DOUBLE)
           |    * $d / CAST(least((SELECT theta FROM s$i), (SELECT theta FROM s$j)) AS DOUBLE)""", 4)} AS est_intersection,
           |  (SELECT CAST(SUM(f$i * f$j) AS BIGINT) FROM ex) AS exact_intersection""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${PS.evCte},
         |u AS MATERIALIZED (SELECT DISTINCT event_type, $h AS h
         |  FROM ev WHERE event_type IN (${types.map(t => s"'$t'").mkString(", ")})),
         |$kcte,
         |ex AS MATERIALIZED (SELECT h, $flags FROM u GROUP BY h)
         |$pairSel
         |ORDER BY type_a, type_b""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val types = Seq("view", "click", "purchase")
    val d = lit(KmvDomain.toDouble)
    // one distinct (type, hash) pass, shared by every sketch and the
    // exact pair (at 100 TB this is the materialized signature table)
    val u = Tables.events(s, dir)
      .filter($"event_type".isin(types: _*))
      .select($"event_type",
        P.hexToLong(md5($"user_id".cast("string")), 1, 15).as("h"))
      .distinct()
      .ckpt
    // each sketch's bounded top-k is CONSUMED four times (its own pair
    // join, the other pair's join, and two broadcast stat reads per
    // reference) and a broadcast plan re-executes per action —
    // unmaterialized, the TakeOrdered over u ran ~4x per type (r19
    // IterProbe: 12 jobs). ckpt each k-row sketch once; every later
    // broadcast build is a k-row checkpoint scan.
    def kmv(t: String): DataFrame =
      u.filter($"event_type" === t).select($"h").orderBy($"h").limit(KmvK)
    val kmvs: Map[String, DataFrame] = types.map(t => t -> kmv(t).ckpt).toMap
    def sk(t: String): DataFrame =
      kmvs(t).agg(P.cnt.as("n"), max($"h").as("theta"))
    def est(n: Column, th: Column): Column =
      when(n < KmvK, n.cast("double"))
        .otherwise(lit((KmvK - 1).toDouble) * d / th.cast("double"))
    val flagCols = types.zipWithIndex.map { case (t, i) =>
      max(when($"event_type" === t, 1).otherwise(0)).as(s"f$i")
    }
    val ex = u.groupBy($"h").agg(flagCols.head, flagCols.tail: _*)
    val pairs = for { i <- types.indices; j <- i + 1 until types.size } yield (i, j)
    // all three exact intersections in ONE pass over the flag relation
    // (three passes before — one hash aggregate per pair)
    val exCols = pairs.map { case (i, j) =>
      sum(col(s"f$i") * col(s"f$j")).cast("long").as(s"ex_${i}_$j")
    }
    val exAll = ex.agg(exCols.head, exCols.tail: _*).ckpt
    pairs.map { case (i, j) =>
      val sa = sk(types(i)).select($"n".as("na"), $"theta".as("ta"))
      val sb = sk(types(j)).select($"n".as("nb"), $"theta".as("tb"))
      val common = kmvs(types(i)).join(kmvs(types(j)), "h")
        .crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .filter($"h" < least($"ta", $"tb"))
        .agg(P.cnt.as("c"))
      common.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .crossJoin(broadcast(exAll.select(col(s"ex_${i}_$j").as("exact_intersection"))))
        .select(
          lit(types(i)).as("type_a"), lit(types(j)).as("type_b"),
          P.prnd(est($"na", $"ta"), 4).as("est_a"),
          P.prnd(est($"nb", $"tb"), 4).as("est_b"),
          P.prnd($"c".cast("double") * d / least($"ta", $"tb").cast("double"), 4)
            .as("est_intersection"),
          $"exact_intersection")
    }.reduce(_ unionAll _).orderBy($"type_a", $"type_b")
  }

  /** Weekday-adjusted anomaly days — [[spikeDays]]' 2σ test run WITHIN
    * each day-of-week cohort, so "busy for a Saturday" flags even when
    * the global mean hides it (weekly seasonality inflates the global σ
    * and masks within-weekday bursts — the standard reason naive spike
    * detection misses weekend anomalies). Same EXACT INTEGER posture as
    * the global test: per dow cohort of size n_w with day sums S_w and
    * square sums Q_w, day d flags iff (c_d·n_w − S_w)² > 4·(Q_w·n_w −
    * S_w²) — no float mean/σ anywhere, the flag is bit-portable by
    * construction. One calendar-bounded day aggregation, a 7-row cohort
    * stats aggregate joined back on dow.
    */
  val dowAnomaly = QueryDef(
    "an_dow_anomaly",
    s"""WITH ${PS.evCte},
       |d AS MATERIALIZED (SELECT CAST(ts AS DATE) AS day,
       |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       |    CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
       |st AS MATERIALIZED (SELECT dow, COUNT(*) AS nw, CAST(SUM(c) AS BIGINT) AS s,
       |    CAST(SUM(c * c) AS BIGINT) AS q FROM d GROUP BY dow)
       |SELECT day, d.dow AS dow, c AS n_events,
       |  CAST((c * st.nw - st.s) * (c * st.nw - st.s) AS BIGINT) AS dev2_scaled,
       |  CAST(4 * (st.q * st.nw - st.s * st.s) AS BIGINT) AS thr_scaled,
       |  (c * st.nw - st.s) * (c * st.nw - st.s) > 4 * (st.q * st.nw - st.s * st.s) AS is_spike
       |FROM d JOIN st ON st.dow = d.dow""".stripMargin) { (s, dir) =>
    import s.implicits._
    // the daily series feeds both the cohort stats and the flag join
    val d = Tables.events(s, dir)
      .groupBy($"ts".cast("date").as("day"),
        dayofweek($"ts").cast("long").as("dow"))
      .agg(P.cnt.as("c"))
      .ckpt
    val st = d.groupBy($"dow")
      .agg(P.cnt.as("nw"), sum($"c").as("s"), sum($"c" * $"c").as("q"))
    val dev = $"c" * $"nw" - $"s"
    val thr = lit(4) * ($"q" * $"nw" - $"s" * $"s")
    d.join(st, "dow")
      .select($"day", $"dow", $"c".as("n_events"),
        (dev * dev).as("dev2_scaled"), thr.as("thr_scaled"),
        (dev * dev > thr).as("is_spike"))
  }

  /** Seasonal-naive forecast accuracy — the dashboard's "is today
    * normal?" panel done honestly: predict each day's event count with
    * the count from 7 days earlier (the strongest trivial baseline for
    * weekly-seasonal traffic) and report per-type error mass. Any real
    * anomaly/forecast feature must first beat this number, so the
    * operator IS the baseline gate (the reference dashboard eyeballs the
    * timeline; this quantifies it — dashboard.py's timeline panel,
    * reference dashboard.py:70-118).
    *
    * Scale shape: the daily series is calendar×type bounded (one
    * map-side-combined aggregate over the raw events), and the lag is an
    * equi-join of that tiny relation with itself shifted by 7 days —
    * never a window over raw events. The per-type MAE is exact (integer
    * |err| sums); MAPE routes per-row ratios through the scaled-long
    * exact-sum path so the aggregate is order-invariant.
    */
  val forecastNaive = QueryDef(
    "an_forecast_naive",
    s"""WITH ${PS.evCte},
       |d AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
       |j AS MATERIALIZED (SELECT a.event_type AS event_type, a.c AS c, b.c AS pred
       |  FROM d a JOIN d b ON b.event_type = a.event_type AND b.day = a.day - 7)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       |  CAST(SUM(ABS(c - pred)) AS BIGINT) AS sum_abs_err,
       |  ${PS.prnd("CAST(SUM(ABS(c - pred)) AS DOUBLE) / COUNT(*)", 6)} AS mae,
       |  ${PS.prnd(PS.davg("CAST(ABS(c - pred) AS DOUBLE) / CAST(c AS DOUBLE)", 9), 6)} AS mape
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    // the daily series feeds both join sides — checkpoint, not recompute
    val d = Tables.events(s, dir)
      .groupBy($"event_type", $"ts".cast("date").as("day")).agg(P.cnt.as("c"))
      .ckpt
    val prior = d.select($"event_type", date_add($"day", 7).as("day"), $"c".as("pred"))
    d.join(prior, Seq("event_type", "day"))
      .groupBy($"event_type")
      .agg(P.cnt.as("n_days"),
        sum(abs($"c" - $"pred")).as("sum_abs_err"),
        P.prnd(sum(abs($"c" - $"pred")).cast("double") / P.cnt, 6).as("mae"),
        P.prnd(P.davg(abs($"c" - $"pred").cast("double") / $"c".cast("double"), 9), 6)
          .as("mape"))
      .orderBy($"event_type")
  }

  val defs: Seq[QueryDef] = Seq(timeline, timelineDense, newVsReturning, topGroups, dowActivity, hourlyHeatmap, valueBuckets,
    commentBuckets, quantiles, keywordMentions, explorer, explorerPage2,
    explorerPageMc2, userActivity,
    rollingActive, retention, spikeDays, conversion, sessionStats, eventGapDist, activeStreaks, gini, paretoShare,
    hllUsers, cmTopk, trend, histQuantiles, concurrency, abTest, sessionPaths,
    pivotDaily, kmvOverlap, forecastNaive, dowAnomaly)
}
