package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Portable => P, PortableSql => PS}
import org.apache.spark.sql.functions._

/** Pipeline-health / orchestration operators (SURVEY §2a tail).
  *
  * Reference semantics: the Airflow DAG's cross-stage stats + threshold
  * gates + final report
  * (airflow/dags/reddit_can_complete_pipeline.py:58-241 —
  * get_pipeline_stats counts each stage collection, check_ml_threshold /
  * check_network_threshold branch the DAG on minimum volumes,
  * generate_final_report derives ML coverage and volume
  * recommendations). Re-expressed as ONE declarative query an
  * orchestrator reads instead of five MongoDB count round-trips.
  */
object Ops {

  /** Reference `MIN_POSTS_FOR_ML`
    * (reddit_can_complete_pipeline.py:37). */
  private val MinDocsForMl = 50L

  /** Reference `MIN_USERS_FOR_NETWORK`
    * (reddit_can_complete_pipeline.py:38). */
  private val MinUsersForNetwork = 30L

  /** One-row pipeline run report: per-stage row counts (raw docs,
    * events, processed docs, sentiment-scored docs, unique users), the
    * ML-coverage percentage, the two threshold gates, the overall
    * go/no-go, and the reference report's volume recommendation.
    *
    * Stage mapping onto graft's tables: `posts` → documents rows,
    * `comments` → events rows, `processed_posts` → docs passing the
    * enrichment text gate (length > 5, etl_filter_enrich's has_text),
    * `sentiment_results` → docs the shared VADER labeler scores
    * NON-neutral (the classified output a dashboard reports — counted
    * off [[Sentiment.labeledShared]], so the report can never disagree
    * with the sentiment stage itself), `unique_users` → exact distinct
    * user_id over events.
    *
    * Scale shape: three independent scalar aggregates (documents scan
    * with a conditional count, labeled-corpus scan, events scan with a
    * two-phase exact distinct) cross-joined as broadcast 1-row
    * relations — no data-scaling join anywhere, and each input is
    * scanned exactly once. The gate thresholds are the reference's
    * constants; coverage divides only when processed > 0 (both engines
    * return NULL on an empty pipeline, not a fake 0).
    */
  val pipelineReport = QueryDef(
    "ops_pipeline_report",
    s"""WITH ${Sentiment.labeledSharedCte("pr")},
       |dstat AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) FILTER (WHERE length(text) > 5) AS BIGINT) AS n_processed
       |  FROM documents),
       |sstat AS MATERIALIZED (SELECT
       |    CAST(COUNT(*) FILTER (WHERE label <> 'neutral') AS BIGINT) AS n_scored
       |  FROM prl),
       |estat AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events)
       |SELECT n_docs, n_events, n_processed, n_scored, n_users,
       |  CASE WHEN n_processed = 0 THEN NULL
       |    ELSE ${PS.prnd("n_scored * 100.0 / n_processed", 6)} END AS coverage_pct,
       |  n_processed >= $MinDocsForMl AS ml_gate,
       |  n_users >= $MinUsersForNetwork AS network_gate,
       |  (n_processed >= $MinDocsForMl AND n_users >= $MinUsersForNetwork) AS go,
       |  CASE WHEN n_docs < 100 THEN 'expand_sources'
       |       WHEN n_scored < 50 THEN 'increase_frequency'
       |       WHEN n_users < 50 THEN 'diversify_users'
       |       WHEN n_docs >= 300 AND n_users >= 100 THEN 'volume_excellent'
       |       ELSE 'ok' END AS recommendation
       |FROM dstat, sstat, estat""".stripMargin) { (s, dir) =>
    import s.implicits._
    val dstat = Tables.documents(s, dir).agg(
      P.cnt.as("n_docs"),
      count(when(length($"text") > 5, 1)).as("n_processed"))
    val sstat = Sentiment.labeledShared(s, dir)
      .agg(count(when($"label" =!= "neutral", 1)).as("n_scored"))
    val estat = Tables.events(s, dir).agg(
      P.cnt.as("n_events"),
      count_distinct($"user_id").as("n_users"))
    dstat.crossJoin(broadcast(sstat)).crossJoin(broadcast(estat))
      .select($"n_docs", $"n_events", $"n_processed", $"n_scored", $"n_users",
        when($"n_processed" === 0, lit(null).cast("double"))
          .otherwise(P.prnd($"n_scored" * 100.0 / $"n_processed", 6))
          .as("coverage_pct"),
        ($"n_processed" >= MinDocsForMl).as("ml_gate"),
        ($"n_users" >= MinUsersForNetwork).as("network_gate"),
        ($"n_processed" >= MinDocsForMl && $"n_users" >= MinUsersForNetwork)
          .as("go"),
        when($"n_docs" < 100, "expand_sources")
          .when($"n_scored" < 50, "increase_frequency")
          .when($"n_users" < 50, "diversify_users")
          .when($"n_docs" >= 300 && $"n_users" >= 100, "volume_excellent")
          .otherwise("ok").as("recommendation"))
  }

  /** Staleness horizon of the freshness report, in hours. */
  private val StaleHours = 6L

  /** Per-stream freshness / lag report — the other half of the
    * orchestrator panel next to [[pipelineReport]]'s volumes: per event
    * type, the last-seen event time and its lag behind the corpus
    * high-water mark, with a staleness flag at [[StaleHours]]. A dead
    * upstream producer (the reference's scraper or one Kafka topic
    * partition going quiet) shows up here hours before volume gates
    * trip. Deterministic by construction: lag is measured against the
    * corpus max — the ingest high-water mark — never wall-clock `now()`,
    * so the report is reproducible and engine-portable (exact integer
    * microseconds end to end).
    *
    * Scale shape: one map-side-combined (type, max, count) aggregate
    * over the events scan plus a 1-row high-water broadcast.
    */
  val freshness = QueryDef(
    "ops_freshness",
    s"""WITH ${PS.evCte},
       |t AS MATERIALIZED (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us FROM ev GROUP BY 1),
       |m AS MATERIALIZED (SELECT CAST(MAX(last_us) AS BIGINT) AS hwm FROM t)
       |SELECT event_type, n_events, last_us,
       |  CAST(m.hwm - last_us AS BIGINT) AS lag_us,
       |  (m.hwm - last_us) > ${StaleHours * 3600L * 1000000L} AS stale
       |FROM t CROSS JOIN m ORDER BY event_type""".stripMargin) { (s, dir) =>
    import s.implicits._
    // t feeds both the high-water mark and the report rows — checkpoint,
    // not recompute (a |types|-row relation)
    val t = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(P.cnt.as("n_events"), max(unix_micros($"ts")).as("last_us"))
      .localCheckpoint(false)
    val m = t.agg(max($"last_us").as("hwm"))
    t.crossJoin(broadcast(m))
      .select($"event_type", $"n_events", $"last_us",
        ($"hwm" - $"last_us").as("lag_us"),
        ($"hwm" - $"last_us" > StaleHours * 3600L * 1000000L).as("stale"))
      .orderBy($"event_type")
  }

  val defs: Seq[QueryDef] = Seq(pipelineReport, freshness)
}
