package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration we want on a real cluster.
  *
  * Everything here is sizing-neutral: AQE handles post-shuffle partition
  * coalescing and skew joins at any scale, and the static shuffle partition
  * count is only the pre-AQE ceiling (32 for local[32]; on a 1000-executor
  * cluster this would be set to ~2-3x total cores by the submitter).
  */
object GraftSession {
  def builder(cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // default ON (the cluster posture — runtime coalescing and skew
      // handling are load-bearing at 100 TB); SPARK_GRAFT_AQE=false is a
      // dev knob for quantifying AQE's per-stage re-planning overhead on
      // sub-second local work
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // dims (region/nation/supplier at any SF) stay broadcastable
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // let AQE size the partitioning of cached relations too — the graph
      // iteration caches repartition-by-key relations and wants them
      // size-coalesced (a few partitions at bench SF, thousands at 100 TB),
      // not frozen at the static shuffle-partition count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      // events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default 100-entry compiled-class cache thrashes under a
      // 60+-query sweep (every stage's wholestage class re-Janino-compiles
      // even on repeat samples); the cache is keyed by source text, and a
      // long-lived service JVM serving a query library wants the same
      // headroom
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // durable index store (sources.IndexStore): published train-once
      // artifacts are SERVED instead of rebuilt when this points at a
      // store dir. Empty (the default) = inert.
      .config("spark.graft.index.dir", sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", ""))
      .withExtensions(new GraftExtensions)

  def get(cpus: Int = 32): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
