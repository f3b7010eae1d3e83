package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single read-path for the test corpus. Parquet scans keep Catalyst's
  * column pruning and predicate pushdown intact (verify with
  * `.explain("formatted")`: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): read as long nanos (see
    * GraftSession's nanosAsLong) and truncate to a micros timestamp —
    * the same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP,
    * so oracle SQL over `CAST(ts AS TIMESTAMP)` sees identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
