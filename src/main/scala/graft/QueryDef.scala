package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark query + (when SQL-expressible) a DuckDB
  * oracle that must produce identical rows on the same parquet tables.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
