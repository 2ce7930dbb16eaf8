package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator battery: reference-parity relational
  * surface (Parity, Windows), events analytics (EventsQ), and the
  * large-scale pipeline operators (Pipeline: dedup / similarity /
  * text analysis). `oracleSql` carries the DuckDB-equivalent SQL for
  * every query that is ANSI-SQL-expressible; the rest get the
  * driver's rows-only check and are covered by ScalaTest specs.
  */
object SparkEntry {

  private def all: Map[String, Q] =
    Parity.defs ++ Windows.defs ++ EventsQ.defs ++ Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_pricing_summary").df(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.df }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
