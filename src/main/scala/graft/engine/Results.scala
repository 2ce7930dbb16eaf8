package graft.engine

import org.apache.spark.sql.DataFrame

/** Result of one SQL statement, mirroring the reference's
  * `CoreOutput` (ResultSet | FinalCount) shape
  * (`/root/reference/src/core/output.rs`, used throughout
  * `src/test/base_sql.rs`). */
sealed trait GraftResult
final case class ResultSet(df: DataFrame) extends GraftResult
final case class AffectedRows(count: Long) extends GraftResult

/** MySQL-coded engine error, matching the reference's error surface
  * (`/root/reference/src/meta/meta_util.rs`,
  * `src/mysql/error.rs`): 1007 schema exists, 1046 no schema
  * selected, 1049 unknown schema, 1050 table exists, 1051 unknown
  * table on DROP, 1062 duplicate entry, 1105 generic, 1146 table
  * doesn't exist. */
final case class GraftException(code: Int, msg: String)
    extends RuntimeException(s"ERROR $code: $msg")

object Errors {
  def dbExists(name: String) =
    GraftException(1007, s"Can't create database '$name'; database exists")
  def noSchemaSelected =
    GraftException(1046, "No database selected")
  def unknownDb(name: String) =
    GraftException(1049, s"Unknown database '$name'")
  def tableExists(name: String) =
    GraftException(1050, s"Table '$name' already exists")
  def unknownTable(name: String) =
    GraftException(1051, s"Unknown table '$name'")
  def duplicateEntry(value: String, key: String) =
    GraftException(1062, s"Duplicate entry '$value' for key '$key'")
  def generic(msg: String) =
    GraftException(1105, msg)
  def noSuchTable(schema: String, name: String) =
    GraftException(1146, s"Table '$schema.$name' doesn't exist")
  def unknownColumn(col: String, ctx: String) =
    GraftException(1054, s"Unknown column '$col' in '$ctx'")
}
