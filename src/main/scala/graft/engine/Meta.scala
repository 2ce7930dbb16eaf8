package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Catalog metadata model, mirroring the reference's `MetaData` maps
  * (`/root/reference/src/meta/meta_def.rs`, `src/meta/data.rs:11-77`):
  * schemas, tables with ordered columns carrying a stable `store_id`
  * that survives ADD/DROP COLUMN (`meta_def.rs` sql_column_list), and
  * PRIMARY/UNIQUE constraints. The declared type surface is the
  * reference's {INT, FLOAT, CHAR} → {LongType, DoubleType,
  * StringType} (`meta_util.rs:548-563`).
  */
final case class ColumnDef(name: String, sqlType: String,
    nullable: Boolean, storeId: Int, ordinal: Int) {
  def sparkType: DataType = sqlType match {
    // the reference's declared-type surface (meta_util.rs:548-563)…
    case "int" => LongType
    case "float" => DoubleType
    case "char" => StringType
    // …plus arbitrary Spark DDL types for EXTERNAL parquet tables
    case other =>
      try org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(other)
      catch { case _: Exception =>
        throw Errors.generic(s"not support data type: $other") }
  }
}

final case class TableDef(schema: String, name: String,
    columns: Seq[ColumnDef], primaryKey: Seq[String],
    uniques: Seq[(String, Seq[String])], nextStoreId: Int,
    version: Long, location: Option[String] = None,
    format: String = "parquet") {

  /** External tables wrap pre-existing files (parquet/csv/json) in
    * place: queryable like any table, but read-only (no rowid, no
    * DML, no COW). */
  def external: Boolean = location.isDefined

  def qualified: String = s"$schema.$name"

  /** Physical schema: implicit engine-generated `rowid` first
    * (`meta_def.rs:385-395`), then user columns. Everything but rowid
    * is physically nullable — the reference stores absent cells as
    * missing keys and reads them back as NULL regardless of the
    * declared nullability (`add_column.rs:34-80`). */
  def fullSchema: StructType =
    if (external || format == "kv") visibleSchema // kv: the key IS the identity, no rowid
    else StructType(
      StructField(Meta.RowId, StringType, nullable = false) +:
        columns.map(c => StructField(c.name, c.sparkType, nullable = true)))

  /** SQL-visible schema: rowid hidden from `SELECT *`
    * (`core_util.rs:451-462` projection_has_rowid). */
  def visibleSchema: StructType =
    StructType(columns.map(c => StructField(c.name, c.sparkType, nullable = true)))

  /** All declared uniqueness constraints, PRIMARY first. */
  def allConstraints: Seq[(String, Seq[String])] =
    (if (primaryKey.nonEmpty) Seq("PRIMARY" -> primaryKey) else Nil) ++ uniques

  /** Reference-format DDL reconstruction
    * (`show_create_table.rs:49-278`; golden at
    * `src/test/base_sql.rs:264-271`). */
  def createTableSql: String = if (external) {
    s"CREATE EXTERNAL TABLE $name USING ${format.toUpperCase} LOCATION '${location.get}'"
  } else {
    val cols = columns.map { c =>
      val nullSql = if (c.nullable) "CONSTRAINT nullable NULL"
        else "CONSTRAINT nullable NOT NULL"
      s"${c.name} ${c.sqlType.toUpperCase} $nullSql"
    }
    val cons = allConstraints.map { case (n, cs) =>
      val kind = if (n == "PRIMARY") "PRIMARY KEY" else "UNIQUE"
      s"CONSTRAINT $n $kind (${cs.mkString(", ")})"
    }
    val usingSql = if (format == "kv") " USING KV" else ""
    s"CREATE TABLE $name (${(cols ++ cons).mkString(", ")})$usingSql"
  }
}

object Meta {
  val RowId = "rowid"
  val Catalog = "def"
  val InfoSchemaDb = "information_schema"
  val BuiltinSchemas = Seq("mysql", "performance_schema")
  val Version = "ebikespark-0.1.0"

  /** Bootstrap global variables
    * (`/root/reference/src/meta/initial.rs:1401-1505`). */
  val globalVariables: Seq[(String, String)] = Seq(
    "auto_increment_increment" -> "0",
    "lower_case_table_names" -> "1",
    "transaction_isolation" -> "REPEATABLE-READ",
    "transaction_read_only" -> "0",
    "max_allowed_packet" -> "67108864",
    "system_time_zone" -> "CST",
    "time_zone" -> "SYSTEM")

  def parseSqlType(raw: String): String = {
    val t = raw.trim.toLowerCase.takeWhile(c => c.isLetter)
    t match {
      case "int" | "integer" => "int"
      case "float" => "float"
      case "char" => "char"
      case other => throw Errors.generic(s"not support data type: $other")
    }
  }
}

/** Generators for the information_schema tables — the catalog IS a
  * set of queryable tables, like the reference
  * (`/root/reference/src/meta/initial.rs:423-680`). */
object InfoSchema {
  import Meta._

  def schemata(s: SparkSession, schemas: Seq[String]): DataFrame = {
    import s.implicits._
    schemas.sorted
      .map(n => (Catalog, n, "utf8mb4", "utf8mb4_0900_ai_ci"))
      .toDF("catalog_name", "schema_name",
        "default_character_set_name", "default_collation_name")
  }

  def tables(s: SparkSession, defs: Seq[TableDef],
      views: Seq[(String, String)] = Nil): DataFrame = {
    import s.implicits._
    (defs.sortBy(t => (t.schema, t.name))
      .map(t => (Catalog, t.schema, t.name, "BASE TABLE",
        // managed format round-trips through this column (load()
        // strips the external_ prefix): parquet for COW tables, kv
        // for managed LSM tables
        if (t.external) s"external_${t.format}" else t.format, t.version,
        t.location.getOrElse(""))) ++
      views.sorted.map { case (vs, vn) =>
        (Catalog, vs, vn, "VIEW", "VIEW", 0L, "")
      })
      .toDF("table_catalog", "table_schema", "table_name",
        "table_type", "engine", "data_version", "location")
  }

  /** Persisted view definitions — MySQL's information_schema.views
    * shape (definition text only; the engine re-analyzes per read). */
  def views(s: SparkSession, vs: Seq[(String, String, String)]): DataFrame = {
    import s.implicits._
    vs.sortBy(v => (v._1, v._2))
      .map { case (sc, n, d) => (Catalog, sc, n, d) }
      .toDF("table_catalog", "table_schema", "table_name",
        "view_definition")
  }

  def columns(s: SparkSession, defs: Seq[TableDef]): DataFrame = {
    import s.implicits._
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.columns.map(c => (Catalog, t.schema, t.name, c.name,
        c.ordinal.toLong, if (c.nullable) "YES" else "NO", c.sqlType,
        c.storeId.toLong))
    }.toDF("table_catalog", "table_schema", "table_name", "column_name",
      "ordinal_position", "is_nullable", "data_type", "store_id")
  }

  def statistics(s: SparkSession, defs: Seq[TableDef]): DataFrame = {
    import s.implicits._
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.flatMap { case (idx, cols) =>
        cols.zipWithIndex.map { case (c, i) =>
          (Catalog, t.schema, t.name, 0L, idx, (i + 1).toLong, c)
        }
      }
    }.toDF("table_catalog", "table_schema", "table_name", "non_unique",
      "index_name", "seq_in_index", "column_name")
  }

  def tableConstraints(s: SparkSession, defs: Seq[TableDef]): DataFrame = {
    import s.implicits._
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.map { case (idx, _) =>
        (Catalog, t.schema, idx, t.schema, t.name,
          if (idx == "PRIMARY") "PRIMARY KEY" else "UNIQUE")
      }
    }.toDF("constraint_catalog", "constraint_schema", "constraint_name",
      "table_schema", "table_name", "constraint_type")
  }

  /** Always-empty constraint tables the reference materializes for
    * client compatibility (`/root/reference/src/datafusion_impl/
    * catalog/information_schema.rs:135-166` make_check_constraints /
    * make_referential_constraints) — the engine supports neither
    * CHECK nor FOREIGN KEY, but tools expect the tables to exist. */
  def checkConstraints(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("constraint_catalog", "constraint_schema",
        "constraint_name", "check_clause")
        .map(StructField(_, StringType, nullable = true))))

  def referentialConstraints(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq("constraint_catalog", "constraint_schema",
        "constraint_name", "unique_constraint_catalog",
        "unique_constraint_schema", "unique_constraint_name",
        "match_option", "update_rule", "delete_rule", "table_name",
        "referenced_table_name")
        .map(StructField(_, StringType, nullable = true))))

  def keyColumnUsage(s: SparkSession, defs: Seq[TableDef]): DataFrame = {
    import s.implicits._
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.flatMap { case (idx, cols) =>
        cols.zipWithIndex.map { case (c, i) =>
          (Catalog, t.schema, idx, t.schema, t.name, c, (i + 1).toLong)
        }
      }
    }.toDF("constraint_catalog", "constraint_schema", "constraint_name",
      "table_schema", "table_name", "column_name", "ordinal_position")
  }

  /** The `dual` pseudo-table the reference injects for FROM-less
    * selects (`execution.rs:167-174`,
    * `datafusion_impl/catalog/information_schema.rs:115-166`). */
  def dual(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq("x").toDF("dummy")
  }
}
