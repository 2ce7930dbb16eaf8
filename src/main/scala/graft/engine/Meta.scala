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
  * (`/root/reference/src/meta/initial.rs:423-680`). Each generator
  * returns (schema, driver-local rows): catalog tables are
  * catalog-scale by construction, so they are built AND persisted on
  * the driver ([[DriverParquet]]) — a Spark write job per tiny table
  * was the dominant wall of every engine-lifecycle battery entry. */
object InfoSchema {
  import Meta._

  private def strings(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  private def field(name: String, long: Boolean): StructField =
    if (long) StructField(name, LongType, nullable = false)
    else StructField(name, StringType, nullable = true)

  val schemataSchema: StructType = strings("catalog_name", "schema_name",
    "default_character_set_name", "default_collation_name")

  def schemata(schemas: Seq[String]): Seq[Seq[Any]] =
    schemas.sorted
      .map(n => Seq(Catalog, n, "utf8mb4", "utf8mb4_0900_ai_ci"))

  val tablesSchema: StructType = StructType(Seq(
    field("table_catalog", long = false), field("table_schema", long = false),
    field("table_name", long = false), field("table_type", long = false),
    field("engine", long = false), field("data_version", long = true),
    field("location", long = false)))

  def tables(defs: Seq[TableDef],
      views: Seq[(String, String)] = Nil): Seq[Seq[Any]] =
    defs.sortBy(t => (t.schema, t.name))
      .map(t => Seq[Any](Catalog, t.schema, t.name, "BASE TABLE",
        // managed format round-trips through this column (load()
        // strips the external_ prefix): parquet for COW tables, kv
        // for managed LSM tables
        if (t.external) s"external_${t.format}" else t.format, t.version,
        t.location.getOrElse(""))) ++
      views.sorted.map { case (vs, vn) =>
        Seq[Any](Catalog, vs, vn, "VIEW", "VIEW", 0L, "")
      }

  val viewsSchema: StructType = strings("table_catalog", "table_schema",
    "table_name", "view_definition")

  /** Persisted view definitions — MySQL's information_schema.views
    * shape (definition text only; the engine re-analyzes per read). */
  def views(vs: Seq[(String, String, String)]): Seq[Seq[Any]] =
    vs.sortBy(v => (v._1, v._2))
      .map { case (sc, n, d) => Seq[Any](Catalog, sc, n, d) }

  val columnsSchema: StructType = StructType(Seq(
    field("table_catalog", long = false), field("table_schema", long = false),
    field("table_name", long = false), field("column_name", long = false),
    field("ordinal_position", long = true), field("is_nullable", long = false),
    field("data_type", long = false), field("store_id", long = true)))

  def columns(defs: Seq[TableDef]): Seq[Seq[Any]] =
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.columns.map(c => Seq[Any](Catalog, t.schema, t.name, c.name,
        c.ordinal.toLong, if (c.nullable) "YES" else "NO", c.sqlType,
        c.storeId.toLong))
    }

  val statisticsSchema: StructType = StructType(Seq(
    field("table_catalog", long = false), field("table_schema", long = false),
    field("table_name", long = false), field("non_unique", long = true),
    field("index_name", long = false), field("seq_in_index", long = true),
    field("column_name", long = false)))

  def statistics(defs: Seq[TableDef]): Seq[Seq[Any]] =
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.flatMap { case (idx, cols) =>
        cols.zipWithIndex.map { case (c, i) =>
          Seq[Any](Catalog, t.schema, t.name, 0L, idx, (i + 1).toLong, c)
        }
      }
    }

  val tableConstraintsSchema: StructType = strings("constraint_catalog",
    "constraint_schema", "constraint_name", "table_schema", "table_name",
    "constraint_type")

  def tableConstraints(defs: Seq[TableDef]): Seq[Seq[Any]] =
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.map { case (idx, _) =>
        Seq[Any](Catalog, t.schema, idx, t.schema, t.name,
          if (idx == "PRIMARY") "PRIMARY KEY" else "UNIQUE")
      }
    }

  /** Always-empty constraint tables the reference materializes for
    * client compatibility (`/root/reference/src/datafusion_impl/
    * catalog/information_schema.rs:135-166` make_check_constraints /
    * make_referential_constraints) — the engine supports neither
    * CHECK nor FOREIGN KEY, but tools expect the tables to exist. */
  val checkConstraintsSchema: StructType = strings("constraint_catalog",
    "constraint_schema", "constraint_name", "check_clause")

  val referentialConstraintsSchema: StructType = strings(
    "constraint_catalog", "constraint_schema", "constraint_name",
    "unique_constraint_catalog", "unique_constraint_schema",
    "unique_constraint_name", "match_option", "update_rule",
    "delete_rule", "table_name", "referenced_table_name")

  val keyColumnUsageSchema: StructType = StructType(Seq(
    field("constraint_catalog", long = false),
    field("constraint_schema", long = false),
    field("constraint_name", long = false),
    field("table_schema", long = false), field("table_name", long = false),
    field("column_name", long = false),
    field("ordinal_position", long = true)))

  def keyColumnUsage(defs: Seq[TableDef]): Seq[Seq[Any]] =
    defs.sortBy(t => (t.schema, t.name)).flatMap { t =>
      t.allConstraints.flatMap { case (idx, cols) =>
        cols.zipWithIndex.map { case (c, i) =>
          Seq[Any](Catalog, t.schema, idx, t.schema, t.name, c,
            (i + 1).toLong)
        }
      }
    }

  /** The `dual` pseudo-table the reference injects for FROM-less
    * selects (`execution.rs:167-174`,
    * `datafusion_impl/catalog/information_schema.rs:115-166`). */
  def dual(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq("x").toDF("dummy")
  }
}
