package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named query: Spark-side DataFrame builder + (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet
  * tables. Queries without an oracle get a weaker rows-only check.
  */
final case class Q(
    df: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryUtil {
  /** Read one driver-generated table (TESTDATA.md layout).
    *
    * The oracle data's timestamp spelling is out of our control and
    * has changed across driver regenerations — it has been parquet
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects; read
    * as a raw nanos long) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark 4 infers as TIMESTAMP_NTZ, breaking every
    * `unix_millis`/timezone-aware call downstream). Normalize both
    * shapes to a plain microsecond TIMESTAMP here, at the read
    * boundary: the session TZ is UTC everywhere in this library, so
    * NTZ→TIMESTAMP is value-preserving, and DuckDB's TIMESTAMP is µs
    * wall-clock too — the oracle sees identical values. */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = {
      if (name == "events")
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Infer µs-no-UTC-flag as plain TIMESTAMP at the scan (Spark-3
      // behavior) rather than casting after the read — a post-read
      // cast would sit between timestamp predicates and the parquet
      // scan and defeat min/max + filter pushdown on ts columns.
      s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      s.read.parquet(s"$dir/$name.parquet")
    }
    normalizeTimestamps(
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df)
  }

  /** The streaming twin of [[tbl]]: the same table as an unbounded
    * `readStream` source with the same timestamp normalization.
    * readStream needs an explicit schema, which must match the FILE
    * spelling (nanos-as-long / NTZ-as-timestamp under the same two
    * confs tbl sets), so the schema comes from a batch metadata read
    * of the same path — footer-only, no data scan. */
  def tblStream(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val path = s"$dir/$name.parquet"
    // The driver writes each table as ONE parquet FILE. FileStreamSource
    // force-sets basePath to the path itself whenever the path is not a
    // glob — and a file basePath is rejected ("must be a directory") —
    // so spell the file as the single-alternative glob {name.parquet}
    // (matches exactly the same file, suppresses the override) and pass
    // the parent dir as basePath. A scale-up dir that spells the table
    // as a DIRECTORY of part files takes the plain-path branch, where
    // the override is harmless.
    val single = new java.io.File(path).isFile
    val rs = s.readStream.schema(s.read.parquet(path).schema)
    val df = if (single)
      rs.option("basePath", dir).parquet(s"$dir/{$name.parquet}")
    else rs.parquet(path)
    normalizeTimestamps(
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df)
  }

  /** Cast every TIMESTAMP_NTZ column to TIMESTAMP. Semantics-
    * preserving under the UTC session TZ; no-op when the schema has
    * none (the common case), so no plan overhead. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.withColumns(
      ntz.map(f => f.name -> col(f.name).cast(TimestampType)).toMap)
  }

  /** Exact-sum trick for money columns: double sums are
    * order-sensitive at the ulp level, so a parallel Spark sum and a
    * serial DuckDB sum can differ in the last bits and break a hash
    * compare. Converting 2-decimal money to integer cents first makes
    * the aggregation exact and order-independent on both engines
    * (sums stay far below 2^53). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Same for 4-decimal products like extendedprice*(1-discount). */
  def cents4(c: Column): Column = round(c * 10000, 0).cast("long")

  /** Back to a double amount; exact integer / constant is
    * deterministic IEEE division on both engines. */
  def money(c: Column): Column = c.cast("double") / 100.0
  def money4(c: Column): Column = c.cast("double") / 10000.0

  /** DuckDB replay of one polynomial RollingHash family over a string
    * expression. */
  def oPoly(e: String, mult: Long, mod: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, length($e)+1),
       |      i -> CAST(ascii(substr($e, CAST(i AS INT), 1)) AS BIGINT))),
       |    (a, c) -> (a*$mult + c) % $mod)""".stripMargin

  /** DuckDB twin of TextAnalysis.portableHash60 — two combined
    * families; collision-safe join/tie-break key. */
  def oPoly60(e: String): String =
    s"(${oPoly(e, 31L, 1000000007L)} * 1073741824 + ${oPoly(e, 37L, 998244353L)})"

  /** DuckDB-side spellings of the same tricks (sum of BIGINT is
    * HUGEINT in DuckDB, hence the outer cast). */
  val oCents = "CAST(round(%s*100) AS BIGINT)"
  def oSumCents(e: String): String =
    s"CAST(sum(CAST(round(($e)*100) AS BIGINT)) AS DOUBLE)/100.0"
  def oSumCents4(e: String): String =
    s"CAST(sum(CAST(round(($e)*10000) AS BIGINT)) AS DOUBLE)/10000.0"
}
