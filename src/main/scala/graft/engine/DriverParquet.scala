package graft.engine

import java.io.File

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side parquet writer for CATALOG-SCALE tables (info-schema
  * images, bootstrap seed rows): a handful of driver-resident rows
  * per write, for which a full Spark write job is two orders of
  * magnitude of pure overhead. Each info-schema flush previously ran
  * `df.coalesce(1).write.parquet(...)` — one job + commit protocol +
  * catalog re-registration per tiny table, measured at ~0.15–0.25s
  * each; a DDL statement flushes five of them and an engine bootstrap
  * nine, which made catalog writes the dominant wall of every
  * engine-lifecycle battery entry. This writer emits the SAME bytes
  * Spark's executor path would (ParquetWriteSupport over
  * InternalRows, snappy, Spark schema metadata — so `spark.read
  * .parquet` / `load()` / external readers see an identical table)
  * in ~5ms, with no job.
  *
  * Durability shape matches the replaced path: Spark's overwrite
  * also deleted the directory before the write job committed, so the
  * crash window (directory missing until the new image lands) is
  * unchanged — here it is narrower, a stage-dir rename instead of a
  * job. Only flat STRING/LONG/DOUBLE schemas are supported — the
  * catalog surface — anything else is a programming error and
  * throws. */
private[engine] object DriverParquet {

  private class Builder(path: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
    override def self(): Builder = this
  }

  private def toInternal(schema: StructType, row: Seq[Any]): InternalRow = {
    require(row.length == schema.length,
      s"row arity ${row.length} != schema arity ${schema.length}")
    val vals = schema.fields.zip(row).map {
      case (_, null) => null
      case (f, v) => f.dataType match {
        case StringType => UTF8String.fromString(v.toString)
        case LongType => v match {
          case l: Long => java.lang.Long.valueOf(l)
          case i: Int => java.lang.Long.valueOf(i.toLong)
          case s: String => java.lang.Long.valueOf(s.trim.toLong)
          case d: Double => java.lang.Long.valueOf(d.toLong)
          case other => throw new IllegalArgumentException(
            s"cannot cast $other to LONG for ${f.name}")
        }
        case DoubleType => v match {
          case d: Double => java.lang.Double.valueOf(d)
          case l: Long => java.lang.Double.valueOf(l.toDouble)
          case i: Int => java.lang.Double.valueOf(i.toDouble)
          case s: String => java.lang.Double.valueOf(s.trim.toDouble)
          case other => throw new IllegalArgumentException(
            s"cannot cast $other to DOUBLE for ${f.name}")
        }
        case other => throw new IllegalArgumentException(
          s"DriverParquet supports flat string/long/double catalog " +
            s"schemas only, got $other for ${f.name}")
      }
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
  }

  /** Replace `dir` with a single-file parquet table of `rows`.
    * Written to a stage directory first, then swapped in (delete old
    * + rename stage) — the same not-quite-atomic overwrite window the
    * Spark write path had, minus the job. */
  def overwrite(spark: SparkSession, dir: String, schema: StructType,
      rows: Seq[Seq[Any]]): Unit = {
    val target = new File(dir)
    val parent = target.getParentFile
    if (parent != null) parent.mkdirs()
    // GC any stage dir a previous crash left behind
    Option(if (parent == null) null else parent.listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isDirectory &&
        f.getName.startsWith(target.getName + ".stage-"))
      .foreach(deleteRecursively)
    val uuid = java.util.UUID.randomUUID.toString
    val stage = new File(dir + ".stage-" + uuid)
    stage.mkdirs()
    val file = new File(stage, s"part-00000-$uuid.snappy.parquet")
    // ParquetWriteSupport.init asserts the write-path keys that
    // ParquetFileFormat.prepareWrite normally injects into the job
    // conf — set them from the session (falling back to the Spark
    // defaults; none affect the flat string/long/double catalog
    // schemas, but the asserts require their presence)
    val conf = spark.sessionState.newHadoopConf()
    def fill(key: String, default: String): Unit =
      if (conf.get(key) == null)
        conf.set(key, spark.conf.getOption(key).getOrElse(default))
    fill("spark.sql.parquet.writeLegacyFormat", "false")
    fill("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    fill("spark.sql.parquet.datetimeRebaseModeInWrite", "EXCEPTION")
    fill("spark.sql.parquet.int96RebaseModeInWrite", "EXCEPTION")
    fill("spark.sql.parquet.fieldId.write.enabled", "true")
    fill("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    fill("spark.sql.legacy.parquet.nanosAsLong", "false")
    fill("spark.sql.parquet.fieldId.read.enabled", "false")
    fill("spark.sql.caseSensitive", "false")
    fill("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    ParquetWriteSupport.setSchema(schema, conf)
    val writer = new Builder(new Path(file.getAbsolutePath))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try rows.foreach(r => writer.write(toInternal(schema, r)))
    finally writer.close()
    // the committer's _SUCCESS marker, matching the Spark write path —
    // the crash-reconcile pass treats a version dir without it as an
    // uncommitted partial
    new File(stage, "_SUCCESS").createNewFile()
    deleteRecursively(target)
    if (!stage.renameTo(target))
      throw Errors.generic(
        s"could not swap catalog stage dir into place: $stage -> $target")
  }
}
