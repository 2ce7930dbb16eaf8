package graft.sources

import java.util
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table over an ordered in-memory KV store, built to
  * demonstrate the reference's index-range-scan semantics
  * (`/root/reference/src/store/reader/reader_util.rs:263-415`
  * `get_seek_prefix` → `SeekType::{FullTableScan, UsingTheIndex}`)
  * with Spark-native machinery: Catalyst pushes key predicates through
  * `SupportsPushDownFilters`, the scan converts them to a key range
  * and reads ONLY that slice of the ordered store, and the matched
  * range splits into parallel input partitions (where the reference's
  * `SledExec` was pinned to one partition, `physical_plan/sled.rs:88`).
  * Projection pushdown (`SupportsPushDownRequiredColumns`) mirrors the
  * reference reader's projected-column materialization
  * (`sled.rs:51-60`).
  *
  * Schema is the reference's own table shape (int key + char value):
  * `k BIGINT, v STRING`. Two backings: the in-memory [[KvStore]]
  * registry (demo/spec seam, rows ship inside tasks) and the durable
  * [[KvSegment]] file (`option("path", ...)`) — the persistent
  * analogue of the reference's sled store, where tasks carry only
  * (path, row range) and executors pread their own slice, which is
  * the shape that survives a real cluster.
  */
object KvStore {
  /** name → sorted key array + value lookup (immutable once registered).
    * Driver-JVM registry: only `planInputPartitions` (driver-side)
    * reads it — matched slices ship inside each [[KvPartition]], so
    * executors never dereference this singleton and the connector is
    * cluster-safe. A production deployment would replace registration
    * with connection options to a real ordered KV engine. */
  private val stores = TrieMap.empty[String, (Array[Long], Map[Long, String])]

  /** Telemetry mirroring the reference's SeekType: what the last scan
    * of each store did — range-pruned or full — and how many candidate
    * rows it planned (for multi-segment tables this counts PRE-shadow
    * candidates: the newest-wins merge happens executor-side).
    * Spec-facing; harmless single-JVM state. */
  val lastScan = TrieMap.empty[String, (String, Long)]

  def register(name: String, rows: Seq[(Long, String)]): Unit = {
    val sorted = rows.map(_._1).distinct.sorted.toArray
    stores(name) = (sorted, rows.toMap)
  }

  def apply(name: String): (Array[Long], Map[Long, String]) = stores(name)

  val schema: StructType = new StructType()
    .add("k", LongType, nullable = false)
    .add("v", StringType, nullable = true)
}

/** Where a KV table's rows live. The in-memory registry is the
  * original demo seam; [[FileBacking]] is the durable path — a
  * [[KvSegment]] file on shared storage that every executor opens
  * itself, so scan tasks carry only (path, row range) and nothing is
  * materialized on the driver. */
sealed trait KvBacking { def label: String }
final case class MemBacking(name: String) extends KvBacking {
  def label: String = name
}
final case class FileBacking(path: String) extends KvBacking {
  def label: String = path
}
/** Multi-segment table directory ([[KvSegment.listSegments]]): the
  * growth path — ingest appends numbered write-once segments, reads
  * merge them newest-wins at plan time, compaction folds them back to
  * one. `option("dir", ...)`. */
final case class DirBacking(dir: String) extends KvBacking {
  def label: String = dir
}

class KvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.schema
  /** The engine catalog registers KV tables with an explicit schema
    * (the catalog owns table metadata); the schema is fixed anyway,
    * so accept and ignore it. */
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val backing = (Option(properties.get("dir")),
        Option(properties.get("path"))) match {
      case (Some(d), _) => DirBacking(d)
      case (None, Some(p)) => FileBacking(p)
      case _ => MemBacking(properties.get("name"))
    }
    new KvTable(backing)
  }
}

class KvTable(backing: KvBacking) extends Table with SupportsRead {
  override def name(): String = s"graft-kv(${backing.label})"
  override def schema(): StructType = KvStore.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(backing)
}

/** Folds pushed key predicates into a [lo, hi] range — the analogue of
  * the reference's per-column range intersection
  * (`reader_util.rs:102-260` create_column_range). Everything it can't
  * fold stays a residual filter for Spark to evaluate above the scan. */
class KvScanBuilder(backing: KvBacking) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var projection: StructType = KvStore.schema
  private var residualKept = false
  private var aggTokens: Array[String] = Array.empty

  /** COUNT/MIN/MAX over the pushed key range answered from the ordered
    * store's own structure at PLAN time — the scan ships a single
    * precomputed row and reads no data at all (the index-only
    * aggregate every ordered KV store owes its optimizer). Supported
    * exactly where metadata is exact: COUNT(*) / COUNT(k) on the
    * in-memory registry and on a single segment (unique sorted keys,
    * count = clipped index width); MIN(k)/MAX(k) everywhere —
    * including multi-segment directories, where key EXISTENCE is
    * shadow-proof (a newest-wins shadow carries the same key), so the
    * extremes are per-segment boundary reads. COUNT on a
    * multi-segment directory is DECLINED (visible count needs the
    * newest-wins merge) and falls back to the normal scan + agg. */
  private def translate(agg: org.apache.spark.sql.connector.expressions
      .aggregate.Aggregation): Option[Array[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    // an EMPTY aggregate list happens when a wrapping query prunes
    // every inner aggregate away (e.g. `df.agg(...).count()`); pushing
    // it would hand Spark a zero-column scan it rejects — decline
    if (agg.groupByExpressions.nonEmpty || residualKept ||
      agg.aggregateExpressions().isEmpty) return None
    def keyCol(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case n: NamedReference =>
        n.fieldNames.length == 1 && n.fieldNames()(0) == "k"
      case _ => false
    }
    val isDir = backing.isInstanceOf[DirBacking]
    val exprs = agg.aggregateExpressions()
    val out = new Array[String](exprs.length)
    var i = 0
    while (i < exprs.length) {
      exprs(i) match {
        case _: CountStar if !isDir => out(i) = "cnt"
        case c: Count if !c.isDistinct && keyCol(c.column) && !isDir =>
          out(i) = "cnt"
        case m: Min if keyCol(m.column) => out(i) = "min"
        case m: Max if keyCol(m.column) => out(i) = "max"
        case _ => return None
      }
      i += 1
    }
    Some(out)
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = translate(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = translate(agg) match {
    case Some(ts) => aggTokens = ts; true
    case None => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("k", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("k", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("k", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("k", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("k", _: java.lang.Long | _: java.lang.Integer) => true
      case IsNotNull("k") => true
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.longValue()
    }
    // Strict bounds at the Long extremes can match no row at all; a
    // naive `v + 1` / `v - 1` would wrap around and silently widen the
    // scan to the full table while reporting the filter as pushed.
    // Saturate to a guaranteed-empty range (lo > hi) instead.
    def forceEmpty(): Unit = { lo = Long.MaxValue; hi = Long.MinValue }
    accepted.foreach {
      case EqualTo("k", v) => lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      case GreaterThan("k", v) =>
        if (num(v) == Long.MaxValue) forceEmpty() else lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual("k", v) => lo = math.max(lo, num(v))
      case LessThan("k", v) =>
        if (num(v) == Long.MinValue) forceEmpty() else hi = math.min(hi, num(v) - 1)
      case LessThanOrEqual("k", v) => hi = math.min(hi, num(v))
      case IsNotNull("k") => ()
      case _ => ()
    }
    pushed = accepted
    residualKept = residual.nonEmpty
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    projection = requiredSchema

  override def build(): Scan =
    new KvScan(backing, lo, hi, projection, aggTokens)
}

class KvScan(backing: KvBacking, lo: Long, hi: Long, projection: StructType,
    aggTokens: Array[String] = Array.empty)
    extends Scan with Batch {
  private def aggSchema: StructType =
    StructType(aggTokens.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.types.StructField(s"${t}_$i", LongType,
        nullable = t != "cnt")
    })
  override def readSchema(): StructType =
    if (aggTokens.nonEmpty) aggSchema else projection
  override def toBatch: Batch = this
  override def description(): String = {
    val kind = if (lo == Long.MinValue && hi == Long.MaxValue)
      "FullTableScan" else s"RangeScan[$lo,$hi]"
    val aggNote = if (aggTokens.isEmpty) "" else
      aggTokens.map {
        case "cnt" => "COUNT"; case "min" => "MIN(k)"; case "max" => "MAX(k)"
      }.mkString(" PushedAggregates: [", ", ", "]")
    s"graft-kv ${backing.label} $kind cols=${projection.fieldNames.mkString(",")}$aggNote"
  }

  /** Plan-time evaluation of pushed COUNT/MIN/MAX: exact row indices
    * from the same fence-clip the row scan uses (O(1) I/O per
    * segment), boundary keys from at most two single-row preads. The
    * single result row ships in the one input partition; executors
    * read NOTHING. */
  private def aggRow(): Array[java.lang.Long] = {
    val (cnt, mn, mx): (Long, java.lang.Long, java.lang.Long) =
      backing match {
        case MemBacking(name) =>
          val keys = KvStore(name)._1
          val f = lowerBound(keys, 0, keys.length, lo)
          val u = upperBound(keys, 0, keys.length, hi)
          if (u <= f) (0L, null, null)
          else ((u - f).toLong, java.lang.Long.valueOf(keys(f)),
            java.lang.Long.valueOf(keys(u - 1)))
        case FileBacking(path) =>
          val fi = KvSegment.fenceIndex(path)
          val (f, u) = clipRange(path, fi)
          if (u <= f) (0L, null, null)
          else ((u - f).toLong,
            java.lang.Long.valueOf(KvSegment.readKeys(path, f, f + 1)(0)),
            java.lang.Long.valueOf(KvSegment.readKeys(path, u - 1, u)(0)))
        case DirBacking(dir) =>
          // min/max only (translate() declines counts here): key
          // existence is shadow-proof — a newest-wins shadow carries
          // the same key — so extremes are per-segment boundary reads
          var mn0: java.lang.Long = null
          var mx0: java.lang.Long = null
          KvSegment.listSegments(dir).foreach { p =>
            val fi = KvSegment.fenceIndex(p)
            val (f, u) = clipRange(p, fi)
            if (u > f) {
              val lo0 = KvSegment.readKeys(p, f, f + 1)(0)
              val hi0 = KvSegment.readKeys(p, u - 1, u)(0)
              if (mn0 == null || lo0 < mn0.longValue()) mn0 = lo0
              if (mx0 == null || hi0 > mx0.longValue()) mx0 = hi0
            }
          }
          (0L, mn0, mx0)
      }
    aggTokens.map {
      case "cnt" => java.lang.Long.valueOf(cnt)
      case "min" => mn
      case "max" => mx
    }
  }

  /** Resolve the pushed range to exact row indices and split the
    * matched slice into parallel partitions — range pruning AND scan
    * parallelism, the two things the reference leaf lacked. Durable
    * backings plan on the segment's FENCE INDEX ([[KvSegment.
    * fenceIndex]], O(rows/4096) driver memory) plus preads of at most
    * the two boundary blocks for exact clipping — the driver never
    * loads a key array, so planning state is O(blocks + segments) at
    * any table size. The in-memory registry keeps its key array by
    * design (it IS the table).
    *
    * Partition sizing: at least 4 slices for parallelism, and never
    * more than [[KvScan.MaxRowsPerPartition]] rows per slice, so one
    * task's serialized payload stays bounded however large the
    * matched range is. Shipping rows in the task is a demo-scope
    * ceiling of the in-memory backing only; durable tasks carry
    * (path, row range) and executors pread their own slice. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (aggTokens.nonEmpty) {
      KvStore.lastScan(backing.label) = ("AggPushdown", 0L)
      return Array(new KvAggPartition(aggRow()))
    }
    backing match {
      case DirBacking(dir) => return planSegmentMerge(dir)
      case _ => ()
    }
    val (from, until) = backing match {
      case MemBacking(name) =>
        val keys = KvStore(name)._1
        (lowerBound(keys, 0, keys.length, lo), upperBound(keys, 0, keys.length, hi))
      case FileBacking(path) =>
        clipRange(path, KvSegment.fenceIndex(path))
      case DirBacking(_) => throw new IllegalStateException("unreachable")
    }
    val n = math.max(0, until - from)
    KvStore.lastScan(backing.label) = (scanKind, n.toLong)
    if (n == 0) return Array.empty
    val step = sliceStep(n)
    backing match {
      case MemBacking(name) =>
        // Demo registry: rows ship inside the task (driver-materialized).
        val (keys, values) = KvStore(name)
        (from until until by step)
          .map { s =>
            val ks = keys.slice(s, math.min(s + step, until))
            new KvPartition(ks, ks.map(k => values.getOrElse(k, null))): InputPartition
          }
          .toArray
      case FileBacking(path) =>
        // Durable segment: a task carries only (path, row range) — the
        // production shape. Executors pread their own slice.
        (from until until by step)
          .map(s => new KvFilePartition(path, s, math.min(s + step, until)): InputPartition)
          .toArray
      case DirBacking(_) => throw new IllegalStateException("unreachable")
    }
  }

  private def scanKind: String =
    if (lo == Long.MinValue && hi == Long.MaxValue) "FullTableScan"
    else "UsingTheIndex"

  private def sliceStep(n: Int): Int = {
    val slices = math.max(math.min(4, n),
      (n + KvScan.MaxRowsPerPartition - 1) / KvScan.MaxRowsPerPartition)
    math.max(1, (n + slices - 1) / slices)
  }

  /** Exact row-index clip of the pushed [lo, hi] against one segment,
    * planning on fences: the fence array bounds the candidate blocks,
    * then a pread of at most the two BOUNDARY blocks (≤ 2 × 32 KB)
    * binary-searches the exact endpoints. O(log blocks) CPU, O(1)
    * I/O, zero retained state beyond the cached fences. */
  private def clipRange(path: String, fi: KvSegment.FenceIndex): (Int, Int) = {
    if (fi.n == 0 || lo > hi || fi.lastKey < lo || fi.firstKey > hi) return (0, 0)
    val bs = fi.blockSize
    val from =
      if (lo <= fi.firstKey) 0
      else {
        // lo > firstKey, so at least one block's first key is <= lo
        val b0 = upperBound(fi.fences, 0, fi.nBlocks, lo) - 1
        val ks = KvSegment.readKeys(path, b0 * bs, math.min((b0 + 1) * bs, fi.n))
        b0 * bs + lowerBound(ks, 0, ks.length, lo)
      }
    val until =
      if (hi >= fi.lastKey) fi.n
      else {
        // hi >= firstKey (checked above), so the candidate block exists
        val bE = upperBound(fi.fences, 0, fi.nBlocks, hi) - 1
        val ks = KvSegment.readKeys(path, bE * bs, math.min((bE + 1) * bs, fi.n))
        bE * bs + upperBound(ks, 0, ks.length, hi)
      }
    (from, math.max(from, until))
  }

  /** Block-aligned candidate row range of [spanLo, spanHi] in a
    * segment — fences only, NO preads. Used for shadow references:
    * a superset of the exact range is harmless (the executor's sorted
    * merge ignores non-matching keys), so boundary blocks are taken
    * whole. */
  private def blockRange(fi: KvSegment.FenceIndex, spanLo: Long,
      spanHi: Long): (Int, Int) = {
    if (fi.n == 0 || spanLo > spanHi || fi.lastKey < spanLo ||
      fi.firstKey > spanHi) return (0, 0)
    val b0 = math.max(0, upperBound(fi.fences, 0, fi.nBlocks, spanLo) - 1)
    val b1 = upperBound(fi.fences, 0, fi.nBlocks, spanHi)
    (b0 * fi.blockSize, math.min(b1 * fi.blockSize, fi.n))
  }

  /** Multi-segment planning: newest-wins visibility WITHOUT driver
    * key state. Each segment's pushed range is clipped exactly (fences
    * + boundary-block preads, same as single-segment); every partition
    * of a non-newest segment carries block-aligned SHADOW references
    * to the overlapping ranges of all newer segments. The executor
    * preads its own key slice, drops keys present in any shadow
    * stream via sorted two-pointer merges (O(rows + shadow rows), no
    * hashing, no boxing), and preads values only for the surviving
    * runs — so shadowed values are never read, and driver planning
    * state stays O(blocks + segments) however many keys the table
    * has.
    *
    * `lastScan` reports PRE-SHADOW candidate rows (the driver cannot
    * know the visible count without the merge — that now happens on
    * executors, where it scales). */
  private def planSegmentMerge(dir: String): Array[InputPartition] = {
    val segs = KvSegment.listSegments(dir)
    val clips = segs.map { p =>
      val fi = KvSegment.fenceIndex(p)
      (p, fi, clipRange(p, fi))
    }
    var total = 0L
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    clips.zipWithIndex.foreach { case ((path, fi, (from, until)), idx) =>
      val n = until - from
      if (n > 0) {
        total += n
        val newer = clips.drop(idx + 1)
        val step = sliceStep(n)
        (from until until by step).foreach { s =>
          val e = math.min(s + step, until)
          // Conservative key span of rows [s, e) straight from fences:
          // low = first key of s's block, high = first key of the block
          // after (e-1)'s (or the segment's last key). Superset spans
          // only widen shadow streams, never change the merge result.
          val spanLo = math.max(lo, fi.fences(math.min(s / fi.blockSize, fi.nBlocks - 1)))
          val hiBlock = (e - 1) / fi.blockSize + 1
          val spanHi = math.min(hi,
            if (hiBlock < fi.nBlocks) fi.fences(hiBlock) else fi.lastKey)
          val shadows = newer.flatMap { case (np, nfi, (nf, nu)) =>
            if (nu <= nf) None
            else {
              val (bf, bu) = blockRange(nfi, spanLo, spanHi)
              val f = math.max(bf, nf)
              val u = math.min(bu, nu)
              if (u > f) Some((np, f, u)) else None
            }
          }
          parts += new KvShadowedPartition(path, s, e,
            shadows.map(_._1).toArray, shadows.map(_._2).toArray,
            shadows.map(_._3).toArray)
        }
      }
    }
    KvStore.lastScan(backing.label) = (scanKind, total)
    parts.toArray
  }

  private def lowerBound(a: Array[Long], start: Int, end: Int, v: Long): Int = {
    var l = start; var r = end
    while (l < r) { val m = (l + r) >>> 1; if (a(m) < v) l = m + 1 else r = m }
    l
  }
  private def upperBound(a: Array[Long], start: Int, end: Int, v: Long): Int = {
    var l = start; var r = end
    while (l < r) { val m = (l + r) >>> 1; if (a(m) <= v) l = m + 1 else r = m }
    l
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(projection)
}

object KvScan {
  /** Cap on rows task-serialized per input partition: 64k × (8-byte
    * key + short value) keeps each task comfortably under Spark's
    * large-task warning threshold. */
  val MaxRowsPerPartition: Int = 65536
}

/** Self-contained slice of the matched range: keys plus their values,
  * serialized with the task. Readers need nothing from the driver.
  * A plain class, not a case class: array fields would make generated
  * equals/hashCode reference-based, which silently lies if partitions
  * are ever compared or deduped. */
final class KvPartition(val keys: Array[Long], val values: Array[String])
    extends InputPartition

/** Durable-segment task payload: nothing but the file path and the
  * row-index range this task owns. Serialized size is O(1) regardless
  * of range width — the cluster-scale property the in-memory demo
  * partition lacks. */
final class KvFilePartition(val path: String, val from: Int, val until: Int)
    extends InputPartition

/** Multi-segment task payload: one segment path, the candidate row
  * range this task owns, and block-aligned shadow references
  * (`shadowPaths(i)` rows `[shadowFrom(i), shadowUntil(i))`) into
  * every NEWER segment overlapping this range's key span. O(segments)
  * serialized size; the executor resolves exact newest-wins
  * visibility by merging sorted key streams. */
final class KvShadowedPartition(val path: String, val from: Int,
    val until: Int, val shadowPaths: Array[String],
    val shadowFrom: Array[Int], val shadowUntil: Array[Int])
    extends InputPartition

/** Pushed-aggregate payload: the SINGLE result row, already computed
  * at plan time from index metadata. Values align positionally with
  * the pushed aggregate expressions; a null is a NULL min/max of an
  * empty range. */
final class KvAggPartition(val values: Array[java.lang.Long])
    extends InputPartition

class KvReaderFactory(projection: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case ap: KvAggPartition =>
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow = InternalRow.fromSeq(
            ap.values.toSeq.map(v =>
              if (v == null) null else v.longValue(): Any))
          override def close(): Unit = ()
        }
      case kp: KvPartition =>
        rowsReader(kp.keys.length, i => kp.keys(i), i => kp.values(i))
      case fp: KvFilePartition =>
        // Executor-side open: no driver state touched.
        val slice = new KvSegment.SliceReader(fp.path, fp.from, fp.until)
        rowsReader(slice.size, i => slice.keys(i), i => slice.value(i))
      case sp: KvShadowedPartition =>
        // Newest-wins resolution, executor-side: pread own keys, drop
        // any key present in a newer segment's shadow stream (sorted
        // two-pointer merge, streamed in 64k-key chunks — O(1) extra
        // memory per stream, no hash set), then pread VALUES only for
        // the surviving contiguous runs. Shadowed values are never
        // read.
        val own = KvSegment.readKeys(sp.path, sp.from, sp.until)
        val shadowed = new Array[Boolean](own.length)
        var j = 0
        while (j < sp.shadowPaths.length) {
          var oi = 0
          var pos = sp.shadowFrom(j)
          val end = sp.shadowUntil(j)
          while (pos < end && oi < own.length) {
            val chunk = KvSegment.readKeys(sp.shadowPaths(j), pos,
              math.min(pos + 65536, end))
            var ci = 0
            while (ci < chunk.length && oi < own.length) {
              val sk = chunk(ci)
              while (oi < own.length && own(oi) < sk) oi += 1
              if (oi < own.length && own(oi) == sk) { shadowed(oi) = true; oi += 1 }
              ci += 1
            }
            pos += chunk.length
          }
          j += 1
        }
        iterReader(new Iterator[(Int, Int)] {
          private var i = 0
          def hasNext: Boolean = {
            while (i < shadowed.length && shadowed(i)) i += 1
            i < shadowed.length
          }
          def next(): (Int, Int) = {
            val start = i
            while (i < shadowed.length && !shadowed(i)) i += 1
            (start, i)
          }
        }.flatMap { case (rs, re) =>
          val s = new KvSegment.SliceReader(sp.path, sp.from + rs, sp.from + re)
          (0 until s.size).iterator.map(i => (s.keys(i), s.value(i)))
        })
    }

  private def iterReader(it: Iterator[(Long, String)])
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var cur: (Long, String) = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = {
        val cols = projection.fieldNames.map {
          case "k" => cur._1.asInstanceOf[Any]
          case "v" => Option(cur._2).map(UTF8String.fromString).orNull
        }
        InternalRow.fromSeq(cols.toSeq)
      }
      override def close(): Unit = ()
    }

  private def rowsReader(n: Int, key: Int => Long,
      value: Int => String): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < n }
      override def get(): InternalRow = {
        val cols = projection.fieldNames.map {
          case "k" => key(i).asInstanceOf[Any]
          case "v" => Option(value(i)).map(UTF8String.fromString).orNull
        }
        InternalRow.fromSeq(cols.toSeq)
      }
      override def close(): Unit = ()
    }
}
