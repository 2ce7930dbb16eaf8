package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

/** Durable, immutable, sorted KV segment file — the persistent backing
  * the reference gets from sled (`/root/reference/src/store/engine/
  * sled.rs`), rebuilt as the thing a *distributed* scan actually
  * wants: one self-describing file any executor can open and pread a
  * row range from, with a block-sparse fence-pointer footer so the
  * DRIVER's planning index is O(rows / blockSize), never O(rows).
  *
  * Layout (all big-endian, written via DataOutputStream):
  * {{{
  *   magic   : 8 bytes  "GKVSEG01"
  *   n       : Int      row count
  *   keys    : n × Long sorted ascending, unique
  *   offsets : (n+1) × Long byte offsets into the value blob
  *   nulls   : ceil(n/8) bytes, bit i set = value i is NULL
  *   blob    : concatenated UTF-8 value bytes
  *   fences  : nBlocks × Long  first key of each 4096-row block
  *   lastKey : Long            (present when n > 0)
  *   trailer : nFences Int, blockSize Int, n Int, "GKVFTR01"
  * }}}
  *
  * The footer is self-locating from the file END (fixed-size trailer),
  * so planning never reads the key array; readers address rows by
  * index and never read the footer. A 1 B-row segment costs the driver
  * ~2 MB of fences instead of 8 GB of keys. Exact range clipping stays
  * exact: the planner preads only the two BOUNDARY blocks (≤ 2 × 32 KB)
  * and binary-searches inside them. Writes are write-once-then-rename
  * (crash-safe publish, same discipline as the engine's parquet COW
  * swap in `GraftEngine`).
  */
object KvSegment {
  private val Magic = "GKVSEG01".getBytes(StandardCharsets.US_ASCII)
  private val FooterMagic = "GKVFTR01".getBytes(StandardCharsets.US_ASCII)
  private val HeaderLen = Magic.length + 4
  private val TrailerLen = 4 + 4 + 4 + FooterMagic.length

  /** Rows per fence block. 4096 × 8 B = 32 KB per boundary-block pread;
    * a segment's planning index is n/4096 + 1 longs. */
  val BlockSize: Int = 4096

  /** Per-segment planning index: row count + fence pointers.
    * `fences(b)` is the first key of block `b` for `b < nBlocks`, and
    * `fences(nBlocks)` is the segment's LAST key — so a fence array has
    * nBlocks + 1 entries and brackets every key in the segment. */
  final case class FenceIndex(n: Int, blockSize: Int, fences: Array[Long]) {
    def nBlocks: Int = if (n == 0) 0 else fences.length - 1
    def lastKey: Long = fences(fences.length - 1)
    def firstKey: Long = fences(0)
  }

  /** Driver-side cache of fence indexes (path → fences). THIS is the
    * planning state — O(rows/4096) per segment, values and keys are
    * never loaded here. Invalidated by (length, mtime) so a rewritten
    * segment is re-read. */
  private val fenceCache = TrieMap.empty[String, (Long, Long, FenceIndex)]

  def write(path: String, rows: Seq[(Long, String)]): Unit = {
    val dedup = rows.toMap.toArray.sortBy(_._1)
    writeSorted(path, dedup)
  }

  /** Write a segment from rows already sorted ascending by unique key —
    * the distributed-writer entry point ([[KvSegmentWriter]]): each
    * task has `sortWithinPartitions` output, so re-sorting here would
    * only mask a broken upstream partitioning. */
  def writeSorted(path: String, dedup: Array[(Long, String)]): Unit = {
    var i = 1
    while (i < dedup.length) {
      require(dedup(i - 1)._1 < dedup(i)._1,
        s"$path: keys not strictly ascending at $i (${dedup(i - 1)._1} >= ${dedup(i)._1})")
      i += 1
    }
    // Unique tmp per writer: concurrent attempts of a retried/
    // speculated task must not interleave bytes into one tmp file.
    // Rename is last-publisher-wins over identical deterministic
    // content, so either attempt's publish is correct.
    val tmp = new java.io.File(
      path + ".tmp" + java.util.UUID.randomUUID().toString.take(8))
    Option(tmp.getParentFile).foreach(_.mkdirs())
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(tmp)))
    try {
      out.write(Magic)
      out.writeInt(dedup.length)
      dedup.foreach { case (k, _) => out.writeLong(k) }
      val blobs = dedup.map { case (_, v) =>
        if (v == null) Array.emptyByteArray else v.getBytes(StandardCharsets.UTF_8)
      }
      var off = 0L
      blobs.foreach { b => out.writeLong(off); off += b.length }
      out.writeLong(off)
      val bitmap = new Array[Byte]((dedup.length + 7) / 8)
      dedup.iterator.zipWithIndex.foreach { case ((_, v), i) =>
        if (v == null) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
      }
      out.write(bitmap)
      blobs.foreach(out.write)
      // Fence-pointer footer: first key of every block, then the last
      // key, then a self-locating trailer. Readers never see this
      // (they stop at the blob); only the planner reads it — from the
      // file end, without touching the key array.
      val n = dedup.length
      val nBlocks = (n + BlockSize - 1) / BlockSize
      var b = 0
      while (b < nBlocks) { out.writeLong(dedup(b * BlockSize)._1); b += 1 }
      if (n > 0) out.writeLong(dedup(n - 1)._1)
      out.writeInt(if (n == 0) 0 else nBlocks + 1)
      out.writeInt(BlockSize)
      out.writeInt(n)
      out.write(FooterMagic)
    } finally out.close()
    val dst = new java.io.File(path)
    if (dst.exists()) dst.delete()
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"rename ${tmp.getPath} -> $path failed")
  }

  /** Fence index for range planning (driver side), cached by
    * (length, mtime). Reads the fixed-size trailer from the file end,
    * then exactly the fence array — O(rows/4096) I/O and memory,
    * independent of segment size. A legacy footer-less segment falls
    * back to a one-time full key read (synthesizing fences), still
    * caching only the fences. */
  def fenceIndex(path: String): FenceIndex = {
    val f = new java.io.File(path)
    val stamp = (f.length(), f.lastModified())
    fenceCache.get(path) match {
      case Some((len, mtime, fi)) if (len, mtime) == stamp => fi
      case _ =>
        val fi = readFenceIndex(f)
        fenceCache(path) = (stamp._1, stamp._2, fi)
        fi
    }
  }

  private def readFenceIndex(f: java.io.File): FenceIndex = {
    val ch = new RandomAccessFile(f, "r").getChannel
    try {
      val len = ch.size()
      if (len < HeaderLen + TrailerLen) return legacyFences(f.getPath)
      val tr = pread(ch, f.getPath, len - TrailerLen, TrailerLen)
      val nFences = tr.getInt
      val blockSize = tr.getInt
      val n = tr.getInt
      val magic = new Array[Byte](FooterMagic.length)
      tr.get(magic)
      if (!java.util.Arrays.equals(magic, FooterMagic)) return legacyFences(f.getPath)
      val fences = new Array[Long](nFences)
      if (nFences > 0) {
        val fb = pread(ch, f.getPath, len - TrailerLen - 8L * nFences, 8 * nFences)
        fb.asLongBuffer().get(fences)
      }
      FenceIndex(n, blockSize, fences)
    } finally ch.close()
  }

  /** Pre-footer segments: synthesize the fence index from the key
    * array (one full key read, fences cached, keys discarded). */
  private def legacyFences(path: String): FenceIndex = {
    val ks = keys(path)
    val n = ks.length
    val nBlocks = (n + BlockSize - 1) / BlockSize
    val fences = new Array[Long](if (n == 0) 0 else nBlocks + 1)
    var b = 0
    while (b < nBlocks) { fences(b) = ks(b * BlockSize); b += 1 }
    if (n > 0) fences(nBlocks) = ks(n - 1)
    FenceIndex(n, BlockSize, fences)
  }

  /** pread the sorted keys of rows [from, until) — the boundary-block
    * probe the planner uses for exact range clipping, and the shadow
    * stream executors merge against. O(until - from) I/O, no caching. */
  def readKeys(path: String, from: Int, until: Int): Array[Long] = {
    val m = until - from
    if (m <= 0) return Array.emptyLongArray
    val ch = new RandomAccessFile(path, "r").getChannel
    try {
      val buf = pread(ch, path, HeaderLen.toLong + 8L * from, 8 * m)
      val a = new Array[Long](m)
      buf.asLongBuffer().get(a)
      a
    } finally ch.close()
  }

  /** Full sorted key array — compaction-scope utility (a deliberate
    * O(segment) driver read; PLANNING never calls this, it plans on
    * [[fenceIndex]]). Uncached: callers hold it only for the merge. */
  def keys(path: String): Array[Long] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new FileInputStream(path)))
    try {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, Magic))
        throw new java.io.IOException(s"$path: not a GKVSEG01 segment")
      val n = in.readInt()
      val ks = new Array[Long](n)
      var i = 0
      while (i < n) { ks(i) = in.readLong(); i += 1 }
      ks
    } finally in.close()
  }

  /** Test seam: drop cached planning state, as a fresh driver would
    * start. Readers never cache — every task opens the file. */
  def invalidate(): Unit = fenceCache.clear()

  /** Test seam: total longs held across all cached fence indexes — the
    * ENTIRE per-key-derived driver planning state. Specs assert this
    * stays O(rows / BlockSize + segments). */
  def cachedPlanningLongs: Long =
    fenceCache.values.iterator.map(_._3.fences.length.toLong).sum

  // ---- multi-segment tables (the growth path) -----------------------

  /** Segment files of a multi-segment table directory, ascending by
    * sequence number. A multi-segment table is a directory of numbered
    * write-once segments (`000001.seg`, `000002.seg`, …); a key
    * present in several segments is visible from the HIGHEST-numbered
    * one (LSM newest-wins upsert — no tombstones: a NULL value is a
    * stored NULL, not a delete). */
  def listSegments(dir: String): Seq[String] = {
    val fs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
    fs.filter(f => f.isFile && f.getName.matches("\\d{6}\\.seg"))
      .sortBy(_.getName).map(_.getPath).toSeq
  }

  private[sources] def nextSegPath(dir: String): String = {
    val next = listSegments(dir).lastOption
      .map(p => new java.io.File(p).getName.stripSuffix(".seg").toInt + 1)
      .getOrElse(1)
    new java.io.File(dir, f"$next%06d.seg").getPath
  }

  /** Append one write-once segment to a multi-segment table — the
    * ingest path: new rows land as a fresh sorted segment instead of
    * rewriting the table, and shadow older segments' equal keys at
    * read time. Publish is the same write-once-rename as [[write]].
    * Returns the published path. */
  def appendSegment(dir: String, rows: Seq[(Long, String)]): String = {
    new java.io.File(dir).mkdirs()
    val p = nextSegPath(dir)
    write(p, rows)
    p
  }

  /** Full materialized read of one segment — compaction-scope utility
    * (a driver-side O(segment) read; scans never use this). */
  def readAll(path: String): Array[(Long, String)] = {
    val n = keys(path).length
    val sr = new SliceReader(path, 0, n)
    Array.tabulate(n)(i => (sr.keys(i), sr.value(i)))
  }

  /** Compact a multi-segment table to one segment: newest-wins merge
    * of every live segment, published write-once-rename as the NEXT
    * sequence number BEFORE the merged-away files are deleted — so a
    * crash anywhere in between leaves a directory that still reads
    * exactly the merged state (the survivor shadows everything it
    * merged, and re-running compact converges). Returns the merged
    * segment's path.
    *
    * Concurrency contract: a scan PLANNED after compaction reads the
    * identical merged view; a scan planned before (whose partitions
    * pin the old paths) fails on the deleted files — the same
    * contract as deleting parquet files under a planned scan. Run
    * compaction in the same maintenance windows as any file-level
    * rewrite, or keep old segments until readers drain. */
  def compact(dir: String): String = {
    val segs = listSegments(dir)
    require(segs.nonEmpty, s"$dir: no segments to compact")
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    segs.foreach(p => readAll(p).foreach { case (k, v) => m(k) = v })
    val out = nextSegPath(dir)
    write(out, m.toSeq)
    segs.foreach { p =>
      new java.io.File(p).delete()
      fenceCache.remove(p)
    }
    out
  }

  /** Executor-side slice reader for rows [from, until): opens the
    * file, preads exactly the key slice, offset slice, null-bitmap
    * bytes and blob window it needs, then iterates. Total extra I/O
    * beyond the rows themselves is O(slice), not O(file). */
  final class SliceReader(path: String, from: Int, until: Int) {
    private val ch: FileChannel = new RandomAccessFile(path, "r").getChannel
    private val n: Int = {
      val hdr = pread(ch, path, 0L, HeaderLen)
      val magic = new Array[Byte](Magic.length)
      hdr.get(magic)
      if (!java.util.Arrays.equals(magic, Magic))
        throw new java.io.IOException(s"$path: not a GKVSEG01 segment")
      hdr.getInt
    }
    require(from >= 0 && until <= n && from <= until,
      s"slice [$from,$until) out of range for $n-row segment $path")

    private val m = until - from
    private val keysStart = HeaderLen.toLong
    private val offsStart = keysStart + 8L * n
    private val nullsStart = offsStart + 8L * (n + 1)
    private val blobStart = nullsStart + (n + 7) / 8

    val keys: Array[Long] = longs(pread(ch, path, keysStart + 8L * from, 8 * m), m)
    private val offs: Array[Long] =
      longs(pread(ch, path, offsStart + 8L * from, 8 * (m + 1)), m + 1)
    private val nulls: Array[Byte] =
      if (m == 0) Array.emptyByteArray
      else {
        val b0 = from / 8
        val b1 = (until - 1) / 8
        val buf = pread(ch, path, nullsStart + b0, b1 - b0 + 1)
        val a = new Array[Byte](b1 - b0 + 1)
        buf.get(a)
        a
      }
    private val blob: Array[Byte] =
      if (m == 0) Array.emptyByteArray
      else {
        val lo = offs(0); val hi = offs(m)
        val buf = pread(ch, path, blobStart + lo, (hi - lo).toInt)
        val a = new Array[Byte]((hi - lo).toInt)
        buf.get(a)
        a
      }
    ch.close()

    def size: Int = m
    def isNull(i: Int): Boolean = {
      val gi = from + i
      (nulls(gi / 8 - from / 8) & (1 << (gi % 8))) != 0
    }
    def value(i: Int): String =
      if (isNull(i)) null
      else new String(blob, (offs(i) - offs(0)).toInt,
        (offs(i + 1) - offs(i)).toInt, StandardCharsets.UTF_8)

    private def longs(buf: ByteBuffer, count: Int): Array[Long] = {
      val a = new Array[Long](count)
      buf.asLongBuffer().get(a)
      a
    }
  }

  private def pread(ch: FileChannel, path: String, pos: Long, len: Int): ByteBuffer = {
    val buf = ByteBuffer.allocate(len)
    var p = pos
    while (buf.hasRemaining) {
      val r = ch.read(buf, p)
      if (r < 0) throw new EOFException(s"$path truncated at $p")
      p += r
    }
    buf.flip()
    buf
  }
}
