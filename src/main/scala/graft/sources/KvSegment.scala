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
  * row range from, with the sorted key array up front so the driver
  * can range-prune without touching values.
  *
  * Layout (all big-endian, written via DataOutputStream):
  * {{{
  *   magic   : 8 bytes  "GKVSEG01"
  *   n       : Int      row count
  *   keys    : n × Long sorted ascending, unique
  *   offsets : (n+1) × Long byte offsets into the value blob
  *   nulls   : ceil(n/8) bytes, bit i set = value i is NULL
  *   blob    : concatenated UTF-8 value bytes
  * }}}
  *
  * Readers address rows by index: key i lives at a fixed position, so
  * a scan task holding (path, from, until) seeks straight to its
  * slice — no driver state, no full-file read. Writes are
  * write-once-then-rename (crash-safe publish, same discipline as the
  * engine's parquet COW swap in `GraftEngine`).
  */
object KvSegment {
  private val Magic = "GKVSEG01".getBytes(StandardCharsets.US_ASCII)
  private val HeaderLen = Magic.length + 4

  /** Driver-side cache of the key arrays (path → keys). Keys are the
    * planning index — 8 bytes/row, so 100k rows is 800 KB; values are
    * never loaded here. Invalidated by (length, mtime) so a rewritten
    * segment is re-read. */
  private val keyCache = TrieMap.empty[String, (Long, Long, Array[Long])]

  def write(path: String, rows: Seq[(Long, String)]): Unit = {
    val dedup = rows.toMap.toArray.sortBy(_._1)
    val tmp = new java.io.File(path + ".tmp")
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
    } finally out.close()
    val dst = new java.io.File(path)
    if (dst.exists()) dst.delete()
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"rename ${tmp.getPath} -> $path failed")
  }

  /** Sorted key array for range planning (driver side). Cached by
    * (length, mtime) so repeated scans of one segment don't re-read. */
  def keys(path: String): Array[Long] = {
    val f = new java.io.File(path)
    val stamp = (f.length(), f.lastModified())
    keyCache.get(path) match {
      case Some((len, mtime, ks)) if (len, mtime) == stamp => ks
      case _ =>
        val in = new DataInputStream(new java.io.BufferedInputStream(
          new FileInputStream(f)))
        try {
          val magic = new Array[Byte](Magic.length)
          in.readFully(magic)
          if (!java.util.Arrays.equals(magic, Magic))
            throw new java.io.IOException(s"$path: not a GKVSEG01 segment")
          val n = in.readInt()
          val ks = new Array[Long](n)
          var i = 0
          while (i < n) { ks(i) = in.readLong(); i += 1 }
          keyCache(path) = (stamp._1, stamp._2, ks)
          ks
        } finally in.close()
    }
  }

  /** Test seam: drop cached planning state, as a fresh driver would
    * start. Readers never cache — every task opens the file. */
  def invalidate(): Unit = keyCache.clear()

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

  private def nextSegPath(dir: String): String = {
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
      keyCache.remove(p)
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
      val hdr = pread(0L, HeaderLen)
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

    val keys: Array[Long] = longs(pread(keysStart + 8L * from, 8 * m), m)
    private val offs: Array[Long] =
      longs(pread(offsStart + 8L * from, 8 * (m + 1)), m + 1)
    private val nulls: Array[Byte] =
      if (m == 0) Array.emptyByteArray
      else {
        val b0 = from / 8
        val b1 = (until - 1) / 8
        val buf = pread(nullsStart + b0, b1 - b0 + 1)
        val a = new Array[Byte](b1 - b0 + 1)
        buf.get(a)
        a
      }
    private val blob: Array[Byte] =
      if (m == 0) Array.emptyByteArray
      else {
        val lo = offs(0); val hi = offs(m)
        val buf = pread(blobStart + lo, (hi - lo).toInt)
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

    private def pread(pos: Long, len: Int): ByteBuffer = {
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
    private def longs(buf: ByteBuffer, count: Int): Array[Long] = {
      val a = new Array[Long](count)
      buf.asLongBuffer().get(a)
      a
    }
  }
}
