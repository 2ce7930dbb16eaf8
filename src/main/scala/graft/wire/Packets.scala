package graft.wire

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** MySQL client/server protocol byte codec — packet framing,
  * length-encoded integers/strings, and the generic packet shapes
  * (OK / ERR / EOF / column definition / text+binary rows), written
  * from the PUBLIC protocol documentation
  * (dev.mysql.com/doc/dev/mysql-server → MySQL Client/Server
  * Protocol; all layouts below are the documented Protocol::*
  * structures). The reference implements the same wire surface in
  * `/root/reference/src/mysql/message.rs:114-122` and
  * `src/mysql/metadata.rs:250-320` — used here only as the
  * behavioral spec for WHICH packets its clients expect (protocol
  * 41, text resultsets, EOF framing), never as code.
  *
  * Everything is little-endian per the protocol. A "packet" is
  * `payload_len:3 LE | sequence_id:1 | payload`.
  */
object Packets {

  // capability flags (Protocol::CapabilityFlags)
  val ClientLongPassword = 0x00000001
  val ClientConnectWithDb = 0x00000008
  val ClientProtocol41 = 0x00000200
  val ClientTransactions = 0x00002000
  val ClientSecureConnection = 0x00008000
  val ClientMultiStatements = 0x00010000
  val ClientMultiResults = 0x00020000
  val ClientPluginAuth = 0x00080000

  // status flags (Protocol::StatusFlags) — the two this server sets
  val ServerStatusAutocommit = 0x0002
  val ServerMoreResultsExists = 0x0008

  // column type codes (Protocol::ColumnType) — the three the engine
  // produces map to LONGLONG / DOUBLE / VAR_STRING, everything else
  // serializes as text through VAR_STRING like the reference's
  // stringly row conversion (core_util.rs:357-427)
  val TypeLongLong: Int = 0x08
  val TypeDouble: Int = 0x05
  val TypeVarString: Int = 0xfd

  // command bytes
  val ComQuit = 0x01
  val ComInitDb = 0x02
  val ComQuery = 0x03
  val ComFieldList = 0x04
  val ComPing = 0x0e
  val ComStmtPrepare = 0x16
  val ComStmtExecute = 0x17
  val ComStmtSendLongData = 0x18
  val ComChangeUser = 0x11
  val ComStmtClose = 0x19
  val ComStmtReset = 0x1a
  val ComSetOption = 0x1b
  val ComResetConnection = 0x1f

  // ---- low-level writers -------------------------------------------

  final class Writer {
    private val buf = new ByteArrayOutputStream()
    def int1(v: Int): Writer = { buf.write(v & 0xff); this }
    def int2(v: Int): Writer = { int1(v); int1(v >>> 8) }
    def int3(v: Int): Writer = { int2(v); int1(v >>> 16) }
    def int4(v: Long): Writer = { int2(v.toInt); int2((v >>> 16).toInt) }
    def int8(v: Long): Writer = { int4(v & 0xffffffffL); int4(v >>> 32) }
    def bytes(b: Array[Byte]): Writer = { buf.write(b); this }
    def zeros(n: Int): Writer = { (0 until n).foreach(_ => int1(0)); this }
    /** length-encoded integer */
    def lenenc(v: Long): Writer =
      if (v < 251) int1(v.toInt)
      else if (v < 65536) { int1(0xfc); int2(v.toInt) }
      else if (v < 16777216) { int1(0xfd); int3(v.toInt) }
      else { int1(0xfe); int8(v) }
    def lenencStr(s: String): Writer = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      lenenc(b.length.toLong); bytes(b)
    }
    def nulStr(s: String): Writer = {
      bytes(s.getBytes(StandardCharsets.UTF_8)); int1(0)
    }
    def result(): Array[Byte] = buf.toByteArray
  }

  // ---- low-level reader --------------------------------------------

  final class Reader(payload: Array[Byte]) {
    private var pos = 0
    def remaining: Int = payload.length - pos
    /** next byte without consuming (NULL-marker detection in rows) */
    def peek: Int = payload(pos) & 0xff
    def int1(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
    def int2(): Int = int1() | (int1() << 8)
    def int3(): Int = int2() | (int1() << 16)
    def int4(): Long = (int2().toLong | (int2().toLong << 16)) & 0xffffffffL
    def int8(): Long = int4() | (int4() << 32)
    def bytes(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b
    }
    def skip(n: Int): Unit = pos += n
    def lenenc(): Long = int1() match {
      case 0xfc => int2().toLong
      case 0xfd => int3().toLong
      case 0xfe => int8()
      case v => v.toLong
    }
    def lenencBytes(): Array[Byte] = bytes(lenenc().toInt)
    def nulStr(): String = {
      val end = payload.indexOf(0.toByte, pos)
      val stop = if (end < 0) payload.length else end
      val s = new String(payload, pos, stop - pos, StandardCharsets.UTF_8)
      pos = if (end < 0) payload.length else end + 1
      s
    }
    def rest(): Array[Byte] = bytes(remaining)
  }

  // ---- packet framing ----------------------------------------------

  /** Write one logical packet, splitting into 16 MB − 1 frames per
    * the protocol: every full 0xffffff frame is followed by another
    * frame (an exactly-full payload ends with an empty one), so the
    * reader always knows whether to continue. */
  def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    var off = 0
    var s = seq
    var continue = true
    while (continue) {
      val n = math.min(0xffffff, payload.length - off)
      out.write(new Writer().int3(n).int1(s).result())
      out.write(payload, off, n)
      off += n; s += 1
      continue = n == 0xffffff
    }
  }

  /** Read one logical packet, reassembling 0xffffff-frame chains.
    * Returns the FIRST frame's sequence id. */
  def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val buf = new ByteArrayOutputStream()
    var seq0 = -1
    var continue = true
    while (continue) {
      val hdr = readN(in, 4)
      val len = (hdr(0) & 0xff) | ((hdr(1) & 0xff) << 8) | ((hdr(2) & 0xff) << 16)
      if (seq0 < 0) seq0 = hdr(3) & 0xff
      buf.write(readN(in, len))
      continue = len == 0xffffff
    }
    (seq0, buf.toByteArray)
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException("peer closed mid-packet")
      off += r
    }
    b
  }

  // ---- generic packets ---------------------------------------------

  /** OK_Packet (protocol 41, no session-track). `status` carries
    * SERVER_MORE_RESULTS_EXISTS between multi-statement responses. */
  def ok(affected: Long, lastInsertId: Long = 0L,
      status: Int = ServerStatusAutocommit): Array[Byte] =
    new Writer().int1(0x00).lenenc(affected).lenenc(lastInsertId)
      .int2(status).int2(0).result()

  /** ERR_Packet with the engine's MySQL-compatible error code. */
  def err(code: Int, message: String): Array[Byte] =
    new Writer().int1(0xff).int2(code).int1('#')
      .bytes("HY000".getBytes(StandardCharsets.US_ASCII))
      .bytes(message.getBytes(StandardCharsets.UTF_8)).result()

  /** EOF_Packet (classic framing — DEPRECATE_EOF is not advertised). */
  def eof(status: Int = ServerStatusAutocommit): Array[Byte] =
    new Writer().int1(0xfe).int2(0).int2(status).result()

  /** Protocol::ColumnDefinition41. `typeCode` is a ColumnType above;
    * strings go out as utf8mb4 (charset 255), numbers as binary
    * (charset 63) per convention. */
  def columnDef(schema: String, table: String, name: String,
      typeCode: Int): Array[Byte] = {
    val charset = if (typeCode == TypeVarString) 255 else 63
    new Writer()
      .lenencStr("def").lenencStr(schema).lenencStr(table).lenencStr(table)
      .lenencStr(name).lenencStr(name)
      .lenenc(0x0c) // fixed-length fields
      .int2(charset).int4(1024L).int1(typeCode)
      .int2(0 /* flags */).int1(0 /* decimals */).int2(0)
      .result()
  }

  /** ProtocolText::ResultsetRow: every value length-encoded text,
    * NULL as 0xfb — the reference's all-text row conversion. */
  def textRow(values: Seq[Option[String]]): Array[Byte] = {
    val w = new Writer()
    values.foreach {
      case Some(s) => w.lenencStr(s)
      case None => w.int1(0xfb)
    }
    w.result()
  }

  /** Binary protocol resultset row (COM_STMT_EXECUTE responses):
    * 0x00 header, NULL bitmap with offset 2, then values in binary
    * (LONGLONG/DOUBLE little-endian, strings length-encoded). */
  def binaryRow(values: Seq[(Option[Any], Int)]): Array[Byte] = {
    val w = new Writer().int1(0x00)
    val bitmap = new Array[Byte]((values.size + 7 + 2) / 8)
    values.zipWithIndex.foreach { case ((v, _), i) =>
      if (v.isEmpty) {
        val bit = i + 2
        bitmap(bit / 8) = (bitmap(bit / 8) | (1 << (bit % 8))).toByte
      }
    }
    w.bytes(bitmap)
    values.foreach {
      case (Some(l: Long), TypeLongLong) => w.int8(l)
      case (Some(d: Double), TypeDouble) =>
        w.int8(java.lang.Double.doubleToLongBits(d))
      case (Some(s), _) => w.lenencStr(s.toString)
      case (None, _) => ()
    }
    w.result()
  }
}
