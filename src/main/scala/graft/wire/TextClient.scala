package graft.wire

import java.net.Socket
import java.nio.charset.StandardCharsets

import Packets._

/** Minimal MySQL text-protocol client (Protocol::41, classic EOF
  * framing): handshake + COM_QUERY, nothing else. Exists so the
  * battery can drive an oracle query THROUGH a wire connection
  * (q79) — pinning the server's text serialization (`MysqlServer`'s
  * value→text conversion, the reference's `core_util.rs:357-427`
  * analogue) against the same DuckDB truth every other entry uses.
  * Written against the public protocol documentation; the test
  * suite keeps its own independently-written client (WireSpec) so
  * this one never becomes the only thing the server is checked
  * against.
  */
final class TextClient(host: String, port: Int) extends AutoCloseable {
  private val sock = new Socket(host, port)
  private val in = new java.io.BufferedInputStream(sock.getInputStream)
  private val out = new java.io.BufferedOutputStream(sock.getOutputStream)

  /** Server version string from the V10 handshake (sent eagerly). */
  val serverVersion: String = {
    val (_, hs) = readPacket(in)
    val r = new Reader(hs)
    require(r.int1() == 10, "expected protocol version 10")
    val ver = r.nulStr()
    val caps = ClientProtocol41 | ClientSecureConnection
    val resp = new Writer().int4(caps.toLong).int4(1L << 24).int1(255)
      .zeros(23).nulStr("root").int1(0)
    writePacket(out, 1, resp.result()); out.flush()
    val (_, first) = readPacket(in)
    require((first(0) & 0xff) == 0x00,
      s"handshake rejected: 0x${(first(0) & 0xff).toHexString}")
    ver
  }

  /** COM_QUERY returning (column names, rows as text cells; None =
    * SQL NULL). An OK response (no resultset) is (Nil, Nil); an ERR
    * response throws with the server's code + message. */
  def query(sql: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    writePacket(out, 0, new Writer().int1(ComQuery)
      .bytes(sql.getBytes(StandardCharsets.UTF_8)).result())
    out.flush()
    val (_, first) = readPacket(in)
    (first(0) & 0xff) match {
      case 0x00 => (Nil, Nil)
      case 0xff =>
        val r = new Reader(first); r.int1()
        val code = r.int2(); r.skip(6)
        throw new RuntimeException(
          s"wire error $code: ${new String(r.rest(), StandardCharsets.UTF_8)}")
      case _ =>
        val n = new Reader(first).lenenc().toInt
        val cols = (0 until n).map { _ =>
          val (_, d) = readPacket(in)
          val r = new Reader(d)
          r.lenencBytes(); r.lenencBytes(); r.lenencBytes(); r.lenencBytes()
          new String(r.lenencBytes(), StandardCharsets.UTF_8)
        }
        readPacket(in) // EOF after column definitions
        val rows = Iterator.continually(readPacket(in)._2)
          .takeWhile(p => (p(0) & 0xff) != 0xfe || p.length >= 9)
          .map { p =>
            val r = new Reader(p)
            (0 until n).map { _ =>
              if (r.peek == 0xfb) { r.skip(1); None }
              else Some(new String(r.lenencBytes(), StandardCharsets.UTF_8))
            }
          }.toVector
        (cols, rows)
    }
  }

  override def close(): Unit = sock.close()
}
