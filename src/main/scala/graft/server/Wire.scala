package graft.server

import java.io.{DataInputStream, EOFException, OutputStream}

/** MySQL packet framing over a socket stream: every packet is a 3-byte
  * little-endian payload length, a 1-byte sequence id, then the payload
  * (/root/reference/src/mysql/packet.rs:1). Unlike the reference — which
  * reads whatever one socket read returns and assumes it is exactly one
  * packet — this reader honors the length header, so split or coalesced
  * TCP segments parse correctly, and the writer chunks payloads at the
  * protocol's 2^24-1 boundary.
  */
final class PacketIO(in: DataInputStream, out: OutputStream) {

  /** Next sequence id to WRITE; reading a packet sets it to the client's
    * sequence + 1, so responses continue the command's numbering.
    */
  private var seq: Int = 0

  def resetSeq(): Unit = seq = 0

  /** Read one LOGICAL packet's payload; null on clean EOF. A payload of
    * exactly 2^24-1 bytes signals a continuation packet follows — the
    * reader reassembles until a chunk under the boundary arrives
    * (mirroring the writer's chunking; without this a >16MB COM_QUERY
    * would execute truncated and desync the protocol on the next chunk).
    */
  def read(): Array[Byte] = {
    var out: java.io.ByteArrayOutputStream = null
    while (true) {
      val header = new Array[Byte](4)
      try in.readFully(header)
      catch { case _: EOFException => return null }
      val len = (header(0) & 0xff) | ((header(1) & 0xff) << 8) |
        ((header(2) & 0xff) << 16)
      seq = (header(3) & 0xff) + 1
      val payload = new Array[Byte](len)
      in.readFully(payload)
      if (out == null && len < 0xffffff) return payload
      if (out == null) out = new java.io.ByteArrayOutputStream(len * 2)
      out.write(payload, 0, len)
      if (len < 0xffffff) return out.toByteArray
    }
    null // unreachable
  }

  def write(payload: Array[Byte]): Unit = {
    var off = 0
    // chunk at 0xffffff: a max-length chunk tells the client more follows
    while ({
      val n = math.min(payload.length - off, 0xffffff)
      out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
      out.write(seq & 0xff)
      seq += 1
      out.write(payload, off, n)
      off += n
      n == 0xffffff
    }) ()
    out.flush()
  }
}

/** Length-encoded integer/string primitives of the MySQL wire format
  * (/root/reference/src/mysql/response.rs:60 dump_length_encoded_int).
  */
object Lenc {

  def int(b: java.io.ByteArrayOutputStream, n: Long): Unit = {
    if (n >= 0 && n <= 250) b.write(n.toInt)
    else if (n >= 0 && n <= 0xffff) {
      b.write(0xfc); b.write((n & 0xff).toInt); b.write(((n >> 8) & 0xff).toInt)
    } else if (n >= 0 && n <= 0xffffff) {
      b.write(0xfd); b.write((n & 0xff).toInt); b.write(((n >> 8) & 0xff).toInt)
      b.write(((n >> 16) & 0xff).toInt)
    } else {
      b.write(0xfe)
      var i = 0
      while (i < 8) { b.write(((n >> (8 * i)) & 0xff).toInt); i += 1 }
    }
  }

  def bytes(b: java.io.ByteArrayOutputStream, s: Array[Byte]): Unit = {
    int(b, s.length.toLong)
    b.write(s, 0, s.length)
  }

  def str(b: java.io.ByteArrayOutputStream, s: String): Unit =
    bytes(b, s.getBytes("UTF-8"))

  /** The text-protocol NULL cell marker. */
  def nul(b: java.io.ByteArrayOutputStream): Unit = b.write(0xfb)

  def u16(b: java.io.ByteArrayOutputStream, n: Int): Unit = {
    b.write(n & 0xff); b.write((n >> 8) & 0xff)
  }

  def u32(b: java.io.ByteArrayOutputStream, n: Long): Unit = {
    var i = 0
    while (i < 4) { b.write(((n >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def u64(b: java.io.ByteArrayOutputStream, n: Long): Unit = {
    var i = 0
    while (i < 8) { b.write(((n >> (8 * i)) & 0xff).toInt); i += 1 }
  }
}
