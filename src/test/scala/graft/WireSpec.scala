package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.server.PacketIO

/** MySQL packet framing: the writer chunks at the 2^24-1 boundary and
  * the reader reassembles — a >16MB logical packet must round-trip as
  * ONE payload, not execute truncated and desync on the continuation.
  */
class WireSpec extends AnyFunSuite {

  private def roundTrip(payload: Array[Byte]): Array[Byte] = {
    val wire = new ByteArrayOutputStream()
    new PacketIO(new DataInputStream(
      new ByteArrayInputStream(Array.empty)), wire).write(payload)
    val in = new PacketIO(new DataInputStream(
      new ByteArrayInputStream(wire.toByteArray)), new ByteArrayOutputStream())
    in.read()
  }

  test("small payloads round-trip unchanged") {
    val p = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    assert(roundTrip(p).toSeq == p.toSeq)
  }

  test("payload exactly at the 2^24-1 boundary round-trips (empty terminator chunk)") {
    val p = Array.tabulate[Byte](0xffffff)(i => (i * 31 % 256).toByte)
    val got = roundTrip(p)
    assert(got.length == p.length)
    assert(got.toSeq.take(64) == p.toSeq.take(64) &&
      got.toSeq.takeRight(64) == p.toSeq.takeRight(64))
  }

  test("payload past the boundary reassembles into one logical packet") {
    val n = 0xffffff + 12345
    val p = Array.tabulate[Byte](n)(i => ((i * 131) % 256).toByte)
    val got = roundTrip(p)
    assert(got.length == n)
    assert(got.toSeq.take(64) == p.toSeq.take(64) &&
      got.toSeq.takeRight(64) == p.toSeq.takeRight(64))
  }

  test("consecutive logical packets keep their framing after a chunked one") {
    val wire = new ByteArrayOutputStream()
    val w = new PacketIO(new DataInputStream(
      new ByteArrayInputStream(Array.empty)), wire)
    val big = Array.fill[Byte](0xffffff + 5)(7)
    val small = Array[Byte](1, 2, 3)
    w.write(big); w.write(small)
    val r = new PacketIO(new DataInputStream(
      new ByteArrayInputStream(wire.toByteArray)), new ByteArrayOutputStream())
    assert(r.read().length == big.length)
    assert(r.read().toSeq == small.toSeq)
  }
}
