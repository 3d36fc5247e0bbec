package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.sql.Timestamp

import graft.core.Event

/** Length-prefixed binary event framing — the parity surface for the
  * reference's `Data.Store`-encoded TCP transport
  * (`src/Striot/Nodes/TCP.hs:65-116`: framed streaming decode over
  * fixed-size socket reads). Inside Spark the shuffle replaces the
  * transport role, so this codec exists for ingest/egress edges: a socket
  * or file carrying framed binary events decodes into `Event[Array[Byte]]`
  * (payload deserialization is the caller's, as it is in the reference —
  * `Store` instances are per payload type).
  *
  * Frame layout: 1 flag byte (bit0 = has time, bit1 = has value),
  * then 8-byte epoch-MICROS when timed (µs, not getTime's ms: a
  * millisecond wire format would collapse µs-distinct events into ties
  * and re-introduce the fold-order bug the [[Event.orderKey]] sweep
  * fixed), then 4-byte payload length + bytes when data-carrying.
  * Decoding is incremental and tolerates any read chunking (the
  * reference reads 4096-byte chunks).
  */
object Framing {

  private val HasTime = 0x1
  private val HasValue = 0x2

  def writeEvent(out: OutputStream, e: Event[Array[Byte]]): Unit = {
    val d = new DataOutputStream(out)
    val flags = (if (e.time.isDefined) HasTime else 0) | (if (e.value.isDefined) HasValue else 0)
    d.writeByte(flags)
    e.time.foreach(t => d.writeLong(Event.micros(t)))
    e.value.foreach { bs => d.writeInt(bs.length); d.write(bs) }
    d.flush()
  }

  /** Read one event; None at clean end-of-stream. Throws on a truncated
    * frame (mid-event EOF), like the reference's decode failure path. */
  def readEvent(in: InputStream): Option[Event[Array[Byte]]] = {
    val first = in.read()
    if (first < 0) return None
    val d = new DataInputStream(in)
    val flags = first
    val time = if ((flags & HasTime) != 0) {
      val us = d.readLong()
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      Some(t)
    } else None
    val value = if ((flags & HasValue) != 0) {
      val n = d.readInt()
      if (n < 0) throw new EOFException(s"negative frame length $n")
      val buf = new Array[Byte](n)
      d.readFully(buf)
      Some(buf)
    } else None
    Some(Event(time, value))
  }

  def writeAll(out: OutputStream, events: Iterable[Event[Array[Byte]]]): Unit =
    events.foreach(writeEvent(out, _))

  /** Lazily decode a framed stream to its end. */
  def readAll(in: InputStream): Iterator[Event[Array[Byte]]] =
    Iterator.continually(readEvent(in)).takeWhile(_.isDefined).map(_.get)
}
