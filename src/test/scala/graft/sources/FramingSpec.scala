package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Event

class FramingSpec extends AnyFunSuite {

  private val events: List[Event[Array[Byte]]] = List(
    Event(Some(new Timestamp(1704067200000L)), Some("hello".getBytes("UTF-8"))),
    Event(None, Some(Array.emptyByteArray)),            // empty payload
    Event(Some(new Timestamp(1704067201000L)), None),   // pure time tick
    Event[Array[Byte]](None, None),                     // empty event
    Event(Some(new Timestamp(1704067202000L)), Some(Array.fill[Byte](10000)(7))))

  private def roundTrip(chunk: Int): List[Event[Array[Byte]]] = {
    val bos = new ByteArrayOutputStream()
    Framing.writeAll(bos, events)
    val bytes = bos.toByteArray
    // chunked reads simulating fixed-size socket recv (reference: 4096)
    val in: InputStream = new InputStream {
      private var pos = 0
      private var budget = chunk
      override def read(): Int =
        if (pos >= bytes.length) -1
        else { val b = bytes(pos) & 0xff; pos += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= bytes.length) return -1
        val n = math.min(math.min(len, budget), bytes.length - pos)
        System.arraycopy(bytes, pos, b, off, n)
        pos += n; budget = chunk
        n
      }
    }
    Framing.readAll(in).toList
  }

  test("round-trips all event shapes under any read chunking") {
    for (chunk <- Seq(1, 3, 4096)) {
      val got = roundTrip(chunk)
      assert(got.length == events.length, s"chunk $chunk")
      got.zip(events).foreach { case (g, e) =>
        assert(g.time == e.time)
        assert(g.value.map(_.toSeq) == e.value.map(_.toSeq))
      }
    }
  }

  test("wire format preserves MICROSECOND timestamps (ms would collapse µs-distinct events)") {
    val t = new Timestamp(1704067200123L)
    t.setNanos(123456000) // .123456 seconds — µs-granular like the testdata
    val out = new java.io.ByteArrayOutputStream()
    Framing.writeEvent(out, graft.core.Event(Some(t), Some(Array[Byte](1))))
    val back = Framing.readEvent(new java.io.ByteArrayInputStream(out.toByteArray)).get
    assert(back.time.get.getTime == t.getTime && back.time.get.getNanos == t.getNanos,
      s"µs round-trip: wrote $t got ${back.time.get}")
    assert(graft.core.Event.micros(back.time.get) == graft.core.Event.micros(t))
  }

  test("truncated frame raises, clean EOF ends the stream") {
    val bos = new ByteArrayOutputStream()
    Framing.writeAll(bos, events.take(1))
    val bytes = bos.toByteArray
    intercept[EOFException] {
      Framing.readAll(new ByteArrayInputStream(bytes, 0, bytes.length - 2)).toList
    }
    assert(Framing.readAll(new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }
}
