package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal BSON codec (spec: bsonspec.org, version 1.1) for the format
  * surface the reference exposes through its serializer (reference:
  * cli/process.go:911 lists bson among the decodable formats).
  *
  * A file is a sequence of concatenated documents (the mongodump layout).
  * Supported element types: double (0x01), string (0x02), embedded
  * document (0x03), array (0x04), boolean (0x08), null (0x0A), int32
  * (0x10), int64 (0x12) — the value space of the engine's record maps.
  */
object Bson {

  // ---------- decode ----------

  /** All concatenated documents in `bytes`. */
  def parseAll(bytes: Array[Byte]): List[Map[String, Any]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val docs = List.newBuilder[Map[String, Any]]
    while (buf.remaining() >= 5) docs += parseDoc(buf)
    docs.result()
  }

  private def parseDoc(buf: ByteBuffer): Map[String, Any] = {
    val len = buf.getInt()
    val end = buf.position() + len - 5 // minus the length itself + trailing NUL
    val m = Map.newBuilder[String, Any]
    while (buf.position() < end) {
      val t = buf.get()
      val name = cstring(buf)
      m += (name -> value(buf, t))
    }
    require(buf.get() == 0, "bson: document missing trailing NUL")
    m.result()
  }

  private def value(buf: ByteBuffer, t: Byte): Any = t match {
    case 0x01 => buf.getDouble()
    case 0x02 =>
      val n = buf.getInt()
      val b = new Array[Byte](n - 1); buf.get(b)
      require(buf.get() == 0, "bson: string missing NUL")
      new String(b, UTF_8)
    case 0x03 => parseDoc(buf)
    case 0x04 => // array = doc keyed "0","1",…
      parseDoc(buf).toSeq.sortBy(_._1.toInt).map(_._2).toList
    case 0x08 => buf.get() != 0
    case 0x0A => null
    case 0x10 => buf.getInt().toLong
    case 0x12 => buf.getLong()
    case other => throw new UnsupportedOperationException(
      f"bson: unsupported element type 0x$other%02x")
  }

  private def cstring(buf: ByteBuffer): String = {
    val out = new ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { out.write(b); b = buf.get() }
    out.toString(UTF_8)
  }

  // ---------- encode ----------

  /** Concatenated-documents encoding of `records`. */
  def renderAll(records: Seq[Map[String, Any]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(renderDoc(r)))
    out.toByteArray
  }

  def renderDoc(m: Map[String, Any]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    m.foreach { case (k, v) => writeElement(body, k, v) }
    val total = body.size() + 5
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(body.toByteArray)
    out.put(0.toByte)
    out.array()
  }

  private def writeElement(out: ByteArrayOutputStream, name: String, v: Any): Unit = {
    def le32(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le64(l: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    def cstr(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.write(0) }
    v match {
      case d: Double  => out.write(0x01); cstr(name); out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case f: Float   => writeElement(out, name, f.toDouble)
      case s: String  =>
        out.write(0x02); cstr(name)
        val b = s.getBytes(UTF_8)
        out.write(le32(b.length + 1)); out.write(b); out.write(0)
      case m: Map[_, _] =>
        out.write(0x03); cstr(name)
        out.write(renderDoc(m.asInstanceOf[Map[String, Any]]))
      case xs: Seq[_] =>
        // array = doc with "0","1",… keys IN ORDER (a Map would scramble
        // iteration order past 4 elements)
        out.write(0x04); cstr(name)
        val body = new ByteArrayOutputStream()
        xs.zipWithIndex.foreach { case (x, i) => writeElement(body, i.toString, x) }
        val total = body.size() + 5
        val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(total); buf.put(body.toByteArray); buf.put(0.toByte)
        out.write(buf.array())
      case b: Boolean => out.write(0x08); cstr(name); out.write(if (b) 1 else 0)
      case null       => out.write(0x0A); cstr(name)
      case i: Int     => out.write(0x10); cstr(name); out.write(le32(i))
      case l: Long    => out.write(0x12); cstr(name); out.write(le64(l))
      case other => throw new UnsupportedOperationException(
        s"bson: cannot encode ${other.getClass.getName}")
    }
  }
}
