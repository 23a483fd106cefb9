package graft.pbf

import java.io.ByteArrayOutputStream

/** Test-only protobuf wire-format writer for building synthetic fixtures. */
object ProtoWriter {

  def varintBytes(v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var x = v
    while ((x & ~0x7fL) != 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
    out.toByteArray
  }

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  def key(field: Int, wire: Int): Array[Byte] = varintBytes((field << 3) | wire)

  def varint(field: Int, v: Long): Array[Byte] = key(field, 0) ++ varintBytes(v)
  def svarint(field: Int, v: Long): Array[Byte] =
    key(field, 0) ++ varintBytes(zigzag(v))

  def lenDelim(field: Int, payload: Array[Byte]): Array[Byte] =
    key(field, 2) ++ varintBytes(payload.length) ++ payload

  def str(field: Int, s: String): Array[Byte] =
    lenDelim(field, s.getBytes("UTF-8"))

  def repeatedBytes(field: Int, ss: Seq[String]): Array[Byte] =
    ss.flatMap(s => str(field, s)).toArray

  def packedVarints(field: Int, vs: Seq[Long]): Array[Byte] =
    lenDelim(field, vs.flatMap(varintBytes).toArray)

  def packedSVarints(field: Int, vs: Seq[Long]): Array[Byte] =
    lenDelim(field, vs.flatMap(v => varintBytes(zigzag(v))).toArray)

  def msg(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
}
