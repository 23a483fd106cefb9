package graft.pbf

import org.scalatest.funsuite.AnyFunSuite

/** Blob codec round-trips: raw, zlib, lz4, zstd (the upstream format's
  * full codec surface minus obsolete lzma/bzip2).
  */
class BlobCodecSpec extends AnyFunSuite {
  import ProtoWriter._

  private val payload =
    ("the quick brown fox " * 50).getBytes("UTF-8")

  private def blob(parts: Array[Byte]*): Array[Byte] = msg(parts: _*)

  test("raw blob") {
    val b = blob(lenDelim(1, payload))
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(payload))
  }

  test("zlib blob") {
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length * 2)
    val n = d.deflate(buf)
    val b = blob(varint(2, payload.length), lenDelim(3, buf.take(n)))
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(payload))
  }

  test("lz4 blob") {
    val c = new io.airlift.compress.lz4.Lz4Compressor()
    val buf = new Array[Byte](c.maxCompressedLength(payload.length))
    val n = c.compress(payload, 0, payload.length, buf, 0, buf.length)
    val b = blob(varint(2, payload.length), lenDelim(6, buf.take(n)))
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(payload))
  }

  test("zstd blob") {
    val c = new io.airlift.compress.zstd.ZstdCompressor()
    val buf = new Array[Byte](c.maxCompressedLength(payload.length))
    val n = c.compress(payload, 0, payload.length, buf, 0, buf.length)
    val b = blob(varint(2, payload.length), lenDelim(7, buf.take(n)))
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(payload))
  }

  test("zlib blob without raw_size inflates fully even at high ratio") {
    // highly compressible payload much larger than any zlib.length-based
    // guess: the single-shot inflate used to truncate this silently
    val big = ("a" * 1000000).getBytes("UTF-8")
    val d = new java.util.zip.Deflater()
    d.setInput(big); d.finish()
    val buf = new Array[Byte](big.length)
    val n = d.deflate(buf) // ~1 KB compressed for 1 MB raw
    val b = blob(lenDelim(3, buf.take(n))) // NO raw_size field
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(big))
  }

  test("zlib blob with understated raw_size still inflates fully") {
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length * 2)
    val n = d.deflate(buf)
    val b = blob(varint(2, 10L), lenDelim(3, buf.take(n))) // raw_size lies
    assert(PbfBlockDecoder.inflateBlob(b, 0, b.length).sameElements(payload))
  }

  test("truncated zlib blob fails loudly instead of returning a prefix") {
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length * 2)
    val n = d.deflate(buf)
    val b = blob(varint(2, payload.length), lenDelim(3, buf.take(n / 2)))
    intercept[Exception] {
      PbfBlockDecoder.inflateBlob(b, 0, b.length)
    }
  }

  test("lzma rejected with a named error") {
    val b = blob(varint(2, 10L), lenDelim(4, Array[Byte](1, 2, 3)))
    val e = intercept[UnsupportedOperationException] {
      PbfBlockDecoder.inflateBlob(b, 0, b.length)
    }
    assert(e.getMessage.contains("lzma"))
  }

  test("empty blob rejected") {
    val b = blob()
    intercept[IllegalArgumentException] {
      PbfBlockDecoder.inflateBlob(b, 0, b.length)
    }
  }
}
