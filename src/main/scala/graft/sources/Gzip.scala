package graft.sources

/** Transparent gzip for binary format readers (reference: zio/anyio/
  * gzip.go — input auto-uncompresses by magic, not extension). Text
  * formats need nothing: Spark's text/csv/json sources decompress .gz via
  * the Hadoop codecs.
  */
object Gzip {
  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  def maybeGunzip(b: Array[Byte]): Array[Byte] =
    if (!isGzip(b)) b
    else {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }
}
