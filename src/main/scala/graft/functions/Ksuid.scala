package graft.functions

/** KSUID generation (reference function/ksuid.go; the segmentio/ksuid
  * layout): 4-byte big-endian seconds since the KSUID epoch (2014-05-13)
  * followed by 16 random bytes, rendered as a fixed-width 27-char base62
  * string. Lexicographic order of ids follows creation time.
  */
object Ksuid {

  private val Epoch = 1400000000L // 2014-05-13T16:53:20Z, per the KSUID spec
  private val Alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  def newId(): String = base62(newIdBytes())

  /** The raw 20-byte id (ksuid() returns bytes in the reference). */
  def newIdBytes(): Array[Byte] = {
    val ts = (System.currentTimeMillis() / 1000L) - Epoch
    val payload = new Array[Byte](16)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(payload)
    val bytes = new Array[Byte](20)
    bytes(0) = ((ts >>> 24) & 0xff).toByte
    bytes(1) = ((ts >>> 16) & 0xff).toByte
    bytes(2) = ((ts >>> 8) & 0xff).toByte
    bytes(3) = (ts & 0xff).toByte
    System.arraycopy(payload, 0, bytes, 4, 16)
    bytes
  }

  /** Encode a 20-byte id given as bare hex digits → 27-char base62. */
  def encodeHex(hexDigits: String): String = {
    if (hexDigits == null) return null
    val bytes = hexDigits.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    base62(bytes)
  }

  /** Decode a 27-char base62 id → bare hex digits of the 20 bytes. */
  def decodeHex(encoded: String): String = {
    if (encoded == null) return null
    var n = BigInt(0)
    for (ch <- encoded) {
      val d = Alphabet.indexOf(ch)
      if (d < 0) return null
      n = n * 62 + d
    }
    val raw = n.toByteArray.dropWhile(_ == 0)
    val bytes = new Array[Byte](20)
    System.arraycopy(raw, 0, bytes, 20 - raw.length, raw.length)
    bytes.map(b => f"$b%02x").mkString
  }

  /** Fixed-width base62 of a 20-byte value (27 chars, zero-padded). */
  private[graft] def base62(bytes: Array[Byte]): String = {
    var n = BigInt(1, bytes)
    val sb = new StringBuilder
    val base = BigInt(62)
    while (n > 0) { sb.append(Alphabet(((n % base).toInt))); n /= base }
    while (sb.length < 27) sb.append('0')
    sb.reverse.toString
  }
}
