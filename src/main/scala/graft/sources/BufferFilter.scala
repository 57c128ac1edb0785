package graft.sources

import org.apache.spark.sql.sources._

/** Pre-decode frame pruning for the ZNG scan — the reference's
  * BufferFilter idea (runtime/sam/expr/bufferfilter.go:20-45): when a
  * pushed-down predicate implies some literal string MUST appear in any
  * matching row, scan the decompressed values frame for those bytes
  * BEFORE building a single row. ZNG encodes strings as raw UTF-8 in the
  * frame body, so "pattern absent from frame" soundly implies "no row in
  * this frame can satisfy the predicate" — the frame's rows are skipped
  * wholesale (I/O + one memmem, no tag walking, no row allocation).
  *
  * The prefilter is conservative by construction: a coincidental byte
  * match in a non-string field just means the frame decodes normally and
  * the real predicate (which Spark re-evaluates above the scan — filters
  * are reported as residual) drops the rows. Never a false negative, so
  * correctness is Spark's; this is purely a scan-rate multiplier on
  * selective searches over 100 TB of ZNG.
  */
sealed trait BufferFilter extends Serializable {
  def matches(buf: Array[Byte], len: Int): Boolean
}

/** Boyer-Moore-Horspool substring search, pattern-compiled once on the
  * driver and shipped to every task (the reference uses the same
  * algorithm family for its frame prefilter).
  */
final class BytePattern(val bytes: Array[Byte]) extends Serializable {
  private val skip: Array[Int] = {
    val s = Array.fill(256)(bytes.length)
    var i = 0
    while (i < bytes.length - 1) { s(bytes(i) & 0xff) = bytes.length - 1 - i; i += 1 }
    s
  }
  def find(buf: Array[Byte], len: Int): Boolean = {
    val m = bytes.length
    if (m == 0) return true
    var i = 0
    val limit = len - m
    while (i <= limit) {
      var j = m - 1
      while (j >= 0 && buf(i + j) == bytes(j)) j -= 1
      if (j < 0) return true
      i += skip(buf(i + m - 1) & 0xff)
    }
    false
  }
}

final case class BfPattern(p: BytePattern) extends BufferFilter {
  def matches(buf: Array[Byte], len: Int): Boolean = p.find(buf, len)
}
final case class BfAnd(l: BufferFilter, r: BufferFilter) extends BufferFilter {
  def matches(buf: Array[Byte], len: Int): Boolean =
    l.matches(buf, len) && r.matches(buf, len)
}
final case class BfOr(l: BufferFilter, r: BufferFilter) extends BufferFilter {
  def matches(buf: Array[Byte], len: Int): Boolean =
    l.matches(buf, len) || r.matches(buf, len)
}

object BufferFilter {

  /** Derive a frame prefilter from the scan's pushed-down conjuncts.
    * Conjuncts that don't imply a literal string are simply ignored
    * (weakening the prefilter, never wrong); an OR contributes only when
    * BOTH branches imply one.
    */
  def fromFilters(filters: Array[Filter], stringCols: Set[String]): Option[BufferFilter] = {
    val parts = filters.flatMap(one(_, stringCols))
    parts.reduceOption(BfAnd(_, _))
  }

  private def pat(v: String): Option[BufferFilter] = {
    val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.isEmpty) None else Some(BfPattern(new BytePattern(b)))
  }

  private def one(f: Filter, sc: Set[String]): Option[BufferFilter] = f match {
    case EqualTo(a, v: String) if sc(a)         => pat(v)
    case EqualNullSafe(a, v: String) if sc(a)   => pat(v)
    case StringContains(a, v) if sc(a)          => pat(v)
    case StringStartsWith(a, v) if sc(a)        => pat(v)
    case StringEndsWith(a, v) if sc(a)          => pat(v)
    case In(a, vs) if sc(a) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      val alts = vs.map(v => pat(v.asInstanceOf[String]))
      if (alts.exists(_.isEmpty)) None else Some(alts.flatten.reduce(BfOr(_, _)))
    case And(l, r) =>
      (one(l, sc), one(r, sc)) match {
        case (Some(a), Some(b)) => Some(BfAnd(a, b))
        case (a, b)             => a.orElse(b)
      }
    case Or(l, r) =>
      for { a <- one(l, sc); b <- one(r, sc) } yield BfOr(a, b)
    case _ => None
  }
}
