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

  /** Type-aware variant: `fieldsOf` maps a value's type id to its record's
    * top-level field names (null = unknown → keep). Byte-pattern filters
    * ignore the context; [[BfFieldName]] uses it (fieldnamefinder.go).
    */
  def matchesTyped(buf: Array[Byte], len: Int,
                   fieldsOf: Int => java.util.Set[String]): Boolean =
    matches(buf, len)
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
  override def matchesTyped(buf: Array[Byte], len: Int,
      fieldsOf: Int => java.util.Set[String]): Boolean =
    l.matchesTyped(buf, len, fieldsOf) && r.matchesTyped(buf, len, fieldsOf)
}
final case class BfOr(l: BufferFilter, r: BufferFilter) extends BufferFilter {
  def matches(buf: Array[Byte], len: Int): Boolean =
    l.matches(buf, len) || r.matches(buf, len)
  override def matchesTyped(buf: Array[Byte], len: Int,
      fieldsOf: Int => java.util.Set[String]): Boolean =
    l.matchesTyped(buf, len, fieldsOf) || r.matchesTyped(buf, len, fieldsOf)
}

/** Field-NAME frame pruning (runtime/sam/expr/fieldnamefinder.go:13-55):
  * the pushed conjuncts require their columns to be PRESENT (non-null
  * comparisons), so a frame whose value type ids all lack a required
  * field can't produce a matching row. The walk reads only uvarint ids
  * and tag lengths — no value decode.
  */
final case class BfFieldName(names: Set[String]) extends BufferFilter {
  // without a type context the finder can't decide — keep the frame
  def matches(buf: Array[Byte], len: Int): Boolean = true

  override def matchesTyped(buf: Array[Byte], len: Int,
      fieldsOf: Int => java.util.Set[String]): Boolean = {
    var pos = 0
    var lastId = -1
    while (pos < len) {
      // uvarint id
      var id = 0L
      var shift = 0
      var b = 0
      do {
        if (pos >= len) return true // malformed — keep
        b = buf(pos) & 0xff; pos += 1
        id |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      // value skip: zcode tag (uvarint); 0 = null, else len = tag-1
      var tag = 0L
      shift = 0
      do {
        if (pos >= len) return true
        b = buf(pos) & 0xff; pos += 1
        tag |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      if (tag != 0) pos += (tag - 1).toInt
      if (id.toInt != lastId) {
        lastId = id.toInt
        val fs = fieldsOf(lastId)
        if (fs == null) return true // unknown/non-record — keep
        var ok = true
        val it = names.iterator
        while (ok && it.hasNext) ok = fs.contains(it.next())
        if (ok) return true // this type satisfies every required field
      }
    }
    false
  }
}

object BufferFilter {

  /** The field names a prefilter REQUIRES present (conjunctive part
    * only) — lets the scan skip whole frames before LZ4 decompression
    * when the stream's type context can't satisfy them.
    */
  def requiredNamesIn(bf: BufferFilter): Set[String] = bf match {
    case BfFieldName(ns) => ns
    case BfAnd(l, r) => requiredNamesIn(l) ++ requiredNamesIn(r)
    case _ => Set.empty
  }

  /** Derive a frame prefilter from the scan's pushed-down conjuncts.
    * Conjuncts that don't imply a literal string are simply ignored
    * (weakening the prefilter, never wrong); an OR contributes only when
    * BOTH branches imply one.
    */
  def fromFilters(filters: Array[Filter], stringCols: Set[String]): Option[BufferFilter] = {
    val parts = filters.flatMap(one(_, stringCols))
    val fields = requiredFields(filters)
    val withNames =
      if (fields.isEmpty) parts.toSeq
      else parts.toSeq :+ BfFieldName(fields)
    withNames.reduceOption(BfAnd(_, _))
  }

  /** Top-level columns the conjuncts force PRESENT: a null operand fails
    * these predicates, so a type lacking the field can't match. IsNull /
    * null-safe comparisons do NOT contribute (they match absent fields).
    */
  private[sources] def requiredFields(filters: Array[Filter]): Set[String] = {
    def head(a: String): String = a.split('.').head
    filters.collect {
      case EqualTo(a, v) if v != null => head(a)
      case GreaterThan(a, _) => head(a)
      case GreaterThanOrEqual(a, _) => head(a)
      case LessThan(a, _) => head(a)
      case LessThanOrEqual(a, _) => head(a)
      case StringContains(a, _) => head(a)
      case StringStartsWith(a, _) => head(a)
      case StringEndsWith(a, _) => head(a)
      case In(a, vs) if vs.nonEmpty => head(a)
    }.toSet - graft.operators.Het.typeTag
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
