package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.{Decimal, DecimalType}

/** Exact 128-bit integer sum with a PLAIN-LONG inner loop.
  *
  * The money aggregates run in the exact cents domain (long), which keeps
  * whole-stage codegen and long-adder accumulators — but a single long
  * wraps once a group's sum passes 2^63 (~9·10⁹ rows/group for q1's
  * discounted price at 100 TB the bound is reachable). This aggregate
  * keeps the per-row cost at a handful of long ops (add + carry bit
  * tricks, no BigDecimal anywhere in the loop) and widens the RESULT to
  * an exact decimal(38,0) once per group:
  *
  *   buffer = (lo, hi) — a two's-complement int128; update adds the value
  *   into lo with an unsigned-carry into hi plus the value's sign
  *   extension, merge adds the two int128s the same way, evaluate
  *   reassembles hi·2⁶⁴ + unsigned(lo) as a decimal.
  *
  * Sum of an empty/all-null group is null (Spark sum semantics).
  */
case class SumInt128(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "sum_int128"

  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val isEmpty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(lo, hi, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  private def carryOf(a: Expression, b: Expression, sum: Expression): Expression =
    // unsigned carry-out of a+b: ((a & b) | ((a | b) & ~sum)) >>> 63
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    // a null input adds zero through the same carry math (signext(0)=0,
    // carry(lo,0)=0) — no per-slot If/branch in the generated update
    val vz = Coalesce(Seq(child, Literal(0L)))
    val newLo = Add(lo, vz)
    val newHi = Add(Add(hi, ShiftRight(vz, Literal(63))), carryOf(lo, vz, newLo))
    Seq(newLo, newHi, And(isEmpty, IsNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = Add(lo.left, lo.right)
    val newHi = Add(Add(hi.left, hi.right), carryOf(lo.left, lo.right, newLo))
    Seq(newLo, newHi, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DecimalType(38, 0)), Int128ToDecimal(lo, hi))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumInt128 = copy(child = newChildren.head)
}

/** (lo, hi) two's-complement int128 → exact decimal(38,0); once per group. */
case class Int128ToDecimal(lo: Expression, hi: Expression) extends BinaryExpression {

  override def left: Expression = lo
  override def right: Expression = hi
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = false
  override def prettyName: String = "int128_to_decimal"

  override def eval(input: InternalRow): Any =
    Int128ToDecimal.toDecimal(
      lo.eval(input).asInstanceOf[Long], hi.eval(input).asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = lo.genCode(ctx)
    val h = hi.genCode(ctx)
    val helper = ctx.addReferenceObj("int128dec", Int128ToDecimal,
      "graft.functions.Int128ToDecimal$")
    ev.copy(code = code"""
      ${l.code}
      ${h.code}
      org.apache.spark.sql.types.Decimal ${ev.value} =
        $helper.toDecimal(${l.value}, ${h.value});
      boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(lo = newLeft, hi = newRight)
}

object Int128ToDecimal {
  private val Two64 = BigInt(1) << 64

  def toDecimal(lo: Long, hi: Long): Decimal = {
    val uLo = BigInt(lo) & (Two64 - 1)
    Decimal(BigDecimal((BigInt(hi) << 64) + uLo), 38, 0)
  }
}
