package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's arithmetic type-promotion lattice on RUNTIME type
  * names (runtime/sam/expr/coerce/promote.go Promote): given the two
  * operand type texts from a variant's `t` slot, produce the promoted
  * RESULT type name — per row, so `a+b` over a union (int64,float64)
  * member types int when both members are int and float when either
  * floats (runtime/vam/op/ztests/arith.yaml pins this).
  *
  * Named types resolve to their underlying primitive first (Value.Under;
  * "port=uint16" promotes as uint16, and the name does NOT survive into
  * the result — port-math.yaml: p1+1 = 101 bare int64).
  *
  * Returns NULL for the reference's ErrIncompatibleTypes (a number with
  * a non-number, or two different non-number types); returns the COMMON
  * type name when both sides carry the same non-number type, which the
  * caller maps to string concatenation for `+` or the "type <t>
  * incompatible with '<op>' operator" error (eval.go Add/Subtract/...).
  */
case class PromoteTypeName(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "zed_promote_type"

  override def eval(input: InternalRow): Any =
    PromoteTypeName.promote(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lCode = left.genCode(ctx)
    val rCode = right.genCode(ctx)
    val helper = ctx.addReferenceObj("promoteType", PromoteTypeName,
      "graft.functions.PromoteTypeName$")
    ev.copy(code = code"""
      ${lCode.code}
      ${rCode.code}
      UTF8String ${ev.value} = $helper.promote(
        ${lCode.isNull} ? null : (UTF8String) ${lCode.value},
        ${rCode.isNull} ? null : (UTF8String) ${rCode.value});
      boolean ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PromoteTypeName =
    copy(left = newLeft, right = newRight)
}

object PromoteTypeName {

  // zed type IDs (super.go id constants) for the numeric lattice
  private val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    for ((n, i) <- Seq(
      "uint8" -> 0, "uint16" -> 1, "uint32" -> 2, "uint64" -> 3,
      "uint128" -> 4, "uint256" -> 5,
      "int8" -> 6, "int16" -> 7, "int32" -> 8, "int64" -> 9,
      "int128" -> 10, "int256" -> 11,
      "duration" -> 12, "time" -> 13,
      "float16" -> 14, "float32" -> 15, "float64" -> 16,
      "float128" -> 17, "float256" -> 18,
      "decimal32" -> 19, "decimal64" -> 20, "decimal" -> 20,
      "decimal128" -> 21, "decimal256" -> 22)) m.put(n, i)
    m
  }

  private val names: Array[UTF8String] = Array(
    "uint8", "uint16", "uint32", "uint64", "uint128", "uint256",
    "int8", "int16", "int32", "int64", "int128", "int256",
    "duration", "time", "float16", "float32", "float64",
    "float128", "float256",
    "decimal32", "decimal64", "decimal128", "decimal256"
  ).map(UTF8String.fromString)

  // promote.go promoteFloat / promoteInt, indexed by type id
  private val promoteFloat = Array(
    14, 14, 15, 16, 17, 18, 14, 14, 15, 16, 17, 18,
    16, 16, 14, 15, 16, 17, 18, 15, 16, 17, 18)
  private val promoteInt = Array(
    6, 7, 8, 9, 10, 11, 6, 7, 8, 9, 10, 11,
    9, 9, 14, 15, 16, 17, 18, 19, 20, 21, 22)

  @inline private def isUnsigned(id: Int): Boolean = id <= 5
  @inline private def isSigned(id: Int): Boolean = id >= 6 && id <= 13
  @inline private def isFloat(id: Int): Boolean = id >= 14 && id <= 18

  private val NULLNAME = UTF8String.fromString("null")

  /** Value.Under on the type TEXT: named components render name=inner,
    * so the underlying primitive is the last '='-segment.
    */
  @inline private def under(t: UTF8String): UTF8String = {
    val b = t.getBytes
    var i = b.length - 1
    while (i >= 0 && b(i) != '=') i -= 1
    if (i < 0) t else UTF8String.fromBytes(b, i + 1, b.length - i - 1)
  }

  /** Null marker = ErrIncompatibleTypes; otherwise the promoted name. */
  def promote(lt0: UTF8String, rt0: UTF8String): UTF8String = {
    val lNull = lt0 == null || lt0.equals(NULLNAME)
    val rNull = rt0 == null || rt0.equals(NULLNAME)
    if (lNull && rNull) return NULLNAME
    if (lNull) return under(rt0)
    if (rNull) return under(lt0)
    val lt = under(lt0)
    val rt = under(rt0)
    val a0 = ids.get(lt.toString)
    val b0 = ids.get(rt.toString)
    if (a0 == null || b0 == null) {
      // a non-number: equal types promote to themselves (string+string
      // concatenates; same-type others get the type-incompatible error),
      // anything else is ErrIncompatibleTypes
      return if (lt.equals(rt)) lt else null
    }
    var a = a0.intValue
    var b = b0.intValue
    if (a != b) {
      if (isFloat(a) && !isFloat(b)) b = promoteFloat(b)
      else if (isFloat(b) && !isFloat(a)) a = promoteFloat(a)
      else if (isSigned(a) && isUnsigned(b)) b = promoteInt(b)
      else if (isSigned(b) && isUnsigned(a)) a = promoteInt(a)
    }
    names(math.max(a, b))
  }
}
