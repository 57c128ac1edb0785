package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving binary sort key for zed TYPE VALUES and whole-record
  * values under the reference's CompareTypes total order (type.go:396-477;
  * sort.go comparator). Codegen'd via a static helper — the projection
  * stays inside whole-stage codegen instead of dropping to a ScalaUDF
  * with per-row Row conversion (the VariantAccess pattern,
  * VariantAccess.scala:40).
  *
  * mode 0: a TYPE TEXT (`{a:int64}`/`foo=int64`) → CompareTypes key
  * mode 1: a rendered record VALUE → field-wise total-order key
  * mode 2: a rendered VALUE → its type's CompareTypes key
  */
case class ZSortKey(child: Expression, mode: Int) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = s"z_sort_key_$mode"

  override def nullSafeEval(input: Any): Any =
    ZSortKey.key(mode, input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ctx.addReferenceObj("zSortKey", ZSortKey,
      "graft.functions.ZSortKey$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.key($mode, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ZSortKey =
    copy(child = newChild)
}

object ZSortKey {
  /** Static entry for generated code (and eval). */
  def key(mode: Int, s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val text = s.toString
    mode match {
      case 0 => graft.sources.ZValue.typeSortKey(text)
      case 1 => graft.sources.ZValue.recordSortKey(text)
      case _ => graft.sources.ZValue.valueTypeKey(text)
    }
  }
}
