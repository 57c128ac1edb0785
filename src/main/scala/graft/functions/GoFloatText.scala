package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go strconv.FormatFloat(d, 'g', -1, bits) text for a float column — the
  * reference's zson float rendering (zson/formatter.go). Output-boundary
  * only; the hot paths (writers, filters) never format floats as text.
  */
case class GoFloatText(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val (d, bits) = child.dataType match {
      case FloatType => (v.asInstanceOf[Float].toDouble, 32)
      case _ => (v.asInstanceOf[Double], 64)
    }
    UTF8String.fromString(graft.sources.ZFormat.goG(d, bits))
  }
  override protected def withNewChildInternal(newChild: Expression): GoFloatText =
    copy(child = newChild)
}
