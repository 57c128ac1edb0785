package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Het

/** Codegen'd zed regexp()/regexp_replace() (function/regexp.go): native
  * Catalyst expressions over a static helper with a compiled-pattern
  * cache — the search hot path stays inside whole-stage codegen instead
  * of dropping to a ScalaUDF with per-row Row conversion (the ZSortKey /
  * VariantAccess pattern).
  */
case class GoReMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = Het.variantType
  override def nullable: Boolean = true
  override def prettyName: String = "go_regexp"

  override def eval(input: InternalRow): Any =
    GoReExpr.matchRow(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val reC = left.genCode(ctx)
    val sC = right.genCode(ctx)
    val helper = ctx.addReferenceObj("goRe", GoReExpr, "graft.functions.GoReExpr$")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    val u8 = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(code = code"""
      ${reC.code}
      ${sC.code}
      $rowCls ${ev.value} = $helper.matchRow(
        ${reC.isNull} ? null : ($u8) ${reC.value},
        ${sC.isNull} ? null : ($u8) ${sC.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GoReMatch =
    copy(left = newLeft, right = newRight)
}

case class GoReReplace(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = Het.variantType
  override def nullable: Boolean = true
  override def prettyName: String = "go_regexp_replace"

  override def eval(input: InternalRow): Any =
    GoReExpr.replaceRow(
      first.eval(input).asInstanceOf[UTF8String],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sC = first.genCode(ctx)
    val reC = second.genCode(ctx)
    val nwC = third.genCode(ctx)
    val helper = ctx.addReferenceObj("goRe", GoReExpr, "graft.functions.GoReExpr$")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    val u8 = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(code = code"""
      ${sC.code}
      ${reC.code}
      ${nwC.code}
      $rowCls ${ev.value} = $helper.replaceRow(
        ${sC.isNull} ? null : ($u8) ${sC.value},
        ${reC.isNull} ? null : ($u8) ${reC.value},
        ${nwC.isNull} ? null : ($u8) ${nwC.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): GoReReplace = copy(first = f, second = s, third = t)
}

object GoReExpr extends Serializable {

  private val STRING = UTF8String.fromString("string")
  private val ARR_STRING = UTF8String.fromString("[string]")
  private val ERR_STRING = UTF8String.fromString("error(string)")

  /** Per-thread compiled-pattern cache (search loops reuse one regex).
    * Transient: ThreadLocal is not serializable, and the module's
    * readResolve restores the singleton (with its cache) on the far side.
    */
  @transient private lazy val cache = new ThreadLocal[java.util.LinkedHashMap[String, AnyRef]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, AnyRef](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, AnyRef]): Boolean = size() > 64
      }
  }

  /** Right(pattern) or Left(Go-worded error message). */
  private def compiled(re: String): AnyRef = {
    val c = cache.get()
    var v = c.get(re)
    if (v == null) {
      v = GoRe.goError(re) match {
        case Some(msg) => Left(msg)
        case None => Right(java.util.regex.Pattern.compile(GoRe.toJavaPattern(re)))
      }
      c.put(re, v)
    }
    v
  }

  private def errRow(msg: String): InternalRow =
    new GenericInternalRow(Array[Any](
      5, null, null, null, ERR_STRING,
      UTF8String.fromString("\"" + msg.replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\""),
      null, null, null))

  private def strLeaf(s: String): InternalRow =
    new GenericInternalRow(Array[Any](
      2, null, UTF8String.fromString(s), null, STRING, null))

  def matchRow(re: UTF8String, s: UTF8String): InternalRow = {
    if (re == null || s == null) return null
    compiled(re.toString) match {
      case Left(msg: String) => errRow(s"regexp: $msg")
      case Right(p: java.util.regex.Pattern) =>
        val m = p.matcher(s.toString)
        if (!m.find()) return null
        val groups = new Array[Any](m.groupCount() + 1)
        var g = 0
        while (g <= m.groupCount()) {
          groups(g) = strLeaf(Option(m.group(g)).getOrElse(""))
          g += 1
        }
        new GenericInternalRow(Array[Any](
          4, null, null, null, ARR_STRING, null,
          new GenericArrayData(groups), null, null))
      case _ => null
    }
  }

  def replaceRow(s: UTF8String, re: UTF8String, nw: UTF8String): InternalRow = {
    if (re == null || nw == null)
      return errRow("regexp_replace: 2nd and 3rd args cannot be null")
    if (s == null) return null
    compiled(re.toString) match {
      case Left(msg: String) => errRow(s"regexp_replace: $msg")
      case Right(p: java.util.regex.Pattern) =>
        try new GenericInternalRow(Array[Any](
          2, null,
          UTF8String.fromString(p.matcher(s.toString)
            .replaceAll(GoRe.toJavaReplacement(nw.toString))),
          null, STRING, null, null, null, null))
        catch { case _: Exception =>
          errRow(s"regexp_replace: bad replacement: `$nw`")
        }
      case _ => null
    }
  }
}
