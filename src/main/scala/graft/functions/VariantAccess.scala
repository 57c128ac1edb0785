package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CaseWhen, CreateNamedStruct, Expression, GenericInternalRow, GetStructField, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Het

/** Single-pass NATIVE access into a variant's container caches — the
  * codegen core of `v[field]` / `v[i]` on union-typed columns (reference
  * semantics: runtime/sam/expr/eval.go Index, function/fields.go).
  *
  * Why a custom Expression: composing this from built-ins either uses a
  * higher-order `filter` (CodegenFallback — it knocks the WHOLE projection
  * out of whole-stage codegen) or re-evaluates the container lookup once
  * per promoted leaf field (7× per row, each a fresh array scan). This
  * expression scans the cache array exactly once per row, builds one
  * output row, and stays inside whole-stage codegen via a static helper
  * call — the preference order SURVEY.md §5 mandates (native Expression
  * over UDF).
  *
  * Inputs: `container` is the variant's `m` entries array (byName=true)
  * or `a` elements array (byName=false); `key` is the field name
  * (string) or element index (int, negative from the end). Output is a
  * FULL variant struct: hit → the promoted leaf (its own containers keep
  * only their `z` text), miss/out-of-range/null-key → error("missing"),
  * hit-on-null-leaf → null (a null variant value).
  */
case class VariantAccess(container: Expression, key: Expression, byName: Boolean)
    extends BinaryExpression {

  override def left: Expression = container
  override def right: Expression = key
  override def dataType: DataType = Het.variantType
  override def nullable: Boolean = true
  override def prettyName: String = if (byName) "variant_get" else "variant_index"

  override def eval(input: InternalRow): Any = {
    val arr = container.eval(input)
    if (arr == null) null // callers guard on cache presence; stay safe
    else {
      val k = key.eval(input)
      if (byName) VariantAccess.getField(arr.asInstanceOf[ArrayData], k)
      else VariantAccess.indexOf(arr.asInstanceOf[ArrayData], k)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cCode = container.genCode(ctx)
    val kCode = key.genCode(ctx)
    val helper = ctx.addReferenceObj("variantAccess", VariantAccess,
      "graft.functions.VariantAccess$")
    val method = if (byName) "getField" else "indexOf"
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(code = code"""
      ${cCode.code}
      ${kCode.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${cCode.isNull}) {
        ${ev.value} = $helper.$method(${cCode.value},
          ${kCode.isNull} ? null : (Object) ${kCode.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantAccess =
    copy(container = newLeft, key = newRight)
}

/** One FIELD of a VariantAccess result, without materializing the row —
  * `get(v, f).n` becomes a single array scan returning the double. Planted
  * by [[CollapseVariantAccess]]; never constructed directly by operators.
  */
case class VariantAccessField(container: Expression, key: Expression,
    byName: Boolean, ordinal: Int) extends BinaryExpression {

  override def left: Expression = container
  override def right: Expression = key
  override def dataType: DataType = Het.variantType.fields(ordinal).dataType
  override def nullable: Boolean = true
  override def prettyName: String = s"variant_field_$ordinal"

  override def eval(input: InternalRow): Any = {
    val arr = container.eval(input)
    if (arr == null) null
    else VariantAccess.fieldAt(
      arr.asInstanceOf[ArrayData], key.eval(input), byName, ordinal)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cCode = container.genCode(ctx)
    val kCode = key.genCode(ctx)
    val helper = ctx.addReferenceObj("variantAccess", VariantAccess,
      "graft.functions.VariantAccess$")
    val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .boxedType(dataType)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val default = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .defaultValue(dataType)
    // explicit unboxing — Janino's implicit boxing conversions are spotty
    val unbox =
      if (org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
            .isPrimitiveType(dataType)) s"(($boxed) r).${javaType}Value()"
      else s"($boxed) r"
    ev.copy(code = code"""
      ${cCode.code}
      ${kCode.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = $default;
      if (!${cCode.isNull}) {
        Object r = $helper.fieldAt(${cCode.value},
          ${kCode.isNull} ? null : (Object) ${kCode.value}, $byName, $ordinal);
        if (r != null) { ${ev.isNull} = false; ${ev.value} = $unbox; }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VariantAccessField =
    copy(container = newLeft, key = newRight)
}

object VariantAccess {

  /** zed error("missing") as a variant row (complex.go:28-40). */
  val errMissingRow: InternalRow = new GenericInternalRow(Array[Any](
    5, null, null, null, UTF8String.fromString("error(string)"),
    UTF8String.fromString("\"missing\""), null, null))

  /** Sentinel distinguishing "field/index not present" (→ errMissing)
    * from "present but null value" (→ null variant) in the leaf finders.
    */
  val MISS: InternalRow = new GenericInternalRow(6)

  /** Find the leaf for field `key` in the `m` entries array: MISS when the
    * field is absent, null when present-but-null, else the leaf row
    * (zero-copy — a view into the entries array).
    */
  def findLeaf(m: ArrayData, key: Any): InternalRow = {
    if (key == null) return MISS
    val k = key.asInstanceOf[UTF8String]
    val n = m.numElements()
    var i = 0
    while (i < n) {
      if (!m.isNullAt(i)) {
        val e = m.getStruct(i, 2)
        if (!e.isNullAt(0) && e.getUTF8String(0).equals(k))
          return if (e.isNullAt(1)) null else e.getStruct(1, 6)
      }
      i += 1
    }
    MISS
  }

  /** Positional twin of findLeaf over the `a` elements array. */
  def pickLeaf(a: ArrayData, key: Any): InternalRow = {
    if (key == null) return MISS
    val n = a.numElements()
    var i = key.asInstanceOf[Number].intValue
    if (i < 0) i += n
    if (i < 0 || i >= n) MISS
    else if (a.isNullAt(i)) null
    else a.getStruct(i, 6)
  }

  /** One leaf FIELD (k/n/s/b/t/z by ordinal) of the access result, boxed;
    * null for null-value hits and for the null fields of error("missing").
    * Lets the optimizer collapse `get(v,f).n` to a no-allocation pick.
    */
  def fieldAt(container: ArrayData, key: Any, byName: Boolean, ordinal: Int): Any = {
    val leaf = if (byName) findLeaf(container, key) else pickLeaf(container, key)
    if (leaf == null) null
    else if (leaf eq MISS) ordinal match {
      case 0 => Integer.valueOf(5)
      case 4 => UTF8String.fromString("error(string)")
      case 5 => UTF8String.fromString("\"missing\"")
      case _ => null
    }
    else if (ordinal >= 6) null // a/m: promoted leaves carry no caches
    else if (leaf.isNullAt(ordinal)) null
    else ordinal match {
      case 0 => Integer.valueOf(leaf.getInt(0))
      case 1 => java.lang.Double.valueOf(leaf.getDouble(1))
      case 2 => leaf.getUTF8String(2)
      case 3 => java.lang.Boolean.valueOf(leaf.getBoolean(3))
      case _ => leaf.getUTF8String(ordinal)
    }
  }

  /** Leaf {k,n,s,b,t,z} → full variant row (a/m absent) — the row-level
    * twin of Het.promote.
    */
  private def promote(leaf: InternalRow): InternalRow =
    if (leaf == null) null
    else new GenericInternalRow(Array[Any](
      if (leaf.isNullAt(0)) null else leaf.getInt(0),
      if (leaf.isNullAt(1)) null else leaf.getDouble(1),
      if (leaf.isNullAt(2)) null else leaf.getUTF8String(2),
      if (leaf.isNullAt(3)) null else leaf.getBoolean(3),
      if (leaf.isNullAt(4)) null else leaf.getUTF8String(4),
      if (leaf.isNullAt(5)) null else leaf.getUTF8String(5),
      null, null))

  /** Scan the `m` entries array once for field `key`. */
  def getField(m: ArrayData, key: Any): InternalRow = {
    val leaf = findLeaf(m, key)
    if (leaf eq MISS) errMissingRow else promote(leaf)
  }

  /** O(1) positional pick from the `a` elements array. */
  def indexOf(a: ArrayData, key: Any): InternalRow = {
    val leaf = pickLeaf(a, key)
    if (leaf eq MISS) errMissingRow else promote(leaf)
  }
}

/** Optimizer rule: when only one field of a variant access result is
  * consumed (`get(v,f).n`, `v[i].s`, …), skip materializing the variant
  * row entirely. Two rewrites, applied top-down so the second sees what
  * the first exposes:
  *
  *   1. `GetStructField(CaseWhen(...))` where some branch is a
  *      VariantAccess → push the extraction into every branch (the CASE is
  *      the kind-dispatch ZvOps builds; per-branch extraction is what
  *      Spark's SimplifyExtractValueOps does for CreateNamedStruct).
  *   2. `GetStructField(VariantAccess)` → [[VariantAccessField]] — one
  *      array scan, no row allocation.
  *
  * Registered via spark.experimental.extraOptimizations (GraftSession).
  */
object CollapseVariantAccess extends Rule[LogicalPlan] {

  /** Push only into CASEs whose branches actually get cheaper: a variant
    * access (row alloc avoided), a struct literal/constructor (field
    * plucked at plan time), or nested such CASEs.
    */
  private def pushable(e: Expression): Boolean = e match {
    case cw: CaseWhen =>
      (cw.branches.map(_._2) ++ cw.elseValue).exists(pushable)
    case _: VariantAccess => true
    case _: CreateNamedStruct => true
    case Literal(null, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case g @ GetStructField(cw: CaseWhen, ord, name)
        if cw.dataType.isInstanceOf[StructType] && pushable(cw) =>
      CaseWhen(
        cw.branches.map { case (c, v) => (c, GetStructField(v, ord, name)) },
        cw.elseValue.map(GetStructField(_, ord, name)))
    case GetStructField(va: VariantAccess, ord, _) =>
      VariantAccessField(va.container, va.key, va.byName, ord)
    // the two collapses SimplifyExtractValueOps would do if it re-ran
    // after the push above (the user-rule batch is the last one)
    case GetStructField(cns: CreateNamedStruct, ord, _) => cns.valExprs(ord)
    case g @ GetStructField(Literal(null, _: StructType), _, _) =>
      Literal(null, g.dataType)
  }
}
