package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Shaper

/** Heterogeneity: zed's "super-structured" stream of mixed-type values on
  * top of relational frames (reference: complex.go TypeUnion :290,
  * type.go:479-497 type values, type.go:396-477 CompareTypes).
  *
  * Two mechanisms, both Spark-first:
  *
  *  1. **Tagged fuse** — a mixed stream is the fused (unionByName) frame
  *     plus a `__type` column carrying each row's ORIGINAL record type as a
  *     zed type string. That makes `typeof(this)` a real runtime value:
  *     `count() by typeof(this)` and `sample` (one representative per
  *     shape) are ordinary group-bys on the tag — distributed, partial-agg
  *     friendly, no row-level type machinery.
  *
  *  2. **Variant columns** — a truly mixed-type scalar column is a tagged
  *     struct {k, n, s, b, t} (kind rank, numeric, string, bool, zed type
  *     name). Constructors, accessors, and an orderable key implement
  *     zed's cross-type total order: values sort by kind first
  *     (CompareTypes' Kind compare), then within family (numbers
  *     numerically regardless of width — the coercion lattice).
  */
object Het {

  val typeTag = "__type"

  /** Tag every row with its frame's zed record type. */
  def tag(df: DataFrame): Column = lit(Shaper.zedTypeOf(df.schema))

  /** Fuse heterogeneous frames, remembering each row's original type —
    * the engine's representation of a mixed value sequence.
    */
  def fuseTagged(dfs: DataFrame*): DataFrame =
    dfs.map(df => df.withColumn(typeTag, tag(df)))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Runtime `typeof(this)`: the tag when present, else the static type.
    * A "null(<rec>)" tag (top-level typed-null record) still has type
    * <rec> — typeof(null value of T) is T.
    */
  def typeofRow(df: DataFrame): Column =
    if (df.columns.contains(typeTag))
      regexp_replace(col(typeTag), "^null\\((.*)\\)$", "$1")
    else {
      val dataFields = df.schema.fields.toIndexedSeq.filterNot(f =>
        f.name == typeTag || f.metadata.contains("graft.scopeVar"))
      dataFields.map(_.name) match {
        case Seq("this") if graft.sources.ZsonIO.isVariantType(dataFields.head.dataType) =>
          variantTypeOf(col("this"))
        case Seq("this") =>
          // an untagged bare-value stream (yield <expr> dropped the tag):
          // typeof(this) is the VALUE's type, not a {this:…} wrapper
          lit(Shaper.zedTypeOf(dataFields.head.dataType))
        case _ => lit(Shaper.zedTypeOf(StructType(dataFields)))
      }
    }

  /** zed `sample` over a mixed stream: one representative value per
    * distinct type (shape/shaper.go; sample = `any(this) by typeof(this)`).
    */
  def sampleByType(df: DataFrame): DataFrame = {
    val all = df.columns.toIndexedSeq
    val md = if (df.columns.contains(typeTag)) df.schema(typeTag).metadata
             else org.apache.spark.sql.types.Metadata.empty
    // a runtime-typed bare stream (`over this | sample`) keys on the
    // BOXED value's own type, not the static tag; the FIRST value per
    // type wins, pinned by a monotonic row id (deterministic across
    // partitions, unlike first())
    val isVarThis = all.contains("this") &&
      graft.sources.ZsonIO.isVariantType(df.schema("this").dataType)
    val key = if (isVarThis) variantTypeOf(col("this")) else typeofRow(df)
    val sampled = df.withColumn("__sample_ord", monotonically_increasing_id())
      .groupBy(key.as("__sample_t"))
      .agg(min_by(struct(all.map(n => col(s"`$n`").as(n)): _*),
        col("__sample_ord")).as("sample"))
    if (all.contains(typeTag))
      sampled.select(all.map { n =>
        if (n == typeTag) col(s"sample.`$n`").as(n, md)
        else col(s"sample.`$n`").as(n)
      }: _*)
    else
      sampled.select(col("__sample_t").as(typeTag, md) +:
        all.map(n => col(s"sample.`$n`").as(n)): _*)
  }

  /** `is(<type>)` — filter a mixed stream down to one shape. */
  def isType(df: DataFrame, zedType: String): Column =
    typeofRow(df) === lit(zedType)

  // ---- variant (union-typed) scalar columns ---------------------------------

  /** Kind ranks for the cross-type order; null sorts last in asc (SQL/zed
    * default) via null handling, families follow CompareTypes' Kind order.
    */
  private def kindRank(dt: DataType): Int = dt match {
    case _ if dt.isInstanceOf[NumericType] => 0
    case TimestampType | TimestampNTZType | DateType => 1
    case StringType => 2
    case BooleanType => 3
    case _ => 4
  }

  private def zedPrimName(dt: DataType): String = Shaper.zedTypeOf(dt)

  /** Is a container's canonical text EXACTLY reconstructible from its
    * caches? Then the eager `z` shadow is skipped at construction.
    * Conservative: member types whose leaf payloads lose formatting
    * fidelity against the canonical form (decorated widths int32/16/8,
    * float32, decimal, dates, binaries, sub-second time carriers) and
    * non-identifier field names keep the eager text.
    */
  private val identName = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private def dropSafeZ(dt: DataType): Boolean = {
    def member(md: DataType): Boolean = md match {
      case LongType | DoubleType | StringType | BooleanType | NullType => true
      // container members carry their own eager leaf z (variant members
      // materialize it in leafOf) — reconstructed verbatim
      case _: StructType | _: ArrayType | _: MapType => true
      case _ => false
    }
    dt match {
      case st: StructType =>
        st.fields.forall(f => identName.matches(f.name) && member(f.dataType))
      case ArrayType(et, _) => member(et)
      case MapType(StringType, vt, _) => member(vt)
      case _ => false
    }
  }

  /** The scalar core of the variant encoding: {k,n,s,b,t,z}. Container
    * values inside a variant (array elements, record fields) are carried
    * as leaves — one nesting level is native, deeper containers ride as
    * ZSON text in the leaf's `z`.
    */
  val leafType: StructType = StructType(Seq(
    StructField("k", IntegerType),
    StructField("n", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("t", StringType),
    StructField("z", StringType)))

  /** Native container members of a variant: `a` holds array/set elements,
    * `m` holds record fields (and string-keyed map entries) as an entries
    * ARRAY — not a MapType, so variant columns stay legal in groupBy/
    * distinct/set operations. Both are PERFORMANCE CACHES over the
    * authoritative ZSON text in `z`: index/len/get/elems run natively in
    * codegen when they're populated, and fall back to the text path when
    * not (deeply nested extraction, exotic ops).
    */
  val elemsType: ArrayType = ArrayType(leafType)
  val fieldsType: ArrayType = ArrayType(StructType(Seq(
    StructField("f", StringType), StructField("v", leafType))))

  /** Deep-path cache `d`: flattened entries for RECORD paths of depth ≥2,
    * named with a NUL separator ("o<NUL>a" = field a of record field o —
    * NUL can't appear in a field name, so a literal "o.a" field never
    * collides). VariantAccess derives a hit's child m/d from these by
    * prefix, which keeps CHAINED field access (`v.o.a`, any record depth)
    * native in codegen instead of falling back to per-row text parsing.
    * Like a/m it is a pure cache over `z`: canonical() strips it, `m`
    * keeps direct-fields-only semantics (len, first-match get).
    */
  val variantType: StructType = StructType(leafType.fields ++ Seq(
    StructField("a", elemsType),
    StructField("m", fieldsType),
    StructField("d", fieldsType)))

  private[graft] def nullElems: Column = lit(null).cast(elemsType)
  private[graft] def nullFields: Column = lit(null).cast(fieldsType)

  /** NUL path separator for the deep cache (see variantType doc). */
  val pathSep = "\u0000"

  /** Assemble a variant struct; a/m/d default to absent (text-fallback). */
  def mkVariant(k: Column, n: Column, s: Column, b: Column, t: Column, z: Column,
                a: Column = nullElems, m: Column = nullFields,
                d: Column = nullFields): Column =
    struct(k.as("k"), n.as("n"), s.as("s"), b.as("b"), t.as("t"), z.as("z"),
      a.as("a"), m.as("m"), d.as("d"))

  /** Lift a leaf (a variant's array element / record field) back to a full
    * variant. Its own containers keep only their `z` text — ops one level
    * deeper take the text path.
    */
  def promote(leaf: Column): Column =
    when(leaf.isNull, lit(null).cast(variantType)).otherwise(mkVariant(
      leaf.getField("k"), leaf.getField("n"), leaf.getField("s"),
      leaf.getField("b"), leaf.getField("t"), leaf.getField("z")))

  /** Strip the a/m caches so value equality is text-canonical — REQUIRED
    * before whole-row distinct/groupBy where equal values may differ in
    * cache population (a promoted nested value has no caches; an ingested
    * one does).
    */
  def canonical(v: Column): Column =
    when(v.isNull, lit(null).cast(variantType)).otherwise(mkVariant(
      v.getField("k"), v.getField("n"), v.getField("s"),
      v.getField("b"), v.getField("t"), materialZ(v)))

  /** Canonicalize every top-level variant column of a frame (for uniq /
    * distinct / group-by-all-columns semantics).
    */
  def canonicalRows(df: DataFrame): DataFrame = {
    val hasVariant = df.schema.fields.exists(f =>
      graft.sources.ZsonIO.isVariantType(f.dataType))
    if (!hasVariant) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      if (graft.sources.ZsonIO.isVariantType(f.dataType)) canonical(col(f.name)).as(f.name)
      else col(f.name)
    }: _*)
  }

  /** A typed column as a LEAF struct (containers → ZSON text in z). */
  private def leafOf(c: Column, dt: DataType): Column = {
    if (dt == variantType)
      return when(c.isNull, lit(null).cast(leafType)).otherwise(
        struct(c.getField("k").as("k"), c.getField("n").as("n"),
          c.getField("s").as("s"), c.getField("b").as("b"),
          c.getField("t").as("t"), materialZ(c).as("z")))
    val container = dt.isInstanceOf[StructType] || dt.isInstanceOf[ArrayType] ||
      dt.isInstanceOf[MapType]
    val n = if (dt.isInstanceOf[NumericType]) c.cast(DoubleType)
            else if (dt == TimestampType || dt == TimestampNTZType) c.cast(DoubleType)
            else lit(null).cast(DoubleType)
    val s = if (dt == StringType) c else lit(null).cast(StringType)
    val b = if (dt == BooleanType) c else lit(null).cast(BooleanType)
    val z = if (container) graft.sources.ZsonIO.zsonOf(c, dt)
            else lit(null).cast(StringType)
    when(c.isNull, lit(null).cast(leafType)).otherwise(struct(
      lit(kindRank(dt)).as("k"), n.as("n"), s.as("s"), b.as("b"),
      lit(zedPrimName(dt)).as("t"), z.as("z")))
  }

  /** Wrap a typed column into the variant encoding. Containers carry
    * their ZSON text in `z` (the boxed form zed itself uses for values
    * inside a union — complex.go TypeUnion :290) AND, one level deep,
    * native leaf members in a/m so index/len/get stay inside codegen;
    * errors are kind 5 with the payload text in `z`.
    */
  def variant(c: Column, dt: DataType, tOverride: Option[Column] = None,
      zOverride: Option[Column] = None): Column = {
    // already variant — idempotent (name-based: nullability/metadata of a
    // computed variant column may differ from the canonical variantType)
    if (graft.sources.ZsonIO.isVariantType(dt)) return c
    val container = dt.isInstanceOf[StructType] || dt.isInstanceOf[ArrayType] ||
      dt.isInstanceOf[MapType]
    val n = if (dt.isInstanceOf[NumericType]) c.cast(DoubleType)
            else if (dt == TimestampType || dt == TimestampNTZType) c.cast(DoubleType)
            else lit(null).cast(DoubleType)
    val s = if (dt == StringType) c else lit(null).cast(StringType)
    val b = if (dt == BooleanType) c else lit(null).cast(BooleanType)
    // lazy-z: when the caches reconstruct the canonical text exactly,
    // skip building the eager text shadow entirely — no per-row string
    // assembly at construction, no text bytes in storage or shuffles;
    // render/canonical/compareKey re-derive it at the boundaries
    // an explicit zed-typed text shadow (set-ness, uint64, …) is always
    // eager — the caches can't reconstruct what the Spark type can't say
    val z = zOverride.getOrElse(
      if (container && !dropSafeZ(dt)) graft.sources.ZsonIO.zsonOf(c, dt)
      else lit(null).cast(StringType))
    val a = dt match {
      case ArrayType(et, _) => transform(c, x => leafOf(x, et))
      case _ => nullElems
    }
    val m = dt match {
      case st: StructType =>
        array(st.fields.toIndexedSeq.map { f =>
          struct(lit(f.name).as("f"), leafOf(c.getField(f.name), f.dataType).as("v"))
        }: _*)
      case MapType(StringType, vt, _) =>
        transform(map_entries(c), e => struct(
          e.getField("key").as("f"), leafOf(e.getField("value"), vt).as("v")))
      case _ => nullFields
    }
    // deep cache: NUL-joined entries for record paths of depth ≥2; an
    // entry under a null ancestor is a NULL ENTRY (not an entry with a
    // null leaf), so lookups under it report missing, matching the
    // text-path semantics of descending into a null record
    val d = dt match {
      case st: StructType =>
        def deepOf(prefix: String, cc: Column, nullGuard: Column,
            sst: StructType): Seq[Column] =
          sst.fields.toIndexedSeq.flatMap { f =>
            val name = prefix + pathSep + f.name
            val child = cc.getField(f.name)
            val entry = when(nullGuard, lit(null).cast(fieldsType.elementType))
              .otherwise(struct(lit(name).as("f"), leafOf(child, f.dataType).as("v")))
            entry +: (f.dataType match {
              case sub: StructType =>
                deepOf(name, child, nullGuard || child.isNull, sub)
              case _ => Seq.empty[Column]
            })
          }
        val entries = st.fields.toIndexedSeq.flatMap { f =>
          f.dataType match {
            case sub: StructType =>
              deepOf(f.name, c.getField(f.name), c.getField(f.name).isNull, sub)
            case _ => Seq.empty[Column]
          }
        }
        if (entries.isEmpty) nullFields else array(entries: _*)
      case _ => nullFields
    }
    when(c.isNull, lit(null).cast(variantType)).otherwise(
      mkVariant(lit(kindRank(dt)), n, s, b,
        tOverride.getOrElse(lit(zedPrimName(dt))), z, a, m, d))
  }

  /** A TYPE VALUE as a variant: kind 4 with the type text in `s` and
    * t="type" — matches ZValue.variantRow's encoding so renders as <…>.
    */
  def typeValueVariant(c: Column): Column =
    when(c.isNull, lit(null).cast(variantType)).otherwise(mkVariant(
      lit(4), lit(null).cast(DoubleType), c,
      lit(null).cast(BooleanType), lit("type"), lit(null).cast(StringType)))

  /** An error value as a variant literal — zed's error("missing") /
    * error("quiet") / error(<payload>) (complex.go:28-42).
    */
  def errorValue(payloadZson: Column, typeText: String = "error(string)"): Column =
    mkVariant(
      lit(5),
      lit(null).cast(DoubleType),
      lit(null).cast(StringType),
      lit(null).cast(BooleanType),
      lit(typeText),
      payloadZson)

  val errMissing: Column = errorValue(lit("\"missing\""))
  val errQuiet: Column = errorValue(lit("\"quiet\""))

  def isError(v: Column): Column = v.isNotNull && v.getField("k") === 5

  /** Build one variant column from the first non-null of several typed
    * alternatives (e.g. a column that is int in one branch, string in
    * another, after a fuse).
    */
  def variantOf(alts: (Column, DataType)*): Column =
    coalesce(alts.map { case (c, dt) => variant(c, dt) }: _*)

  /** Orderable key implementing the cross-type total order: kind first
    * (CompareTypes), then numeric value (coercion lattice: all number
    * widths compare numerically), then string, then bool.
    */
  def compareKey(v: Column): Column =
    // a null variant must yield a NULL key (not a struct of nulls, which
    // would sort before every non-null struct) so nulls-last works.
    // NaN ranks below every number (Go cmp.Compare semantics in the
    // reference's comparator) — Spark's double order puts NaN last.
    when(v.isNull, lit(null).cast(compareKeyType)).otherwise(struct(
      v.getField("k").as("k"),
      when(isnan(v.getField("n")), lit(0)).otherwise(lit(1)).as("nn"),
      v.getField("n").as("n"),
      v.getField("s").as("s"),
      v.getField("b").cast(IntegerType).as("b"),
      materialZ(v).as("z")))

  private val compareKeyType: StructType = StructType(Seq(
    StructField("k", IntegerType),
    StructField("nn", IntegerType),
    StructField("n", DoubleType),
    StructField("s", StringType),
    StructField("b", IntegerType),
    StructField("z", StringType)))

  /** zed `typeof` of a variant value. */
  /** typeof a boxed value: the t slot, with a NULL value typing as the
    * zed null type (typeof(null) = <null>, function/typeof.go).
    */
  def variantTypeOf(v: Column): Column =
    coalesce(v.getField("t"), lit("null"))

  /** zed `under`-style accessors (null when the member kind differs). */
  def asNumber(v: Column): Column = v.getField("n")
  def asString(v: Column): Column = v.getField("s")
  def asBool(v: Column): Column = v.getField("b")

  /** Render a variant value as its zed text form (for output/debug). */
  def render(v: Column): Column =
    graft.functions.Bridge.column(graft.functions.RenderVariant(
      graft.functions.Bridge.expression(v)))

  /** `z` materialized on demand: verbatim when stored (scalars with exact
    * text, non-cacheable containers), reconstructed from the caches when
    * the lazy-z carrier dropped it. The ONLY places needing this are the
    * text boundaries: canonical equality, the total-order compare key,
    * and text-parsing fallbacks.
    */
  def materialZ(v: Column): Column =
    when(v.getField("z").isNull &&
        (v.getField("a").isNotNull || v.getField("m").isNotNull), render(v))
      .otherwise(v.getField("z"))

  /** Fuse frames whose SHARED columns have conflicting types — zed forms a
    * union type (complex.go:290); here the conflicted columns become
    * variant structs while agreeing columns stay native. The fused frame
    * still sorts/aggregates under the cross-type total order via
    * compareKey.
    */
  def fuseVariant(dfs: DataFrame*): DataFrame = {
    val types = scala.collection.mutable.LinkedHashMap.empty[String, Set[DataType]]
    dfs.foreach(_.schema.fields.foreach { f =>
      types(f.name) = types.getOrElse(f.name, Set.empty) + f.dataType
    })
    val conflicted = types.filter(_._2.size > 1).keySet
    val prepared = dfs.map { df =>
      df.select(df.schema.fields.toIndexedSeq.map { f =>
        if (conflicted(f.name)) variant(col(f.name), f.dataType).as(f.name)
        else col(f.name)
      }: _*)
    }
    prepared.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Cross-type min/max over a variant column (agg under the total order):
    * min_by/max_by on the compare key.
    */
  /** min/max skip values that don't coerce with the running state
    * (agg/math.go consumeVal: "Skip invalid values") — so a mixed
    * number/string stream maxes over the NUMBERS; only a stream with no
    * numeric values at all falls back to the total order.
    */
  def minVariant(v: Column): Column = {
    val numeric = when(v.getField("n").isNotNull, v)
    coalesce(min_by(numeric, compareKey(numeric)), min_by(v, compareKey(v)))
  }
  def maxVariant(v: Column): Column = {
    val numeric = when(v.getField("n").isNotNull, v)
    coalesce(max_by(numeric, compareKey(numeric)), max_by(v, compareKey(v)))
  }

  /** Sort a frame by a variant column under the cross-type total order. */
  def sortByVariant(df: DataFrame, v: Column, asc: Boolean = true): DataFrame = {
    val key = compareKey(v)
    df.orderBy(if (asc) key.asc_nulls_last else key.desc_nulls_last)
  }

  /** Narrow a tagged frame filtered to ONE shape down to that shape's own
    * top-level columns (single-type writers: parquet per-shape split).
    */
  def narrowToShape(df: DataFrame, shapeText: String): DataFrame = {
    val t = graft.sources.ZType.strip(
      graft.sources.ZsonParser.parseType(
        graft.sources.ZType.stripNullWrap(shapeText)))
    t match {
      case graft.sources.ZType.Rec(fields) =>
        val have = df.columns.toSet
        val keep = fields.map(_._1).filter(have.contains)
        if (keep.nonEmpty) df.select(keep.map(n => col(s"`$n`")): _*)
        else df.drop(typeTag)
      case _ => df.drop(typeTag)
    }
  }
}
