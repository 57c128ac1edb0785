package graft.lang

/** AST for the Zed/SuperPipe language subset (reference grammar:
  * compiler/parser/parser.peg; operator semantics compiler/semantic/op.go).
  * The shapes mirror the reference's ast package conceptually but are
  * reduced to what the Spark compiler consumes.
  */
sealed trait Expr

object Expr {
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StringLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  /** ISO date/timestamp literal; ns since epoch (zed time is ns-native). */
  final case class TimeLit(epochNs: Long, text: String) extends Expr
  /** Duration literal like 1h / 30m / 250ms; exact ns. */
  final case class DurationLit(ns: Long, text: String) extends Expr
  /** Dotted field path; empty parts = `this` (the whole value). */
  final case class Path(parts: Seq[String]) extends Expr
  final case class Index(e: Expr, idx: Expr) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr
  final case class Cond(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Call(fn: String, args: Seq[Expr]) extends Expr
  final case class RecordLit(fields: Seq[(String, Expr)]) extends Expr
  final case class ArrayLit(items: Seq[Expr]) extends Expr
  /** lateral subquery in expression position: `(over e | …)`
    * (reference OverExpr, compiler/kernel/expr.go:102)
    */
  final case class SubQuery(p: Pipeline) extends Expr

  /** f-string kept structurally for canonical printing (preserve mode
    * only; the compiler sees the lowered __concat form).
    */
  final case class FString(elems: Seq[Either[String, Expr]]) extends Expr

  /** Call to a self- or mutually-recursive user `func` — macro expansion
    * cannot terminate, so the call carries the whole func table and
    * evaluates row-level in a small interpreter (the reference evaluates
    * funcs per call too, semantic/func.go).
    */
  final case class RecCall(name: String,
      table: Map[String, (Seq[String], Expr)], args: Seq[Expr]) extends Expr

  /** Default output-field name inference (semantic/op.go: field inferred
    * from the right-hand side — `by lower(s)` names the key `lower`).
    */
  def inferName(e: Expr): String = e match {
    case Path(parts) if parts.nonEmpty => parts.last
    case Path(_) => "this"
    // `cut quiet(a.b)` names the field by the quieted path (cut.md)
    case Call("quiet", Seq(p: Path)) if p.parts.nonEmpty => p.parts.mkString(".")
    // `by every(d)` buckets the stream's ts — the derived field is ts
    // (compiler/semantic/expr.go:533 deriveLHSPath)
    case Call("every", _) => "ts"
    case Call(fn, _) => fn
    case Index(inner, _) => inferName(inner)
    case _ => "value"
  }
}

/** One aggregate call inside summarize: [field:=]agg(arg) [where expr]. */
final case class AggCall(fn: String, arg: Option[Expr], where: Option[Expr],
                         named: Boolean = false)

sealed trait Stage

object Stage {
  final case class From(table: String, format: Option[String] = None,
      kind: String = "from", // from | file | get | pool
      extras: Seq[(String, Expr)] = Seq.empty // get method/headers/body
  ) extends Stage
  final case class Where(e: Expr) extends Stage
  final case class Cut(fields: Seq[(String, Option[Expr])]) extends Stage
  final case class Put(assigns: Seq[(String, Expr)]) extends Stage
  final case class Drop(paths: Seq[String]) extends Stage
  final case class Rename(renames: Seq[(String, String)]) extends Stage
  /** put/cut/rename with a COMPUTED field name (`this[<expr>] :=`,
    * runtime/sam/expr/lval.go ExprLvalElem): the name evaluates per row,
    * so output shapes are data-dependent — compiled to a row-level value
    * rewrite and re-framed through shape discovery. For put/cut each pair
    * is (nameExpr, valueExpr); for rename (newNameExpr, oldNameExpr) with
    * static sides as StringLit.
    */
  final case class DynAssign(op: String, assigns: Seq[(Expr, Expr)]) extends Stage
  /** `output <name>` — a named flowgraph sink (runtime/sam/op/mux.go:
    * each parallel path ends at a labeled output; ast.go Output). The
    * branch leaves the flowing state and surfaces by name via
    * Graft.queryOutputs / the service's output= param.
    */
  final case class Output(name: String) extends Stage
  final case class Sort(
      keys: Seq[(Expr, Boolean)], // (expr, ascending)
      nullsFirst: Boolean) extends Stage
  final case class Head(n: Int, explicit: Boolean = true) extends Stage
  final case class Tail(n: Int, explicit: Boolean = true) extends Stage
  final case class Top(n: Int, keys: Seq[Expr]) extends Stage
  final case class Uniq(withCount: Boolean) extends Stage
  final case class Summarize(
      aggs: Seq[(String, AggCall)],
      keys: Seq[(String, Expr)]) extends Stage
  final case class Join(
      style: String, // anti | inner | left | right
      right: Option[Pipeline], // None: join the two upstream branches
      leftKey: Expr,
      rightKey: Expr,
      graft: Seq[(String, Expr)]) extends Stage
  final case class Fork(branches: Seq[Pipeline]) extends Stage
  final case class Switch(
      subject: Option[Expr],
      cases: Seq[(Expr, Pipeline)],
      default: Option[Pipeline]) extends Stage
  final case class Merge(keys: Seq[(Expr, Boolean)]) extends Stage
  case object Combine extends Stage
  final case class Over(
      exprs: Seq[Expr],
      withVars: Seq[(String, Expr)],
      body: Option[Pipeline]) extends Stage
  final case class Yield(exprs: Seq[Expr]) extends Stage
  final case class Explode(zedType: String, as: String,
      roots: Seq[String] = Seq.empty) extends Stage
  /** one representative value per distinct TYPE (shape/shaper.go sample) */
  final case class Sample(e: Option[Expr]) extends Stage
  case object Fuse extends Stage
  /** commit the stream to a lake pool (language operator `load`) */
  final case class Load(target: String, author: Option[String],
      message: Option[String]) extends Stage
  case object Pass extends Stage
  /** `debug [<expr>]` — emit the expression per row on the debug channel
    * (stderr) and pass the stream through (runtime op debug).
    */
  final case class Debug(e: Option[Expr]) extends Stage
  final case class Assert(e: Expr, text: String) extends Stage
  /** inlined user-defined operator body (semantic/op.go:853-860) */
  final case class Block(p: Pipeline) extends Stage

  // ---- preserve-mode nodes (zfmt canonical printing only; the compiler
  // never sees these — Parser.parsePreserve keeps declarations and user-op
  // calls unexpanded so `dev compile -C` can print them verbatim) ----
  final case class ConstDecl(name: String, e: Expr) extends Stage
  final case class FuncDecl(name: String, params: Seq[String], body: Expr) extends Stage
  final case class OpDecl(name: String, params: Seq[String], body: Pipeline) extends Stage
  final case class TypeDecl(name: String, text: String) extends Stage
  final case class OpCall(name: String, args: Seq[Expr]) extends Stage
  /** `from ( <trunk> ... )` kept structurally for canonical printing */
  final case class FromTrunks(trunks: Seq[(From, Option[Pipeline])]) extends Stage
}

final case class Pipeline(stages: Seq[Stage])
