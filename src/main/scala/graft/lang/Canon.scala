package graft.lang

/** Canonical query formatting for the CLI's `-C` flag: parse, then print
  * the pipeline back in the language's canonical form with implied
  * operators made explicit (`foo` → `search foo`, `{a:x}` → `yield {a:x}`;
  * reference: compiler/describe + zfmt canonical printing).
  */
object Canon {

  def format(q: String): String = pipeline(Parser.parse(q))

  def pipeline(p: Pipeline): String = p.stages.map(stage).mkString("\n| ")

  def stage(s: Stage): String = s match {
    case Stage.Where(p @ Expr.Path(_)) => "search " + expr(p)
    case Stage.Where(e) if isSearchy(e) => "search " + expr(e)
    case Stage.Where(e) => "where " + expr(e)
    case Stage.Put(as) =>
      "put " + as.map { case (n, e) => s"$n:=${expr(e)}" }.mkString(",")
    case Stage.Cut(fs) =>
      "cut " + fs.map {
        case (n, Some(e)) => s"$n:=${expr(e)}"
        case (n, None) => n
      }.mkString(",")
    case Stage.Drop(ps) => "drop " + ps.mkString(",")
    case Stage.Rename(rs) =>
      "rename " + rs.map { case (to, from) => s"$to:=$from" }.mkString(",")
    case Stage.Yield(es) => "yield " + es.map(expr).mkString(",")
    case Stage.Head(n, _) => s"head $n"
    case Stage.Tail(n, _) => s"tail $n"
    case Stage.Uniq(c) => if (c) "uniq -c" else "uniq"
    case Stage.Sort(keys, _) =>
      "sort " + keys.map { case (e, asc) =>
        expr(e) + (if (asc) "" else " desc")
      }.mkString(",")
    case Stage.Summarize(aggs, keys) =>
      val aggText = aggs.map { case (n, AggCall(fn, arg, w, named)) =>
        val call = s"$fn(${arg.map(expr).getOrElse("")})" +
          w.map(e => s" where ${expr(e)}").getOrElse("")
        if (named) s"$n:=$call" else call
      }.mkString(",")
      val byText =
        if (keys.isEmpty) ""
        else "\n    by " + keys.map { case (n, e) =>
          val t = expr(e)
          if (n == Expr.inferName(e)) t else s"$n:=$t"
        }.mkString(",")
      s"summarize\n    $aggText$byText"
    case Stage.From(t, _, _, _) => s"from $t"
    case Stage.Pass => "pass"
    case Stage.Block(p) => pipeline(p)
    case other =>
      throw new IllegalArgumentException(s"canonical form: unsupported ${other.getClass.getSimpleName}")
  }

  /** Implied search (bare terms / globs; conjunctions of terms). */
  private def isSearchy(e: Expr): Boolean = e match {
    case Expr.Call("__search" | "__glob" | "grep", _) => true
    case Expr.Path(Seq(_)) => true // bare word = keyword search term
    case Expr.StringLit(_) => true
    case Expr.Binary(("and" | "or"), l, r) => isSearchy(l) && isSearchy(r)
    case Expr.Unary(("not" | "!"), x) => isSearchy(x)
    case _ => false
  }

  def expr(e: Expr): String = e match {
    case Expr.IntLit(v) => v.toString
    case Expr.FloatLit(v) =>
      if (v == Math.floor(v) && !v.isInfinite) s"${v.toLong}." else v.toString
    case Expr.StringLit(v) =>
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case Expr.BoolLit(v) => v.toString
    case Expr.NullLit => "null"
    case Expr.TimeLit(_, text) => text
    case Expr.DurationLit(_, text) => text
    case Expr.Path(parts) if parts.isEmpty => "this"
    case Expr.Path(parts) => parts.mkString(".")
    case Expr.Index(a, i) => s"${expr(a)}[${expr(i)}]"
    case Expr.Unary(op, x) => s"$op${expr(x)}"
    case Expr.Binary(op, l, r) =>
      val sep = if (op == "and" || op == "or") s" $op " else op
      s"${expr(l)}$sep${expr(r)}"
    case Expr.Cond(c, t, f) => s"${expr(c)} ? ${expr(t)} : ${expr(f)}"
    case Expr.Call("__typename", Seq(Expr.StringLit(n))) => s"<$n>"
    case Expr.Call(fn, args) => s"$fn(${args.map(expr).mkString(",")})"
    case Expr.RecordLit(fs) =>
      "{" + fs.map { case (n, x) =>
        x match {
          case Expr.Path(parts) if parts.lastOption.contains(n) => n
          case _ => s"$n:${expr(x)}"
        }
      }.mkString(",") + "}"
    case Expr.ArrayLit(xs) => "[" + xs.map(expr).mkString(",") + "]"
    case Expr.SubQuery(p) => "(" + pipeline(p) + ")"
    case Expr.RecCall(n, _, args) => s"$n(${args.map(expr).mkString(",")})"
  }
}
