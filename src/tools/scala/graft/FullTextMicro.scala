package graft

import graft.sources.ZType
import graft.sources.ZType._

/** Scratch microbench: per-call cost of ZType.fullText (memoized) vs the
  * pre-memo inline rebuild, on the bench conn shape. Not part of the engine.
  */
object FullTextMicro {
  // verbatim copy of the pre-memo fullText (string assembly + fieldName regex)
  private def rebuild(t: ZType): String = t match {
    case Named(n, i) => s"$n=${rebuild(i)}"
    case Prim(n) => n
    case Rec(fs) => fs.map { case (n, ft) => s"${fieldName(n)}:${rebuild(ft)}" }.mkString("{", ",", "}")
    case Arr(e) => s"[${rebuild(e)}]"
    case SetT(e) => s"|[${rebuild(e)}]|"
    case MapT(k, v) => s"|{${rebuild(k)}:${rebuild(v)}}|"
    case Union(alts) => alts.map(rebuild).mkString("(", ",", ")")
    case EnumT(syms) => syms.mkString("enum(", ",", ")")
    case ErrT(i) => s"error(${rebuild(i)})"
  }

  def main(args: Array[String]): Unit = {
    val conn = Rec(Vector(
      "ts" -> Prim("time"), "uid" -> Prim("string"), "orig_p" -> Prim("int64"),
      "proto" -> Prim("string"), "duration" -> Prim("duration"), "orig_bytes" -> Prim("int64")))
    val n = 2000000
    def time(label: String)(f: => Unit): Unit = {
      var k = 0; while (k < 3) { // 3 reps, report each
        val t0 = System.nanoTime(); f
        println(f"[micro] $label rep$k: ${(System.nanoTime() - t0) / n}%d ns/call")
        k += 1
      }
    }
    // fresh structurally-equal tree each call = the real per-row situation
    // (typeOf builds a new tree per row); tree build cost is common to both
    def freshTree(): ZType = Rec(conn.fields.map(identity))
    var sink = 0
    time("rebuild (pre-memo) ")(
      { var i = 0; while (i < n) { sink += rebuild(freshTree()).length; i += 1 } })
    time("fullText (memoized)")(
      { var i = 0; while (i < n) { sink += ZType.fullText(freshTree()).length; i += 1 } })
    println(s"[micro] sink=$sink")
  }
}
