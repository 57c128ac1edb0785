package graft

/** Debug: ZsonFormatter.formatText(text, typeText) from env FMT_TEXT/FMT_TYPE. */
object FmtDbg {
  def main(args: Array[String]): Unit = {
    val text = sys.env.getOrElse("FMT_TEXT", "null")
    val t = sys.env.get("FMT_TYPE").orNull
    println("IN  : " + text + "  :: " + t)
    println("OUT : " + graft.sources.ZsonFormatter.formatText(text, t))
  }
}
