package graft
import org.scalatest.funsuite.AnyFunSuite
class MdShow extends AnyFunSuite {
  test("show doc example commands") {
    val spec = sys.env.getOrElse("MDSHOW", "")
    if (spec.nonEmpty) {
      val parts = spec.split("\\s+")
      val files = MdtestHarness.extractFiles().filter(_.path.contains(parts(0)))
      for (f <- files; c <- f.cases if parts.tail.map(_.toInt).contains(c.ord)) {
        println(s"== ${f.path}#${c.ord}")
        println(c.command)
        println("--- want ---")
        println(c.output.take(300))
      }
    }
  }
}
