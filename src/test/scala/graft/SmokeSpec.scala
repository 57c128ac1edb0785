package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must execute and return rows on sf0.001. */
class SmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(8)
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list tiny and intentional (approx / engine-specific-hash /
    // non-SQL ops only; each has a dedicated spec instead)
    assert(noOracle.subsetOf(Set(
      "q_dcount",         // HLL estimates differ per impl
      "q_dedup_simhash",  // xxhash64 differs from DuckDB's hash
      "q_knn_lsh",        // approximate; recall pinned in PipelineSpec
      "q_knn_ivf",        // approximate; recall pinned in PipelineSpec
      "q_langid",         // heuristic; accuracy pinned on fixtures in PipelineSpec
      "q_media_features", // legacy entry: now oracle-green (real pixel/PCM decode)
      "q_shape_sample"    // any-semantics representative; shape count pinned below
    )), s"missing oracle: $noOracle")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q_shape_sample emits one representative per null-mask shape") {
    val df = SparkEntry.queries("q_shape_sample")(spark, dir)
    assert(df.count() == 2) // v null / v non-null
  }

  test("q_switch compiles to a single scan of the source") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val df = SparkEntry.queries("q_switch")(spark, dir)
    val scans = df.queryExecution.optimizedPlan.collect { case r: LogicalRelation => r }
    assert(scans.length == 1, s"expected 1 scan, got ${scans.length}")
  }
}
