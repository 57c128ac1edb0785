package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.lang.Graft

/** Plan-shape assertions — the 100 TB design lens. A query that is correct
  * but scans every column, skips pushdown, or shuffles a broadcastable dim
  * would fail here long before a benchmark shows it.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def planOf(q: String): String =
    Graft.query(spark, dir, q).queryExecution.executedPlan.toString

  test("cut prunes the parquet read schema to the projected columns") {
    val plan = planOf("from lineitem | cut l_orderkey, l_quantity")
    val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"projection did not prune the scan: $readSchema")
  }

  test("zng scan prunes columns into the wire decoder (DSv2 BatchScan)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-zng").toString
    val df = GraftSession.table(spark, dir, "lineitem").limit(100)
      .select("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag")
    graft.sources.ZngIO.write(df, s"$tmp/li.zng")
    val back = graft.sources.ZngIO.read(spark, s"$tmp/li.zng").select("l_quantity")
    val scan = back.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
    assert(scan.nonEmpty, "zng read did not plan a DSv2 BatchScan")
    // pruning reached the decoder: only the selected column survives, the
    // other fields (and the shape tag) are skipped by their length tags
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("l_quantity"))
    assert(back.agg(org.apache.spark.sql.functions.sum("l_quantity")).collect()(0).get(0) ==
      df.agg(org.apache.spark.sql.functions.sum("l_quantity")).collect()(0).get(0))
  }

  test("where pushes the predicate into the parquet scan") {
    val plan = planOf("""from lineitem | where l_returnflag=="R" | cut l_orderkey""")
    val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("l_returnflag"), s"filter not pushed: $pushed")
  }

  test("time filter on ns-long column pushes down as a plain long predicate") {
    val plan = planOf("from events | where ts < 2024-01-03 | cut event_id")
    val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("ts"), s"ns time filter not pushed: $pushed")
  }

  test("join against a small dimension broadcasts (no shuffle of the fact side)") {
    val plan = planOf(
      "from orders | inner join (from customer) on o_custkey=c_custkey c_name")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "small-dim join did not broadcast")
  }

  test("sort|head compiles to TakeOrderedAndProject (no full sort)") {
    val plan = planOf("from orders | sort o_totalprice desc | head 5")
    assert(plan.contains("TakeOrderedAndProject"), "sort+head did not fuse to top-N")
  }

  test("summarize runs partial then final aggregation (map-side combine)") {
    val df = Graft.query(spark, dir, "from lineitem | sum(l_quantity) by l_returnflag")
    val plan = df.queryExecution.executedPlan.toString
    assert("partial_sum|HashAggregate.*partial".r.findFirstIn(plan).isDefined,
      "no partial aggregate before the shuffle")
  }

  test("whole-stage codegen covers the filter+project hot path") {
    val plan = planOf("""from lineitem | where l_quantity > 10.0 | put v:=l_extendedprice*0.9 | cut l_orderkey, v""")
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1)"), "hot path fell out of codegen")
  }

  test("uniqAdjacent is distributed: range partitioning, no single-partition window") {
    import org.apache.spark.sql.functions._
    val df = GraftSession.table(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
    val out = graft.operators.ZedOps.uniqAdjacent(df, col("l_returnflag"), col("l_linestatus"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.toLowerCase.contains("range"), "expected range partitioning")
    assert(!plan.contains("SinglePartition"), "single-partition window is a scale-killer")
    // correctness: all duplicates collapse (equal keys co-locate by range)
    assert(out.count() == df.distinct().count())
    // first-row-of-stream with all-null columns survives (ADVICE r1 case)
    val withNulls = spark.range(1).select(
      lit(null).cast("string").as("l_returnflag"),
      lit(null).cast("string").as("l_linestatus"))
      .union(df.limit(5))
    val kept = graft.operators.ZedOps.uniqAdjacent(withNulls,
      col("l_returnflag"), col("l_linestatus"))
    assert(kept.filter(col("l_returnflag").isNull).count() == 1)
  }

  test("merge of pre-filtered branches stays a single stage union + sort") {
    val df = Graft.query(spark, dir,
      """from orders | fork ( => where o_orderstatus=="F" => where o_orderstatus=="O" ) | merge o_orderkey""")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), "fork branches did not union")
  }

  test("merge strips redundant per-branch Sorts: one exchange + one sort " +
       "for the whole union (ref merge.go consumes sorted upstreams)") {
    import org.apache.spark.sql.functions.col
    val t = GraftSession.table(spark, dir, "orders")
    val a = graft.operators.ZedOps.sort(
      t.filter(col("o_orderstatus") === "F"), col("o_orderkey") -> true)
    val b = graft.operators.ZedOps.sort(
      t.filter(col("o_orderstatus") === "O"), col("o_totalprice") -> false)
    val merged = graft.operators.ZedOps.merge(
      Seq(col("o_orderkey") -> true), a, b)
    val mergedPlan = merged.queryExecution.executedPlan.toString
    // exactly ONE global sort (the merge's own) and ONE range exchange —
    // the branches' sorts and their exchanges must be gone (each would
    // shuffle its whole branch a second time for an order the merge
    // immediately re-imposes)
    val globalSorts = "Sort \\[[^\\]]*\\], true,".r.findAllIn(mergedPlan).length
    val rangeExchanges = "rangepartitioning".r.findAllIn(mergedPlan).length
    assert(globalSorts == 1,
      s"expected exactly the merge's sort, got $globalSorts:\n$mergedPlan")
    assert(rangeExchanges == 1,
      s"branch sort exchanges survived ($rangeExchanges range exchanges):\n$mergedPlan")
    // result is the union's rows in merge-key order
    val keys = merged.select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted && keys.nonEmpty, "merge output lost total order")
    assert(merged.count() ==
      t.filter(col("o_orderstatus") === "F").count() +
      t.filter(col("o_orderstatus") === "O").count())
    // a branch ending in head/top keeps its semantics: the plan tops out
    // in the Limit, so its inner sort is NOT stripped
    val c = graft.operators.ZedOps.top(t, 5, col("o_totalprice"))
    val mixed = graft.operators.ZedOps.merge(Seq(col("o_orderkey") -> true), a, c)
    assert(mixed.count() == a.count() + 5, "limit branch must keep its top-N")
  }

  test("keyed lake pool: range scan prunes whole objects from the journal " +
       "and pushes the key predicate into parquet (seek-index analog)") {
    import org.apache.spark.sql.functions.col
    val lk = graft.sources.Lake
    val root = java.nio.file.Files.createTempDirectory("graft-plan-lake").toString
    val pool = "keyed"
    lk.create(root, pool, Some("l_orderkey"))
    val li = GraftSession.table(spark, dir, "lineitem")
    val mid = 750L
    val lowId = lk.load(li.filter(col("l_orderkey") < mid), root, pool)
    val highId = lk.load(li.filter(col("l_orderkey") >= mid), root, pool)
    // journal recorded each object's key range
    val cs = lk.commits(root, pool).filter(_.kind == "commit")
    assert(cs.forall(c => c.keyMin.isDefined && c.keyMax.isDefined),
      "keyed loads must journal [keymin,keymax]")
    // range entirely inside the low object: the high object must not be
    // in the scan's file index at all (object-level pruning)
    val scan = lk.scan(spark, root, pool, keyRange = Some(("100", "500")))
    val plan = scan.queryExecution.executedPlan.toString
    // the plan string may truncate long paths — check the path count and
    // that the non-overlapping object's id is absent
    assert(plan.contains("InMemoryFileIndex(1 paths)") &&
      plan.contains(lowId.take(8)) && !plan.contains(highId.take(8)),
      s"expected only object $lowId in the scan:\n$plan")
    // and the predicate reached the parquet reader, where load's
    // range-sort makes per-row-group [min,max] stats selective
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_orderkey"),
      s"key range did not push into the parquet scan:\n$plan")
    // load-time range sort holds: within the object, files cover
    // disjoint key slices (what row-group pruning feeds on at scale)
    val fs = new java.io.File(s"$root/$pool/data/$lowId")
      .listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    if (fs.length > 1) {
      val ranges = fs.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(org.apache.spark.sql.functions.min("l_orderkey"),
            org.apache.spark.sql.functions.max("l_orderkey")).head
        (r.getLong(0), r.getLong(1))
      }
      val sorted = ranges.sortBy(_._1)
      assert(sorted.sliding(2).forall {
        case Array((_, hi1), (lo2, _)) => hi1 <= lo2
        case _ => true
      }, s"object files overlap in key space: ${sorted.toSeq}")
    }
    // correctness of the pruned scan
    assert(scan.count() ==
      li.filter(col("l_orderkey") >= 100 && col("l_orderkey") <= 500).count())
  }

  test("variant/type-value sort keys are codegen'd expressions, no ScalaUDF") {
    import graft.sources.ZsonReader
    // a stream of TYPE VALUES sorts under the CompareTypes total order —
    // the binary key must be a native expression (functions/ZSortKey),
    // not a ScalaUDF that drops the projection out of codegen
    val in = ZsonReader.fromText(spark, "<int64> <string> <{a:int64}> <[int64]>")
    val plan = Graft.queryOn(in, "sort this").queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"variant sort fell back to a ScalaUDF:\n$plan")
    assert(plan.contains("z_sort_key"), s"expected native sort key in plan:\n$plan")
    // and the values actually order per CompareTypes
    val out = graft.sources.ZsonIO.toZson(Graft.queryOn(in, "sort this")).collect()
    assert(out.length == 4)
  }

  test("boxed-stream fuse reshapes via the native FuseReshape expression, no ScalaUDF") {
    import graft.sources.ZsonReader
    // `over <array> | fuse` retypes runtime-typed (variant) values to the
    // fused record type — a native row-level expression, not a text UDF
    val in = ZsonReader.fromText(spark, """{l:[{a:1},{b:"x"}]}""")
    val q = Graft.queryOn(in, "over l | fuse")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"boxed fuse fell back to a ScalaUDF:\n$plan")
    assert(plan.contains("variant_fuse_reshape"),
      s"expected native fuse reshape in plan:\n$plan")
    val out = graft.sources.ZsonIO.toZson(q).collect()
    assert(out.toSeq == Seq(
      """{a:1,b:null(string)}""",
      """{a:null(int64),b:"x"}"""))
  }

  test("beyond-broadcast joins: AQE rewrites sort-merge to shuffled-hash " +
      "when post-shuffle partitions fit the local-map threshold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // force the beyond-broadcast regime (tiny threshold) — the session's
    // maxShuffledHashJoinLocalMapThreshold=64m must then convert the
    // static SortMergeJoin to ShuffledHashJoin from the REAL post-shuffle
    // sizes; this is the config's only executed-path coverage
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(200000).select(col("id").as("k"), (col("id") * 2).as("x"))
      val b = spark.range(100000).select(col("id").as("k"), (col("id") * 3).as("y"))
      val j = a.join(b, "k")
      // execute THIS QueryExecution (df.write/count plan their own) so
      // the adaptive plan below is the final, re-optimized one
      assert(j.collect().length == 100000)
      val finalPlan = j.queryExecution.executedPlan match {
        case ap: AdaptiveSparkPlanExec => ap.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("ShuffledHashJoin"),
        s"AQE did not rewrite SMJ to shuffled-hash:\n$finalPlan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("fuse after a filter is data-driven: a dropped alt does not fuse in") {
    import graft.sources.ZsonReader
    // reference fuse.go fuses only types actually SEEN: when a where drops
    // every value of one alt, the fused record must not carry its fields.
    // The static union tag alone cannot witness the drop — the compiler
    // intersects the alts with the observed tags when a row-dropping
    // operator precedes the fuse.
    val in = ZsonReader.fromText(spark, """{l:[{a:1},{b:"x"},{a:3}]}""")
    val q = Graft.queryOn(in, "over l | where has(a) | fuse")
    val out = graft.sources.ZsonIO.toZson(q).collect()
    assert(out.toSeq == Seq("{a:1}", "{a:3}"),
      s"dropped alt leaked into the fused type: ${out.toSeq}")
    // and with no filter the static-tag (zero-pass) fuse still applies
    val all = graft.sources.ZsonIO.toZson(Graft.queryOn(in, "over l | fuse")).collect()
    assert(all.toSeq == Seq(
      """{a:1,b:null(string)}""",
      """{a:null(int64),b:"x"}""",
      """{a:3,b:null(string)}"""))
  }

  test("a 100-column (zeek-width) projection COMPILES under whole-stage " +
      "codegen — no Janino failure, no silent interpreted fallback") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // zeek conn-log width with mixed types: with the per-operator consume
    // split on, all columns land in ONE generated method whose body can
    // exceed the 64 KB bytecode limit ("Code grows beyond 64 KB" — the
    // r8 ZtestExecSpec failure). tuneWideCodegen flips the split off for
    // wide plans and keeps Spark's default for narrow ones.
    val base = spark.range(1000).toDF("id")
    val wide = base.select((0 until 100).map { i =>
      val c = i % 3 match {
        case 0 => (col("id") * i).cast("double")
        case 1 => (col("id") * i).cast("string")
        case _ => (col("id") % 2 === 0)
      }
      c.as(s"c$i")
    }: _*)
    val proj = wide.filter(col("c1").isNotNull).select((0 until 100).map { i =>
      val c = col(s"c$i")
      (i % 3 match {
        case 0 => c.cast("double") + lit(1.0)
        case 1 => concat(c.cast("string"), lit("x"))
        case _ => !c.cast("boolean")
      }).as(s"d$i")
    }: _*)
    // the guard flips the consume split off for this wide plan …
    GraftSession.tuneWideCodegen(proj)
    assert(spark.conf.get("spark.sql.codegen.splitConsumeFuncByOperator") == "false")
    val wsc = proj.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }
    assert(wsc.isDefined, "wide projection lost whole-stage codegen entirely")
    // compile the generated source EXPLICITLY — a Janino failure here is
    // the silent-interpreted-fallback the width guard must prevent
    val (_, source) = wsc.get.doCodeGen()
    org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .compile(source)
    assert(proj.count() == 1000)
    // … and restores Spark's default (small JIT-able methods) for the
    // next narrow plan — the r9 regression was leaving it off globally
    GraftSession.tuneWideCodegen(base.select((col("id") + 1).as("x")))
    assert(spark.conf.get("spark.sql.codegen.splitConsumeFuncByOperator") == "true")
    // a lang-frontend query over a wide record flips it too (the original
    // failure was a 94-col zeek projection through Graft.query)
    val wideRow = spark.range(10).select((0 until 70).map(i =>
      (col("id") + i).as(s"f$i")): _*)
    graft.lang.Graft.queryOn(wideRow, "put g:=f0+1")
    assert(spark.conf.get("spark.sql.codegen.splitConsumeFuncByOperator") == "false")
    graft.lang.Graft.queryOn(wideRow.select("f0"), "put g:=f0+1")
    assert(spark.conf.get("spark.sql.codegen.splitConsumeFuncByOperator") == "true")
  }

  test("computed-field-name put stays on the Catalyst fast path (no RDD scan)") {
    import org.apache.spark.sql.functions._
    // names resolve to a small distinct set → static branches, not the
    // whole-row RDD value model (the r8–r10 scale-killer)
    val df = GraftSession.table(spark, dir, "nation")
      .select(col("n_name"), lit("score").as("k"), col("n_nationkey"))
    val out = Graft.queryOn(df, "this[k] := n_nationkey * 2")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("Scan ExistingRDD"),
      s"dynamic put fell back to the RDD row model:\n$plan")
    val rows = out.collect()
    assert(rows.length == 25)
    assert(out.columns.contains("score"))
    // two distinct name tuples → per-tuple branches, unioned in order
    val df2 = GraftSession.table(spark, dir, "nation")
      .select(col("n_name"), when(col("n_nationkey") % 2 === 0, "even")
        .otherwise("odd").as("k"), col("n_nationkey"))
    val out2 = Graft.queryOn(df2, "this[k] := n_nationkey")
    val plan2 = out2.queryExecution.executedPlan.toString
    assert(!plan2.contains("ExistingRDD"),
      s"multi-tuple dynamic put fell back to the RDD row model:\n$plan2")
    assert(out2.collect().length == 25)
  }
}
