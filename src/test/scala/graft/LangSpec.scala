package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.lang._

/** Parser + compiler tests for the Zed language frontend, mirroring the
  * reference's parser ztests (compiler/parser/ztests) and desugaring rules
  * (compiler/semantic/op.go).
  */
class LangSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  // ---- parser ---------------------------------------------------------------

  test("parses a full pipeline with implied operators") {
    val p = Parser.parse(
      "from lineitem | l_quantity > 5.0 | f:=l_orderkey*2 | count() by l_returnflag | sort l_returnflag | head 3")
    assert(p.stages.length == 6)
    assert(p.stages(0) == Stage.From("lineitem"))
    assert(p.stages(1).isInstanceOf[Stage.Where]) // implied where (boolean-shaped)
    assert(p.stages(2).isInstanceOf[Stage.Put])   // implied put (assignment)
    assert(p.stages(3).isInstanceOf[Stage.Summarize]) // implied summarize (agg)
    assert(p.stages(4).isInstanceOf[Stage.Sort])
    assert(p.stages(5) == Stage.Head(3))
  }

  test("summarize: names default to the agg/key rhs (semantic/op.go inference)") {
    val Stage.Summarize(aggs, keys) =
      Parser.parse("from t | summarize sum(x) by lower(s), k").stages(1): @unchecked
    assert(aggs.map(_._1) == Seq("sum"))
    assert(keys.map(_._1) == Seq("lower", "k"))
  }

  test("time and duration literals lex correctly") {
    val Stage.Where(e) = Parser.parse("from t | where ts <= 1998-09-02").stages(1): @unchecked
    val Expr.Binary("<=", _, t: Expr.TimeLit) = e: @unchecked
    assert(t.epochNs == java.time.Instant.parse("1998-09-02T00:00:00Z").getEpochSecond * 1000000000L)
    val Stage.Summarize(_, ks) = Parser.parse("from t | count() by every(15m)").stages(1): @unchecked
    val (_, Expr.Call("every", Seq(d: Expr.DurationLit))) = ks.head: @unchecked
    assert(d.ns == 15L * 60 * 1000000000L)
  }

  test("operator precedence: arithmetic binds tighter than comparison than logic") {
    val e = Parser.parseExpression("a + b * 2 > 3 and not c == 4")
    val Expr.Binary("and", l, r) = e: @unchecked
    val Expr.Binary(">", Expr.Binary("+", _, Expr.Binary("*", _, _)), _) = l: @unchecked
    val Expr.Unary("not", Expr.Binary("==", _, _)) = r: @unchecked
  }

  test("switch parses subject and boolean forms with default") {
    val Stage.Switch(Some(_), cases, Some(_)) =
      Parser.parse("from t | switch x ( case 1 => pass case 2 => pass default => pass )")
        .stages(1): @unchecked
    assert(cases.length == 2)
    val Stage.Switch(None, cases2, None) =
      Parser.parse("from t | switch ( case a==1 => pass case a==2 => pass )").stages(1): @unchecked
    assert(cases2.length == 2)
  }

  test("join parses style, sub-pipeline, keys and grafted fields") {
    val Stage.Join(style, right, lk, rk, graft) =
      Parser.parse("from a | left join (from b | where x > 1) on k=j f1, f2:=g*2").stages(1): @unchecked
    assert(style == "left")
    assert(right.get.stages.length == 2)
    assert(lk == Expr.Path(Seq("k")) && rk == Expr.Path(Seq("j")))
    assert(graft.map(_._1) == Seq("f1", "f2"))
  }

  test("parse errors carry position context") {
    val e = intercept[IllegalArgumentException](Parser.parse("from t | where )"))
    assert(e.getMessage.contains("parse error"))
    intercept[IllegalArgumentException](Parser.parse("from t | summarize bogus(x)"))
  }

  // ---- compiler: language results == hand-built DataFrame results -----------

  private def run(q: String) = Graft.query(spark, dir, q)

  test("language agg matches DataFrame twin") {
    import org.apache.spark.sql.functions._
    val viaLang = run("from events | count() by event_type | sort event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = GraftSession.table(spark, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("count"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaLang.sameElements(direct))
  }

  test("time filter compares exactly on the carrier dtype (ns-long or NTZ)") {
    // events.ts carrier depends on the writer: TIMESTAMP(NANOS) reads as
    // LongType ns (nanosAsLong), plain timestamp[us] as TIMESTAMP_NTZ; the
    // literal must land in the same domain either way
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.LongType
    val n = run("from events | where ts < 2024-01-03 | count()").collect()(0).getLong(0)
    val ev = GraftSession.table(spark, dir, "events")
    val cutoff = java.time.Instant.parse("2024-01-03T00:00:00Z")
    val direct = (ev.schema("ts").dataType match {
      case LongType =>
        ev.filter(col("ts") < cutoff.getEpochSecond * 1000000000L)
      case dt =>
        ev.filter(col("ts") < lit(java.sql.Timestamp.from(cutoff)).cast(dt))
    }).count()
    assert(n == direct && n > 0)
  }

  test("int division stays integral, float division does not") {
    val r = run("from orders | yield {a: o_orderkey/2, b: o_totalprice/2} | head 1")
    val schema = r.schema
    assert(schema("a").dataType.typeName == "long")
    assert(schema("b").dataType.typeName == "double")
  }

  test("projection-shaped switch compiles to a single scan of the source") {
    val df = run(
      """from events | switch (
        |  case event_type=="purchase" => cut event_id, b:="p"
        |  default => cut event_id, b:="o"
        |) | sort event_id""".stripMargin)
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      case r: org.apache.spark.sql.catalyst.plans.logical.LeafNode => r
    }
    assert(scans.length == 1, s"expected single-pass switch, got ${scans.length} scans")
  }

  test("general switch branches preserve first-match-wins routing") {
    // overlapping predicates: both cases match value>0 rows; first wins
    val out = run(
      """from events | switch (
        |  case value >= 50.0 => put b:="hi" | count() by b
        |  case value >= 0.0 => put b:="lo" | count() by b
        |)""".stripMargin).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = GraftSession.table(spark, dir, "events").count()
    assert(out.values.sum == total)
    val hi = GraftSession.table(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("value") >= 50.0).count()
    assert(out("hi") == hi)
  }

  test("over with scope vars runs the lateral body per element") {
    val rows = run(
      "from embeddings | over embedding with vec_id => ( summarize n:=count() by vec_id ) | sort vec_id")
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == 64L)) // embedding dim
  }

  test("yield with multiple expressions emits N rows per input") {
    val n = run("from nation | yield n_nationkey, n_regionkey | count()")
      .collect()(0).getLong(0)
    val base = GraftSession.table(spark, dir, "nation").count()
    assert(n == 2 * base)
  }

  test("record literals, indexing and conditionals evaluate") {
    val r = run(
      """from embeddings | yield {vec_id, first:embedding[0], tag: vec_id % 2 == 0 ? "even" : "odd"}
        || sort vec_id | head 2""".stripMargin).collect()
    assert(r.length == 2)
    assert(r(0).getString(2) == "even" && r(1).getString(2) == "odd")
  }

  test("cut with dotted paths rebuilds the nested record") {
    val df = run(
      """from customer | put info:={name:c_name, seg:c_mktsegment}
        || cut c_custkey, info.name | sort c_custkey | head 1""".stripMargin)
    assert(df.columns.toSeq == Seq("c_custkey", "info"))
    assert(df.schema("info").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(df.select("info.name").collect()(0).getString(0).startsWith("Customer#"))
  }

  test("parse_zson parses an embedded ZSON string with a declared type") {
    val r = run(
      """from nation | put z:=parse_zson("{a:1,b:\"x\"}", "a BIGINT, b STRING")
        || yield {k:n_nationkey, a:z.a, b:z.b} | sort k | head 1""".stripMargin).collect()(0)
    assert(r.getLong(1) == 1L && r.getString(2) == "x")
  }

  test("explode by type discovers nested leaves from the schema") {
    val n = run(
      """from customer | put info:={seg:c_mktsegment} | head 5
        || explode this by string as v | count()""".stripMargin).collect()(0).getLong(0)
    // 5 rows × string leaves (c_name, c_mktsegment top-level + info.seg)
    assert(n == 15)
  }

  test("const statements bind compile-time values (statements.md)") {
    val r = run("const K = 7 from nation | yield {v: n_nationkey + K} | sort v | head 1")
      .collect()(0)
    assert(r.getLong(0) == 7L)
  }

  test("func statements expand user-defined functions inline") {
    val r = run(
      "func twice(n): (n * 2) func hype(s): (upper(s) + \"!\") " +
        "from nation | yield {a: twice(n_nationkey), b: hype(n_name)} | sort a | head 2")
      .collect()
    assert(r(0).getLong(0) == 0L && r(1).getLong(0) == 2L)
    assert(r(0).getString(1) == "NATION_0!")
  }

  test("summarize by-only form yields distinct key combinations") {
    val n = run("from lineitem | summarize by l_returnflag, l_linestatus | count()")
      .collect()(0).getLong(0)
    assert(n == 6) // RF/AF/NO... the distinct flag-status pairs
  }

  test("type statements bind named types usable as cast constructors") {
    val df = run(
      """type money = decimal(18,2)
        |type port = uint16
        |from lineitem | yield {m: money(l_extendedprice), p: port(l_linenumber)} | head 1""".stripMargin)
    assert(df.schema("m").dataType == org.apache.spark.sql.types.DecimalType(18, 2))
    assert(df.schema("p").dataType == org.apache.spark.sql.types.IntegerType) // uint16 widens
  }

  test("f-strings interpolate expressions with implicit string casts") {
    val r = run(
      """from nation | yield {s: f"key={n_nationkey} name={lower(n_name)}"} | sort s | head 1""")
      .collect()(0)
    assert(r.getString(0) == "key=0 name=nation_0")
  }

  test("array slices are 0-based end-exclusive with negative indexing") {
    val r = run(
      """from embeddings | yield {a: len(embedding[0:3]), b: len(embedding[60:]), c: len(embedding[:-60])}
        || head 1""".stripMargin).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4 && r.getLong(2) == 4) // len is int64
  }

  test("over a map traverses {key,value} records (traverse/over.go)") {
    val r = run(
      """from nation | head 1
        || put m:=parse_zson("{a:1,b:2}", "a BIGINT, b BIGINT")
        || yield {k1: m.a, k2: m.b}""".stripMargin).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
  }

  test("ksuid() yields unique 20-byte k-sortable ids; ksuid(bytes) encodes base62") {
    // ksuid() returns the raw 20-byte id (function/ksuid.go); the base62
    // text form comes from encoding those bytes
    val ids = run("from nation | yield {id: ksuid()} | head 25")
      .collect().map(_.getAs[Array[Byte]](0))
    assert(ids.length == 25 && ids.map(_.toSeq).distinct.length == 25)
    assert(ids.forall(_.length == 20))
    val encoded = run("from nation | yield {id: ksuid(ksuid())} | head 5")
      .collect().map(_.getString(0))
    assert(encoded.forall(_.length == 27))
  }

  test("rename moves a nested field in place") {
    import org.apache.spark.sql.functions._
    val df = GraftSession.table(spark, dir, "customer")
      .select(col("c_custkey"), struct(col("c_name"), col("c_mktsegment")).as("info"))
    val out = graft.operators.ZedOps.rename(df, "info.name" -> "info.c_name")
    val it = out.schema("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(it.fieldNames.toSeq == Seq("name", "c_mktsegment")) // in place, order kept
    assert(out.select("info.name").limit(1).collect()(0).getString(0).startsWith("Customer#"))
  }

  test("record spreads expand fields in place with later-wins override") {
    val r = run(
      """from nation | put info:={a:n_nationkey, b:n_regionkey}
        || yield {...info, b:99, c:n_name} | sort a | head 1""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 0 && r.getLong(1) == 99L && r.getString(2).startsWith("NATION"))
  }

  test("set and map literals construct with zed semantics") {
    val r = run(
      """from nation | yield {s: |[3, 1, 2, 1]|, m: |{"a": 1, "b": 2}|} | head 1""")
      .collect()(0)
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 3L)) // deduped + sorted
    assert(r.getMap[String, Long](1) == Map("a" -> 1L, "b" -> 2L))
  }

  test("array spreads concatenate") {
    val r = run(
      """from embeddings | yield {n: len([...embedding[0:2], ...embedding[0:3]])} | head 1""")
      .collect()(0)
    assert(r.getLong(0) == 5) // len is int64
  }

  test("ip and cidr literals parse as values") {
    val r = run(
      """from nation | yield {ok: cidr_match(10.0.0.0/8, 10.1.2.3),
        |no: cidr_match(10.0.0.0/8, 11.1.2.3)} | head 1""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("complex named types store their text and resolve in <type> literals") {
    val df = run(
      """type conn = {src:string, dst:string}
        |from nation | yield {t: "x" + <conn>} | head 1""".stripMargin)
    // named type values print their full name=def form (zson canonical)
    assert(df.collect()(0).getString(0) == "xconn={src:string,dst:string}")
  }

  test("regex literals act as search filters and ~ matches") {
    val n = run("""from documents | /fast/ | count()""").collect()(0).getLong(0)
    val grepN = run("""from documents | where grep("fast") | count()""").collect()(0).getLong(0)
    assert(n >= grepN && n > 0) // regex search spans the same string fields
    val m = run("""from nation | where n_name ~ /^NATION_1[0-9]$/ | count()""")
      .collect()(0).getLong(0)
    assert(m == 10)
    val not = run("""from nation | not /NATION_1/ | count()""").collect()(0).getLong(0)
    assert(not == 14) // 25 minus NATION_1 and NATION_10..19
    // '/' still divides where a value precedes it
    assert(run("from nation | yield {v: n_nationkey / 5} | sort v desc | head 1")
      .collect()(0).getLong(0) == 4L)
  }

  test("computed field names: put/cut/rename this[<expr>] := … evaluate per " +
       "row (put-dynamic-field, cut-dynamic-field, rename-dynamic-field ztests)") {
    import graft.sources.{ZsonParser, ZsonReader, ZsonIO}
    def on(zson: String, zed: String): Seq[String] = {
      val vals = zson.linesIterator.filter(_.trim.nonEmpty)
        .map(l => new ZsonParser(l).parseOne()).toSeq
      val df = ZsonReader.fromValues(spark, vals, tag = true)
      ZsonIO.toZson(Graft.queryOn(df, zed)).collect().toSeq
    }
    // put: name from a sibling field / nested path / runtime index
    assert(on("""{a:{b:"hello"}}""", """this[a.b]:="world" | drop a""") ==
      Seq("""{hello:"world"}"""))
    assert(on("""{a:"hello"}""", """this[this["a"]] := "world" | drop a""") ==
      Seq("""{hello:"world"}"""))
    // put: conflicting dynamic names / missing name are the reference errors
    assert(on("""{a:"hello",b:"hello"}""",
      """this[a] := "world1", this[b] := "world2"""").head
      .contains("put: multiple assignments to hello"))
    assert(on("""{}""", """this[doesnotexist] := "world"""").head
      .contains("put: missing"))
    // cut: per-row shapes from the data
    assert(on("{key:\"foo\",v1:1,v2:2}\n{key:\"bar\",v1:2,v2:3}",
      """cut this[key] := [v1,v2]""") ==
      Seq("""{foo:[1,2]}""", """{bar:[2,3]}"""))
    assert(on("""{a:"hello",b:"hello"}""",
      """cut this[a] := "world1", this[b] := "world2"""").head
      .contains("cut: duplicate field"))
    // rename: dynamic target and dynamic source
    assert(on("{target:\"foo\",src:\"bar\"}\n{target:\"fool\",src:\"baz\"}",
      "rename this[target] := src") ==
      Seq("""{target:"foo",foo:"bar"}""", """{target:"fool",fool:"baz"}"""))
    assert(on("{target:\"a\",a:\"bar\"}\n{target:\"b\",b:\"baz\"}",
      "rename dst := this[target]") ==
      Seq("""{target:"a",dst:"bar"}""", """{target:"b",dst:"baz"}"""))
  }

  test("fuse across fork branches unifies schemas with nulls") {
    val df = run(
      """from orders | fork (
        |  => cut id:=o_orderkey, amount:=o_totalprice
        |  => from customer | cut id:=c_custkey, name:=c_name
        |) | fuse""".stripMargin)
    // combined heterogeneous branches carry the engine's shape tag —
    // data columns are what the user sees
    assert(df.columns.toSeq.filterNot(
      _ == graft.operators.Het.typeTag) == Seq("id", "amount", "name"))
    val counts = df.count()
    val expect = GraftSession.table(spark, dir, "orders").count() +
      GraftSession.table(spark, dir, "customer").count()
    assert(counts == expect)
  }

  test("from <pool> scans the lake under graft.lake.root, and a key-range " +
       "where prunes whole objects from the journal (seek-index analog)") {
    import org.apache.spark.sql.functions.col
    val lk = graft.sources.Lake
    val root = java.nio.file.Files.createTempDirectory("graft-lang-lake").toString
    lk.create(root, "events_pool", Some("event_id"))
    val ev = GraftSession.table(spark, dir, "events")
    val lowId = lk.load(ev.filter(col("event_id") < 300), root, "events_pool")
    val highId = lk.load(ev.filter(col("event_id") >= 300), root, "events_pool")
    spark.conf.set("graft.lake.root", root)
    try {
      val df = graft.lang.Graft.query(spark, dir,
        "from events_pool | where event_id >= 10 and event_id <= 50 | cut event_id, event_type | sort event_id")
      val expect = ev.filter(col("event_id") >= 10 && col("event_id") <= 50).count()
      assert(df.count() == expect && expect > 0)
      // object-level pruning: the high object never enters the file index
      val plan = graft.lang.Graft.query(spark, dir,
        "from events_pool | where event_id >= 10 and event_id <= 50")
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryFileIndex(1 paths)") && !plan.contains(highId.take(8)),
        s"expected only object $lowId in the scan:\n$plan")
      // strict-bound edge semantics survive the conservative pushdown
      val strict = graft.lang.Graft.query(spark, dir,
        "from events_pool | where event_id > 10 and event_id < 50")
      assert(strict.count() ==
        ev.filter(col("event_id") > 10 && col("event_id") < 50).count())
      // a branch ref still resolves
      lk.branch(root, "events_pool", "dev", Some(lowId))
      val branchCount = graft.lang.Graft.query(spark, dir,
        "from \"events_pool@dev\"").count()
      assert(branchCount == ev.filter(col("event_id") < 300).count())
    } finally spark.conf.unset("graft.lake.root")
  }

  // ---- round-14 advice regressions -----------------------------------------

  test("join auto-sort direction only follows a sort ON the join key " +
       "(optimizer.go propagateSortKeyOp fieldOf(LeftKey) equality)") {
    // sorted on a NON-key column: join output stays ascending by key
    val asc = run(
      "from nation | sort n_name desc | join (from region) on n_regionkey=r_regionkey rname:=r_name | cut n_regionkey")
      .collect().map(r => r.get(0).toString.toLong).toSeq
    assert(asc == asc.sorted, asc.mkString(","))
    // sorted on THE key descending: direction is adopted
    val desc = run(
      "from nation | sort n_regionkey desc | join (from region) on n_regionkey=r_regionkey rname:=r_name | cut n_regionkey")
      .collect().map(r => r.get(0).toString.toLong).toSeq
    assert(desc == desc.sorted.reverse, desc.mkString(","))
  }

  test("groupby emits null group keys LAST (sam/op/groupby nullsMax)") {
    val keys = run(
      "from nation | put k := n_regionkey==2 ? null : n_regionkey | count() by k | cut k")
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(keys.last == null, keys.mkString(","))
    assert(keys.dropRight(1).forall(_ != null), keys.mkString(","))
  }

  test("double slash later in a URL path is not a comment") {
    val p = Parser.parse("from http://host/a//b")
    p.stages.head match {
      case Stage.From(t, _, _, _) => assert(t == "http://host/a//b", t)
      case other => fail(s"unexpected stage: $other")
    }
    // while a genuine trailing comment still strips
    val q = Parser.parse("from nation // trailing comment")
    assert(q.stages.head.asInstanceOf[Stage.From].table == "nation")
  }

  test("cut duplicate diagnostic reports the LATER path") {
    // cut-dup-fields ztest: `cut rec.sub.sub,rec.sub` reports rec.sub —
    // the later target, whether it extends or is extended by the earlier
    val e = intercept[Exception](run("from nation | cut n_name.x, n_name"))
    assert(e.getMessage.contains("\"n_name\""), e.getMessage)
    val e2 = intercept[Exception](run("from nation | cut n_name, n_name.x"))
    assert(e2.getMessage.contains("\"n_name.x\""), e2.getMessage)
  }
}
