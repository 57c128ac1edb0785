package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types._

import graft.operators.ZedOps
import graft.functions.{Shaper, ZedFunctions => F}
import graft.pipeline.{CorpusOps, DedupOps, MultimodalOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator/function family from
  * SURVEY.md §2 against the driver's TPC-H-ish parquet; `oracleSql` holds
  * the DuckDB-equivalent SQL the driver uses as the correctness oracle.
  * Every query ends in an explicit deterministic ORDER BY (mirrored in the
  * SQL) and numeric aggregates are rounded identically on both sides so
  * the value-hash compare is stable across engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 skeleton via the zed pipeline:
    * `from lineitem | l_shipdate <= 1998-09-02
    *  | summarize …aggs by l_returnflag, l_linestatus | sort`.
    */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  /** Money math in exact DecimalType: double sums depend on accumulation
    * order and engines round the last ULP differently; decimal sums are
    * exact and order-independent, so the value-hash compare is stable at
    * any scale/partitioning (VERDICT r1 "What's wrong" #1).
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** The decimal's exact unscaled long (cents): sums/products then run in
    * plain long arithmetic inside whole-stage codegen instead of through
    * BigDecimal-backed wide-precision accumulators (sum over decimal(18,2)
    * widens to decimal(28,2), which no longer fits Spark's compact long
    * representation — every row paid a BigDecimal add). The decimal CAST
    * still does the rounding, so results are bit-identical: an exact
    * integer sum divided once at the end is the same correctly-rounded
    * double as the decimal sum cast to double (IEEE division and
    * BigDecimal.doubleValue both round the same rational to nearest).
    * Measured on q1_agg at sf0.1/local[32]: 0.75 s → 0.47 s (min-of-3).
    */
  private def cents(c: Column): Column = graft.functions.Bridge.column(
    org.apache.spark.sql.catalyst.expressions.UnscaledValue(
      graft.functions.Bridge.expression(dec(c))))

  /** Exact 128-bit cents sum (SumInt128): plain-long codegen inner loop,
    * no 2^63 wrap at any group size; the decimal result divides once in
    * the decimal domain and casts to double LAST, so the single-rounding
    * guarantee vs the oracle's decimal sum holds at any scale (a long sum
    * implicitly cast to double would double-round past 2^53).
    */
  private def sumCents128(c: Column): Column = graft.functions.Bridge.column(
    graft.functions.SumInt128(graft.functions.Bridge.expression(c))
      .toAggregateExpression())

  /** Spark's file stream source requires a DIRECTORY; the testdata tables
    * are single parquet files — stage one into a temp dir to stream it.
    */
  private def stageStreamDir(src: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      d.resolve("part-0.parquet")): Unit
    d.toString
  }

  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    ZedOps.sort(
      ZedOps.summarize(
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")),
        keys = Seq(
          "l_returnflag" -> col("l_returnflag"),
          "l_linestatus" -> col("l_linestatus")
        ),
        aggs = Seq(
          // qty cents ≤ 5000/row: the plain long sum wraps only past
          // ~1.8e15 rows per group — orders beyond the 100 TB posture
          "sum_qty" -> (sum(cents(col("l_quantity"))) / 100.0),
          "sum_base_price" ->
            (sumCents128(cents(col("l_extendedprice")))
              / lit(100).cast(DecimalType(3, 0))).cast(DoubleType),
          // product of two 2-decimal values is exact at 4 decimals — no
          // rounding anywhere, so no engine tie-breaking can diverge; in
          // the cents domain that is an exact long product summed exactly
          // (int128 accumulator: no wrap at any group size)
          "sum_disc_price" ->
            (sumCents128(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount"))))
              / lit(10000).cast(DecimalType(5, 0))).cast(DoubleType),
          "avg_qty" -> round(avg(col("l_quantity")), 4),
          "count_order" -> count(lit(1))
        )
      ),
      col("l_returnflag") -> true,
      col("l_linestatus") -> true
    )
  }

  /** (name, spark-query, duckdb-oracle-sql — None ⇒ rows-only check). */
  private val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- summarize / group-by (runtime/sam/op/groupby) ----
    ("q1_agg", (s, dir) => q1Agg(s, dir), Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    ("q_count", (s, dir) =>
      ZedOps.summarize(t(s, dir, "lineitem"), Seq.empty,
        Seq("count" -> count(lit(1)))),
      Some("SELECT count(*) AS count FROM lineitem")),

    ("q_count_by", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq("count" -> count(lit(1)))),
        col("event_type") -> true),
      Some("""SELECT event_type, count(*) AS count FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    ("q_agg_stats", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq(
            "sum_value" -> round(sum(col("value")), 2),
            "avg_value" -> round(avg(col("value")), 4),
            "min_value" -> min(col("value")),
            "max_value" -> max(col("value"))
          )),
        col("event_type") -> true),
      Some("""SELECT event_type,
             |  round(sum("value"), 2) AS sum_value,
             |  round(avg("value"), 4) AS avg_value,
             |  min("value") AS min_value,
             |  max("value") AS max_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // `summarize … every 1h` — time-bucketed aggregation
    ("q_every", (s, dir) => {
      // ts carrier varies by writer (ns-long vs TIMESTAMP_NTZ) — adapt
      val ev = t(s, dir, "events")
      ZedOps.sort(
        ZedOps.summarize(ev,
          Seq("bucket" -> ZedOps.timeBucketNs(
            F.toNs(col("ts"), ev.schema("ts").dataType), "1h")),
          Seq("count" -> count(lit(1)),
              "sum_value" -> round(sum(col("value")), 2))),
        col("bucket") -> true)
    },
      Some("""SELECT date_trunc('hour', ts) AS bucket, count(*) AS count,
             |  round(sum("value"), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // approx distinct (zed dcount = HLL; estimates differ per impl ⇒ rows-only)
    // dcount is approximate (HLL++); the oracle asserts the reference
    // contract instead of the raw sketch: relative error < 5% of the
    // exact distinct count per group (agg/dcount tolerance)
    ("q_dcount", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq(
            // the reference's sketch (metro-hashed loglog-beta HLL) —
            // documented estimates reproduce exactly (dcount.md)
            "dusers" -> graft.lang.Compiler.zdcount(col("user_id")),
            "exact" -> countDistinct(col("user_id"))))
          .select(
            col("event_type"),
            (abs(col("dusers") - col("exact")) <= col("exact") * 0.05).as("within_5pct")),
        col("event_type") -> true),
      Some("""SELECT event_type, true AS within_5pct FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // exact distinct count — the verifiable twin of q_dcount
    ("q_count_distinct", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq("dusers" -> count_distinct(col("user_id")))),
        col("event_type") -> true),
      Some("""SELECT event_type, count(DISTINCT user_id) AS dusers
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- filter / where (runtime/sam/expr/filter.go) ----
    ("q_where", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") === 30.0)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        col("l_orderkey") -> true, col("l_linenumber") -> true),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity = 30
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- cut / put / drop / rename (runtime/sam/expr/{cutter,putter,dropper,renamer}) ----
    ("q_cut", (s, dir) =>
      ZedOps.sort(
        ZedOps.cut(t(s, dir, "lineitem"),
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"),
          "l_shipdate" -> col("l_shipdate")),
        col("l_orderkey") -> true, col("l_linenumber") -> true),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("q_put", (s, dir) =>
      ZedOps.sort(
        ZedOps.put(t(s, dir, "lineitem"),
          // exact money math in the cents domain — see the q1_agg note
          "revenue" -> (cents(col("l_extendedprice"))
            * (lit(100L) - cents(col("l_discount"))) / 10000.0))
          .select(col("l_orderkey"), col("l_linenumber"), col("revenue")),
        col("l_orderkey") -> true, col("l_linenumber") -> true),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("q_drop", (s, dir) =>
      ZedOps.sort(
        ZedOps.drop(t(s, dir, "part"), "p_name", "p_brand", "p_type"),
        col("p_partkey") -> true),
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part
             |ORDER BY p_partkey""".stripMargin)),

    ("q_rename", (s, dir) =>
      ZedOps.sort(
        ZedOps.rename(t(s, dir, "nation"), "name" -> "n_name"),
        col("n_nationkey") -> true),
      Some("""SELECT n_nationkey, n_name AS name, n_regionkey FROM nation
             |ORDER BY n_nationkey""".stripMargin)),

    // ---- sort / head / tail / top (runtime/sam/op/{sort,head,tail,top}) ----
    ("q_sort", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        col("o_totalprice") -> false, col("o_orderkey") -> true),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    ("q_head", (s, dir) =>
      ZedOps.head(
        ZedOps.sort(t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          col("o_orderkey") -> true), 10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 10""".stripMargin)),

    ("q_tail", (s, dir) =>
      ZedOps.tail(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        10, col("o_orderkey")),
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  ORDER BY o_orderkey DESC LIMIT 10) t
             |ORDER BY o_orderkey""".stripMargin)),

    ("q_top", (s, dir) =>
      ZedOps.top(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        5, col("o_totalprice"), col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 5""".stripMargin)),

    // ---- uniq (runtime/sam/op/uniq) ----
    ("q_uniq", (s, dir) =>
      ZedOps.sort(
        ZedOps.uniq(t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))),
        col("l_returnflag") -> true, col("l_linestatus") -> true),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    ("q_uniq_count", (s, dir) =>
      ZedOps.sort(
        ZedOps.uniqCount(t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))),
        col("l_returnflag") -> true, col("l_linestatus") -> true),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS count FROM lineitem
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- join styles (runtime/sam/op/join) ----
    ("q_join_inner", (s, dir) =>
      ZedOps.sort(
        ZedOps.join(
          t(s, dir, "orders"), t(s, dir, "customer"),
          col("o_custkey"), col("c_custkey"), "inner",
          Seq("c_name" -> col("c_name"), "c_mktsegment" -> col("c_mktsegment")))
          .select(col("o_orderkey"), col("c_name"), col("c_mktsegment")),
        col("o_orderkey") -> true),
      Some("""SELECT o_orderkey, c_name, c_mktsegment
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    ("q_join_left", (s, dir) =>
      ZedOps.sort(
        ZedOps.join(
          t(s, dir, "customer"), t(s, dir, "orders"),
          col("c_custkey"), col("o_custkey"), "left",
          Seq("o_orderkey" -> col("o_orderkey")))
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders")),
        col("c_custkey") -> true),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    ("q_join_anti", (s, dir) =>
      ZedOps.sort(
        ZedOps.join(
          t(s, dir, "customer").select(col("c_custkey")),
          t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey"), col("o_custkey"), "anti", Seq.empty),
        col("c_custkey") -> true),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- collect / union-set aggregates (agg/collect.go, agg/union.go) ----
    // array results are serialized to a sorted CSV string on both sides:
    // the driver's pandas value-hash cannot hash ndarray columns (r1 err).
    ("q_collect", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("user_id" -> col("user_id")),
          Seq("types" -> array_join(sort_array(collect_list(col("event_type"))), ","))),
        col("user_id") -> true),
      Some("""SELECT user_id, array_to_string(list_sort(list(event_type)), ',') AS types
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    ("q_union_set", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> col("l_returnflag")),
          Seq("statuses" -> array_join(sort_array(collect_set(col("l_linestatus"))), ","))),
        col("l_returnflag") -> true),
      Some("""SELECT l_returnflag,
             |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- fork/switch/merge/combine/fuse (runtime/sam/op/{fork,switcher,merge,combine,fuse}) ----
    ("q_fuse", (s, dir) =>
      ZedOps.sort(
        ZedOps.fuse(
          t(s, dir, "orders").select(col("o_orderkey").as("id"), col("o_totalprice").as("amount")),
          t(s, dir, "customer").select(col("c_custkey").as("id"), col("c_name").as("name"))),
        col("id") -> true, col("amount") -> true, col("name") -> true),
      Some("""SELECT o_orderkey AS id, o_totalprice AS amount, CAST(NULL AS VARCHAR) AS name FROM orders
             |UNION ALL
             |SELECT c_custkey, CAST(NULL AS DOUBLE), c_name FROM customer
             |ORDER BY id ASC, amount ASC NULLS LAST, name ASC NULLS LAST""".stripMargin)),

    ("q_switch", (s, dir) =>
      ZedOps.sort(
        ZedOps.switchCase(
          t(s, dir, "events").select(col("event_id"), col("event_type")),
          cases = Seq(
            (col("event_type") === "purchase",
              Seq("event_id" -> col("event_id"), "branch" -> lit("p"))),
            (col("event_type") === "error",
              Seq("event_id" -> col("event_id"), "branch" -> lit("e")))),
          default = Some(Seq("event_id" -> col("event_id"), "branch" -> lit("other")))),
        col("event_id") -> true),
      Some("""SELECT event_id,
             |  CASE WHEN event_type = 'purchase' THEN 'p'
             |       WHEN event_type = 'error' THEN 'e'
             |       ELSE 'other' END AS branch
             |FROM events ORDER BY event_id""".stripMargin)),

    ("q_merge", (s, dir) =>
      ZedOps.merge(
        Seq(col("o_orderkey") -> true),
        t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus")),
        t(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_orderstatus"))),
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE o_orderstatus IN ('F', 'O') ORDER BY o_orderkey""".stripMargin)),

    // ---- over / explode (runtime/sam/op/traverse, op/explode) ----
    ("q_over", (s, dir) =>
      ZedOps.sort(
        ZedOps.overLateral(t(s, dir, "embeddings"), col("embedding"), "elem", Seq("vec_id")),
        col("vec_id") -> true, col("elem") -> true),
      Some("""SELECT vec_id, unnest(embedding) AS elem FROM embeddings
             |ORDER BY vec_id, elem""".stripMargin)),

    // ---- assert (semantic/op.go:753) ----
    ("q_assert", (s, dir) =>
      ZedOps.sort(
        ZedOps.assertOp(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          col("l_quantity") > 0, "l_quantity > 0"),
        col("l_orderkey") -> true, col("l_linenumber") -> true),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  CASE WHEN l_quantity > 0 THEN CAST(NULL AS VARCHAR)
             |       ELSE 'assertion failed: l_quantity > 0' END AS error
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ==== LLM-data-pipeline operators (graft.pipeline) ====

    // exact dedup by normalized-content hash (pipeline/DedupOps.dedupExact)
    ("q_dedup_exact", (s, dir) =>
      ZedOps.sort(
        DedupOps.dedupExact(t(s, dir, "documents"), col("doc_id"), col("text"))
          .select(col("doc_id"), col("n_dups")),
        col("doc_id") -> true),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents
             |GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             |ORDER BY doc_id""".stripMargin)),

    // near-dup dedup: MinHash-LSH banded candidates + exact 3-gram Jaccard
    // verify. The oracle computes ground-truth all-pairs Jaccard; LSH miss
    // probability at the data's j>=0.8 pairs is <=2e-4, so outputs agree.
    ("q_dedup_near", (s, dir) =>
      ZedOps.sort(
        DedupOps.nearDupPairs(t(s, dir, "documents"), col("doc_id"), col("text"))
          .select(col("d1"), col("d2")),
        col("d1") -> true, col("d2") -> true),
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
             |  FROM documents
             |), idx AS (
             |  SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i FROM w
             |), sh AS (
             |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx
             |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT d1, d2
             |FROM inter JOIN cnt c1 ON inter.d1 = c1.doc_id JOIN cnt c2 ON inter.d2 = c2.doc_id
             |WHERE CAST(i AS DOUBLE) / (c1.n + c2.n - i) >= 0.5
             |ORDER BY d1, d2""".stripMargin)),

    // EXACT n-gram Jaccard near-dup via the inverted-index join (no LSH,
    // no recall bound) — same oracle as the LSH path: both must produce
    // the exact pair set at the threshold
    ("q_dedup_jaccard", (s, dir) =>
      ZedOps.sort(
        DedupOps.jaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"))
          .select(col("d1"), col("d2")),
        col("d1") -> true, col("d2") -> true),
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
             |  FROM documents
             |), idx AS (
             |  SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i FROM w
             |), sh AS (
             |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx
             |), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |inter AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |)
             |SELECT d1, d2
             |FROM inter JOIN cnt c1 ON inter.d1 = c1.doc_id JOIN cnt c2 ON inter.d2 = c2.doc_id
             |WHERE CAST(i AS DOUBLE) / (c1.n + c2.n - i) >= 0.5
             |ORDER BY d1, d2""".stripMargin)),

    // SimHash near-dup (banded 16-bit chunks). The per-token hash is
    // md5-based (engine-portable), so the oracle recomputes the full
    // signature + banding + Hamming filter in SQL — exact pairs.
    ("q_dedup_simhash", (s, dir) =>
      ZedOps.sort(
        DedupOps.simhashPairs(t(s, dir, "documents"), col("doc_id"), col("text")),
        col("d1") -> true, col("d2") -> true),
      Some(simhashOracleSql)),

    // exact cosine top-k over embeddings (pipeline/VectorOps.knnBruteForce)
    ("q_knn_brute", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      ZedOps.sort(
        VectorOps.knnBruteForce(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10),
        col("qid") -> true, col("rank") -> true)
    },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
             |scored AS (
             |  SELECT qid, e.vec_id AS nid, list_cosine_similarity(qe, e.embedding) AS cos
             |  FROM q, embeddings e WHERE e.vec_id <> qid
             |)
             |SELECT qid, nid, rank FROM (
             |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             |  FROM scored) t WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin)),

    // LSH-bucketed ANN (scale path; recall vs brute checked in
    // PipelineSpec). Seeded hyperplanes are deterministic, so the oracle
    // re-runs the same buckets/probes in SQL with the planes inlined.
    ("q_knn_lsh", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      ZedOps.sort(
        VectorOps.knnLsh(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, dim = 64),
        col("qid") -> true, col("rank") -> true)
    }, Some(knnLshOracleSql)),

    // IVF inverted-list ANN (k-means coarse quantizer + nprobe bucket
    // join; recall vs brute checked in PipelineSpec)
    ("q_knn_ivf", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      ZedOps.sort(
        VectorOps.knnIvf(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nlist = 16, nprobe = 4),
        col("qid") -> true, col("rank") -> true)
    }, Some(knnIvfOracleSql)),

    // deterministic hash-bucket sampling (pipeline/CorpusOps): stable
    // membership under repartitioning; md5 buckets are engine-portable,
    // so the oracle is exact
    ("q_corpus_sample", (s, dir) =>
      ZedOps.sort(
        CorpusOps.hashSample(t(s, dir, "documents"), col("doc_id"), 0.25)
          .select(col("doc_id"), col("lang"), col("source")),
        col("doc_id") -> true),
      Some("""SELECT doc_id, lang, source FROM documents
             |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000 < 2500
             |ORDER BY doc_id""".stripMargin)),

    // leak-proof train/val/test split: a key always lands in the same
    // slice (pipeline/CorpusOps.hashSplit)
    ("q_corpus_split", (s, dir) =>
      ZedOps.sort(
        CorpusOps.hashSplit(t(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy(col("split")).agg(count(lit(1)).as("n")),
        col("split") -> true),
      Some("""SELECT CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
             |  count(*) AS n
             |FROM (SELECT ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000 AS b
             |      FROM documents) t
             |GROUP BY 1 ORDER BY split""".stripMargin)),

    // token-window chunking: 64-token windows overlapping by 16
    // (pipeline/TextOps.chunk) — the context-length splitter
    // winnowing fingerprints (pipeline/TextOps.winnowFingerprints) with
    // the engine-portable md5 token hash so DuckDB recomputes the exact
    // fingerprint sets (window mins + dedup are pure logic)
    ("q_text_winnow", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "documents").select(
          col("doc_id"),
          array_join(array_sort(TextOps.winnowFingerprints(col("text"), 5,
            tok => conv(substring(md5(tok), 1, 15), 16, 10).cast("long"))),
            ",").as("fps")),
        col("doc_id") -> true),
      Some(winnowOracleSql)),

    // embedding-cosine near-dup pairs (pipeline/VectorOps
    // .cosineNearDupPairs): random embeddings have no near pairs, so the
    // query PLANTS deterministic scaled copies of the first 20 vectors;
    // LSH buckets must surface each planted pair and the verify stage
    // must pass them at the 0.9 threshold
    ("q_dedup_cosine", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val planted = emb.filter(col("vec_id") < 20).select(
        (col("vec_id") + 100000L).as("vec_id"),
        // x2 scaling: exact in binary fp on BOTH engines, preserves the
        // direction exactly (same sign bits -> same bucket; cos == 1)
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      ZedOps.sort(
        VectorOps.cosineNearDupPairs(emb.select("vec_id", "embedding")
            .unionAll(planted), "vec_id", "embedding", 0.9, dim = 64)
          .select(col("d1"), col("d2"), round(col("cos"), 4).as("cos4")),
        col("d1") -> true, col("d2") -> true)
    }, Some(cosineNearDupOracleSql)),

    ("q_text_chunk", (s, dir) =>
      ZedOps.sort(
        TextOps.chunk(t(s, dir, "documents").select(col("doc_id"), col("text")),
          col("text"), 64, 16)
          .select(col("doc_id"), col("chunk_idx"), col("chunk_text")),
        col("doc_id") -> true, col("chunk_idx") -> true),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS tk
             |  FROM documents
             |), nch AS (
             |  SELECT doc_id, tk,
             |    CASE WHEN len(tk) <= 64 THEN 1
             |         ELSE CAST(FLOOR((len(tk) - 64 + 47) / 48.0) AS INT) + 1 END AS k
             |  FROM toks
             |), idx AS (
             |  SELECT doc_id, tk, unnest(generate_series(0, k - 1)) AS chunk_idx FROM nch
             |)
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |  array_to_string(list_slice(tk, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ') AS chunk_text
             |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin)),

    // symmetric int8 embedding quantization (pipeline/VectorOps) — the
    // floor(x+1/2) form is bit-identical across engines → exact oracle
    ("q_embed_quantize", (s, dir) => {
      val (scale, q) = VectorOps.quantizeInt8(col("embedding"))
      ZedOps.sort(
        t(s, dir, "embeddings").select(col("vec_id"), scale.as("scale"),
          array_join(q.cast("array<string>"), ",").as("q")),
        col("vec_id") -> true)
    },
      Some("""SELECT vec_id,
             |  CASE WHEN m > 0 THEN m/127.0 ELSE 1.0 END AS scale,
             |  array_to_string(list_transform(e, x ->
             |    CAST(CASE WHEN m > 0 THEN FLOOR(x*127.0/m + 0.5) ELSE 0 END AS INT)), ',') AS q
             |FROM (SELECT vec_id,
             |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
             |      FROM embeddings) t
             |ORDER BY vec_id""".stripMargin)),

    // text statistics: chars + whitespace tokens + BPE-ish tokens
    ("q_text_stats", (s, dir) => {
      val docs = t(s, dir, "documents")
      val norm = TextOps.normalize(col("text"))
      ZedOps.sort(
        docs.select(
          col("doc_id"),
          length(norm).as("n_chars_norm"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens")),
        col("doc_id") -> true)
    },
      Some("""SELECT doc_id,
             |  length(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS n_chars_norm,
             |  len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n_tokens,
             |  len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]')) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // quality scoring: exact integer/IEEE facets + indicator score
    ("q_text_quality", (s, dir) =>
      ZedOps.sort(
        TextOps.quality(t(s, dir, "documents"), col("doc_id"), col("text")),
        col("doc_id") -> true),
      Some("""WITH n AS (
             |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
             |  FROM documents
             |), f AS (
             |  SELECT doc_id,
             |    length(norm) AS n_chars,
             |    len(string_split(norm, ' ')) AS n_tokens,
             |    CAST(length(regexp_replace(norm, '\s', '', 'g')) AS DOUBLE)
             |      / len(string_split(norm, ' ')) AS mean_tok_len,
             |    CAST(length(regexp_replace(norm, '[\w\s]', '', 'g')) AS DOUBLE)
             |      / length(norm) AS punct_ratio,
             |    CAST(len(list_filter(string_split(norm, ' '), t -> list_contains(
             |      ['the','and','of','to','in','is','that','it','was','for','on','with','as','are','at','this','be','by','have'], t))) AS DOUBLE)
             |      / len(string_split(norm, ' ')) AS stop_ratio
             |  FROM n
             |)
             |SELECT doc_id, n_chars, n_tokens, mean_tok_len, punct_ratio, stop_ratio,
             |  (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END
             |   + CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END
             |   + CASE WHEN punct_ratio < 0.1 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END
             |   + CASE WHEN stop_ratio > 0.02 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END) AS score
             |FROM f ORDER BY doc_id""".stripMargin)),

    // token accounting per language slice (corpus-level budget planning)
    ("q_token_count", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "documents"),
          Seq("lang" -> col("lang")),
          Seq("n_docs" -> count(lit(1)),
            "total_tokens" -> sum(TextOps.bpeTokenCount(col("text"))))),
        col("lang") -> true),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'))) AS BIGINT) AS total_tokens
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // language-ID heuristic: the stopword-profile argmax is pure
    // deterministic math, so the DuckDB oracle RECOMPUTES it (same
    // normalize/tokenize/profile tables); accuracy on real-language
    // fixtures is pinned separately in PipelineSpec
    ("q_langid", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_pred")),
        col("doc_id") -> true),
      Some(langIdOracleSql)),

    // multimodal plumbing: binary media column → frame-sampled features
    // REAL payload decode (JDK-only): even doc_ids carry a solid-gray
    // JPEG (pixel-decoded via javax.imageio — a solid color survives
    // quantization exactly), odd ids a PCM16 WAV whose samples derive
    // from doc_id — so the oracle predicts pixel/sample sums exactly
    ("q_media_features", (s, dir) => {
      val mkJpeg = udf((id: Long) => MultimodalOps.makeSolidJpeg(
        (id % 16 + 8).toInt, (id % 12 + 8).toInt, ((id * 7) % 256).toInt))
      val mkWav = udf((id: Long) => {
        val n = (64 + id % 64).toInt
        MultimodalOps.makePcmWav(8000,
          Array.tabulate(n)(i => (((id * 31 + i.toLong * 7) % 4096) - 2048).toShort))
      })
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0, mkJpeg(col("doc_id")))
          .otherwise(mkWav(col("doc_id"))).as("media"))
      ZedOps.sort(
        MultimodalOps.mediaContent(docs, "doc_id", "media")
          .select(col("id").as("doc_id"), col("format"), col("width"),
            col("height"), col("n_units"), col("sum_val"), col("peak")),
        col("doc_id") -> true)
    },
      Some("""SELECT doc_id, 'jpeg' AS format,
             |  CAST(doc_id % 16 + 8 AS INT) AS width,
             |  CAST(doc_id % 12 + 8 AS INT) AS height,
             |  CAST((doc_id % 16 + 8) * (doc_id % 12 + 8) AS BIGINT) AS n_units,
             |  CAST(3 * ((doc_id * 7) % 256) * (doc_id % 16 + 8) * (doc_id % 12 + 8) AS BIGINT) AS sum_val,
             |  CAST((doc_id * 7) % 256 AS BIGINT) AS peak
             |FROM documents WHERE doc_id % 2 = 0
             |UNION ALL
             |SELECT d.doc_id, 'wav', 0, 0,
             |  CAST(64 + d.doc_id % 64 AS BIGINT),
             |  CAST(sum(((d.doc_id * 31 + s.i * 7) % 4096) - 2048) AS BIGINT),
             |  CAST(max(abs(((d.doc_id * 31 + s.i * 7) % 4096) - 2048)) AS BIGINT)
             |FROM documents d, generate_series(0, 127) s(i)
             |WHERE d.doc_id % 2 = 1 AND s.i < 64 + d.doc_id % 64
             |GROUP BY d.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // real container-header decode (JPEG SOF dimensions, WAV fmt chunk):
    // media binaries are built deterministically from table columns, so
    // the oracle predicts exactly what the parser must extract
    ("q_media_headers", (s, dir) => {
      val mkJpeg = udf((w: Int, h: Int) => MultimodalOps.makeJpeg(w, h))
      val mkWav = udf((r: Int, c: Int) => MultimodalOps.makeWav(r, c, 16, r / 2))
      val mkMp4 = udf((w: Int, h: Int, d: Int) => MultimodalOps.makeMp4(w, h, d))
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0,
          mkJpeg((col("doc_id") % 300 + 16).cast("int"), (col("doc_id") % 200 + 16).cast("int")))
          .when(col("doc_id") % 3 === 1,
            mkWav((lit(8000) + (col("doc_id") % 8) * 1000).cast("int"),
              (col("doc_id") % 2 + 1).cast("int")))
          .otherwise(
            mkMp4((col("doc_id") % 640 + 32).cast("int"), (col("doc_id") % 360 + 32).cast("int"),
              (col("doc_id") % 5000 + 1000).cast("int"))).as("media"))
      ZedOps.sort(
        MultimodalOps.mediaHeaders(docs, "doc_id", "media")
          .select(col("doc_id"), col("format"), col("width"), col("height"),
            col("sample_rate"), col("channels"),
            round(col("duration_ms"), 3).as("duration_ms")),
        col("doc_id") -> true)
    },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'jpeg' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS format,
             |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 300 + 16 AS INT)
             |       WHEN doc_id % 3 = 2 THEN CAST(doc_id % 640 + 32 AS INT) ELSE 0 END AS width,
             |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 200 + 16 AS INT)
             |       WHEN doc_id % 3 = 2 THEN CAST(doc_id % 360 + 32 AS INT) ELSE 0 END AS height,
             |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 8) * 1000 AS INT) ELSE 0 END AS sample_rate,
             |  CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 2 + 1 AS INT) ELSE 0 END AS channels,
             |  CASE WHEN doc_id % 3 = 1 THEN 500.0
             |       WHEN doc_id % 3 = 2 THEN CAST(doc_id % 5000 + 1000 AS DOUBLE) ELSE 0.0 END AS duration_ms
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ==== scalar function library (graft.functions; ref function/function.go) ====

    // math family (function/math.go)
    ("q_fn_math", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("abs_v"),
          ceil(col("l_quantity") / 7.0).cast("long").as("ceil_v"),
          floor(col("l_quantity") / 7.0).cast("long").as("floor_v"),
          sqrt(col("l_quantity")).as("sqrt_v"),
          round(log(col("l_quantity") + 1.0), 6).as("log_v"),
          F.minScalar(col("l_quantity"), col("l_discount") * 100).as("min_v"),
          F.maxScalar(col("l_quantity"), col("l_discount") * 100).as("max_v")),
        col("l_orderkey") -> true, col("l_linenumber") -> true),
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_quantity - 25.0) AS abs_v,
             |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_v,
             |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_v,
             |  sqrt(l_quantity) AS sqrt_v,
             |  round(ln(l_quantity + 1.0), 6) AS log_v,
             |  least(l_quantity, l_discount * 100) AS min_v,
             |  greatest(l_quantity, l_discount * 100) AS max_v
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // string family (function/string.go)
    ("q_fn_string", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "customer").select(
          col("c_custkey"),
          lower(col("c_name")).as("lo"),
          upper(col("c_mktsegment")).as("up"),
          F.runeLen(col("c_name")).as("rlen"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          F.joinStr(split(col("c_name"), "#"), "-").as("joined"),
          levenshtein(col("c_name"), col("c_mktsegment")).as("lev"),
          trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed")),
        col("c_custkey") -> true),
      Some("""SELECT c_custkey,
             |  lower(c_name) AS lo, upper(c_mktsegment) AS up,
             |  length(c_name) AS rlen,
             |  replace(c_name, 'Customer', 'Cust') AS repl,
             |  array_to_string(string_split(c_name, '#'), '-') AS joined,
             |  levenshtein(c_name, c_mktsegment) AS lev,
             |  trim('  ' || c_mktsegment || ' ') AS trimmed
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // regexp family (function/regexp.go): first-match submatch array +
    // replace-all + match test, over the JSON-ish events.props strings
    ("q_fn_regexp", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "events").select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"),
          regexp_replace(col("props"), "[0-9]+", "N").as("masked"),
          col("props").rlike("[0-9]{2,}").as("multi_digit"),
          array_join(F.regexpMatch("\\{\"k\": ([0-9]+)\\}", col("props")), "|").as("submatches")),
        col("event_id") -> true),
      Some("""SELECT event_id,
             |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
             |  regexp_replace(props, '[0-9]+', 'N', 'g') AS masked,
             |  regexp_matches(props, '[0-9]{2,}') AS multi_digit,
             |  CASE WHEN regexp_matches(props, '\{"k": ([0-9]+)\}')
             |       THEN regexp_extract(props, '\{"k": ([0-9]+)\}', 0) || '|'
             |            || regexp_extract(props, '\{"k": ([0-9]+)\}', 1)
             |       ELSE NULL END AS submatches
             |FROM events ORDER BY event_id""".stripMargin)),

    // network family (function/ip.go): cidr_match + network_of over
    // IPs synthesized deterministically from order keys
    ("q_fn_net", (s, dir) => {
      val o = t(s, dir, "orders")
      val ip = concat_ws(".",
        lit("10"), (col("o_custkey") % 200).cast("string"),
        (col("o_orderkey") % 250).cast("string"),
        ((col("o_orderkey") * 7) % 250).cast("string"))
      ZedOps.sort(
        o.select(
          col("o_orderkey"), ip.as("ip"),
          F.networkOf(ip, lit(24)).as("net24"),
          F.networkOf(ip, lit(16)).as("net16"),
          F.cidrMatch(lit("10.42.0.0/16"), ip).as("in_42")),
        col("o_orderkey") -> true)
    },
      Some("""SELECT o_orderkey,
             |  '10.' || (o_custkey % 200) || '.' || (o_orderkey % 250) || '.'
             |    || ((o_orderkey * 7) % 250) AS ip,
             |  '10.' || (o_custkey % 200) || '.' || (o_orderkey % 250) || '.0/24' AS net24,
             |  '10.' || (o_custkey % 200) || '.0.0/16' AS net16,
             |  (o_custkey % 200) = 42 AS in_42
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // time family (function/time.go): strftime over ns-native event times
    ("q_fn_time", (s, dir) => {
      val ev = t(s, dir, "events")
      val ts = F.asTs(col("ts"), ev.schema("ts").dataType)
      ZedOps.sort(
        ev.select(
          col("event_id"),
          F.strftime("%Y-%m-%dT%H:%M:%S", ts).as("iso"),
          F.strftime("%j", ts).as("doy"),
          F.strftime("%F %T", ts).as("full")),
        col("event_id") -> true)
    },
      Some("""SELECT event_id,
             |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso,
             |  strftime(ts, '%j') AS doy,
             |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS full
             |FROM events ORDER BY event_id""".stripMargin)),

    // parsing family (function/parse.go): parse_uri over synthesized URIs
    ("q_fn_parse", (s, dir) => {
      val o = t(s, dir, "orders")
      val uri = concat(
        lit("https://host"), (col("o_custkey") % 50).cast("string"),
        lit(".example.com:8080/orders/"), col("o_orderkey").cast("string"),
        lit("?status="), col("o_orderstatus"), lit("#frag"))
      val u = F.parseUri(uri)
      ZedOps.sort(
        o.select(
          col("o_orderkey"),
          u.getField("scheme").as("scheme"),
          u.getField("host").as("host"),
          u.getField("port").as("port"),
          u.getField("path").as("path"),
          element_at(u.getField("query").getItem("status"), 1).as("status"),
          u.getField("fragment").as("fragment")),
        col("o_orderkey") -> true)
    },
      Some("""SELECT o_orderkey,
             |  'https' AS scheme,
             |  'host' || (o_custkey % 50) || '.example.com' AS host,
             |  8080 AS port,
             |  '/orders/' || o_orderkey AS path,
             |  o_orderstatus AS status,
             |  'frag' AS fragment
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // grok (function/grok.go): structured extraction from log-ish lines
    ("q_fn_grok", (s, dir) => {
      val e = t(s, dir, "events")
      val line = concat(col("event_type"), lit(" "), col("user_id").cast("string"),
        lit(" /api/v"), (col("user_id") % 3).cast("string"))
      val g = F.grok("%{WORD:etype} %{INT:uid} %{URIPATH:path}", line)
      ZedOps.sort(
        e.select(
          col("event_id"),
          g.getField("etype").as("etype"),
          g.getField("uid").as("uid"),
          g.getField("path").as("path")),
        col("event_id") -> true)
    },
      Some("""SELECT event_id, event_type AS etype,
             |  CAST(user_id AS VARCHAR) AS uid,
             |  '/api/v' || (user_id % 3) AS path
             |FROM events ORDER BY event_id""".stripMargin)),

    // bytes/encoding family (function/bytes.go)
    ("q_fn_bytes", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "nation").select(
          col("n_nationkey"),
          hex(col("n_name").cast("binary")).as("hexed"),
          base64(col("n_name").cast("binary")).as("b64"),
          decode(unbase64(base64(col("n_name").cast("binary"))), "UTF-8").as("roundtrip")),
        col("n_nationkey") -> true),
      Some("""SELECT n_nationkey,
             |  hex(encode(n_name)) AS hexed,
             |  base64(encode(n_name)) AS b64,
             |  n_name AS roundtrip
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // type introspection family (function/types.go) — compile-time against
    // the schema, like zed's semantic pass folding typeof over known types
    ("q_fn_type", (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(
        Shaper.typeof(li, "l_orderkey").as("t_orderkey"),
        Shaper.typeof(li, "l_quantity").as("t_quantity"),
        Shaper.typeof(li, "l_returnflag").as("t_returnflag"),
        Shaper.kind(li, "l_orderkey").as("k_orderkey"),
        Shaper.has(li, "l_quantity").as("has_qty"),
        Shaper.missing(li, "no_such_field").as("missing_nope")
      ).limit(1)
    },
      Some("""SELECT 'int64' AS t_orderkey, 'float64' AS t_quantity,
             |  'string' AS t_returnflag, 'primitive' AS k_orderkey,
             |  true AS has_qty, true AS missing_nope""".stripMargin)),

    // record/structural family: flatten-to-dotted + shaper cast/crop/fill/order
    ("q_fn_flatten", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), struct(col("c_name"), col("c_mktsegment")).as("info"))
      ZedOps.sort(
        Shaper.flattenDotted(c),
        col("c_custkey") -> true)
    },
      Some("""SELECT c_custkey, c_name AS "info.c_name",
             |  c_mktsegment AS "info.c_mktsegment"
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    ("q_fn_shape", (s, dir) => {
      val target = StructType(Seq(
        StructField("c_name", StringType),
        StructField("c_custkey", IntegerType),
        StructField("c_extra", StringType)))
      // shape keeps extra input fields (shaper.go:40); compose with crop
      // for the fixed relational contract the oracle pins
      ZedOps.sort(
        Shaper.cropTo(Shaper.shapeTo(t(s, dir, "customer"), target), target),
        col("c_custkey") -> true)
    },
      Some("""SELECT c_name, CAST(c_custkey AS INT) AS c_custkey,
             |  CAST(NULL AS VARCHAR) AS c_extra
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // grep (function/grep.go): substring search across fields
    ("q_fn_grep", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "documents")
          .filter(F.grep("fast", col("text"), col("source")))
          .select(col("doc_id"), col("source")),
        col("doc_id") -> true),
      Some("""SELECT doc_id, source FROM documents
             |WHERE lower(text) LIKE '%fast%' OR lower(source) LIKE '%fast%'
             |ORDER BY doc_id""".stripMargin)),

    // ---- remaining aggregates (agg/logical.go, agg/any.go, agg/collectmap.go) ----
    ("q_agg_bool", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq("all_pos" -> bool_and(col("value") > 0.0),
              "any_hi" -> bool_or(col("value") > 90.0))),
        col("event_type") -> true),
      Some("""SELECT event_type, bool_and("value" > 0.0) AS all_pos,
             |  bool_or("value" > 90.0) AS any_hi
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // any(e) is deterministic when each group is a single value
    ("q_any", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "nation"),
          Seq("n_nationkey" -> col("n_nationkey")),
          Seq("rk" -> first(col("n_regionkey"), ignoreNulls = true))),
        col("n_nationkey") -> true),
      Some("""SELECT n_nationkey, n_regionkey AS rk FROM nation
             |ORDER BY n_nationkey""".stripMargin)),

    // collect_map: merge {k:v} entries into one map (agg/collectmap.go);
    // serialized to canonical JSON for the oracle hash compare
    ("q_collect_map", (s, dir) => {
      val pairs = ZedOps.summarize(t(s, dir, "events"),
        Seq("user_id" -> col("user_id"), "event_type" -> col("event_type")),
        Seq("cnt" -> count(lit(1))))
      ZedOps.sort(
        ZedOps.summarize(pairs,
          Seq("user_id" -> col("user_id")),
          Seq("type_counts" -> to_json(map_from_entries(
            sort_array(collect_list(struct(col("event_type"), col("cnt")))))))),
        col("user_id") -> true)
    },
      Some("""WITH pairs AS (
             |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2)
             |SELECT user_id,
             |  '{' || string_agg('"' || event_type || '":' || cnt, ',' ORDER BY event_type) || '}'
             |    AS type_counts
             |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- explode by type (op/explode/explode.go) ----
    ("q_explode", (s, dir) =>
      ZedOps.sort(
        ZedOps.explodeBy(t(s, dir, "orders"), "v",
          col("o_orderstatus"), col("o_orderpriority")),
        col("v") -> true),
      Some("""SELECT o_orderstatus AS v FROM orders
             |UNION ALL SELECT o_orderpriority FROM orders
             |ORDER BY v""".stripMargin)),

    // ---- shape/sample (op/shape/shaper.go) — one representative per
    // shape, DETERMINIZED to the min-event_id row so the choice (the
    // reference's `any`) is oracle-comparable and cluster-size stable
    ("q_shape_sample", (s, dir) =>
      ZedOps.sort(
        ZedOps.sampleByShapeMin(
          t(s, dir, "events").select(
            col("event_id"),
            when(col("value") > 50.0, col("value")).as("v")),
          col("event_id")),
        col("event_id") -> true),
      Some("""SELECT event_id, v FROM (
             |  SELECT event_id, v,
             |         row_number() OVER (PARTITION BY (v IS NULL) ORDER BY event_id) AS rn
             |  FROM (SELECT event_id, CASE WHEN value > 50.0 THEN value END AS v FROM events)
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // ---- heterogeneity: runtime type values over a mixed stream ----
    // (complex.go TypeUnion, type.go:479 type values; Het.fuseTagged)
    // chained field access on nested records through the variant runtime
    // (VariantGet + the deep-path d cache): rows box as {o:{a,b},top}
    // variants, then v.o.a / v.o.b / v.top extract natively in codegen —
    // the oracle is the plain relational projection the chain must equal
    ("q_variant_nested", (s, dir) => {
      val het = graft.operators.Het
      val zv = graft.functions.ZvOps
      val ev = t(s, dir, "events").select(col("event_id"), struct(
        struct(col("event_id").as("a"), col("event_type").as("b")).as("o"),
        (col("event_id") * 2).as("top")).as("v0"))
      val vdt = ev.schema("v0").dataType
      val boxed = ev.select(col("event_id"), het.variant(col("v0"), vdt).as("v"))
      ZedOps.sort(
        boxed.select(
          col("event_id"),
          zv.get(zv.get(col("v"), "o"), "a").getField("n").cast("long").as("a"),
          zv.get(zv.get(col("v"), "o"), "b").getField("s").as("b"),
          zv.get(col("v"), "top").getField("n").cast("long").as("top")),
        col("event_id") -> true)
    },
      Some("""SELECT event_id, event_id AS a, event_type AS b, event_id * 2 AS top
             |FROM events ORDER BY event_id""".stripMargin)),

    ("q_het_typeof", (s, dir) => {
      val mixed = graft.operators.Het.fuseTagged(
        t(s, dir, "region"), t(s, dir, "nation"))
      ZedOps.sort(
        mixed.groupBy(graft.operators.Het.typeofRow(mixed).as("t"))
          .agg(count(lit(1)).as("n")),
        col("t") -> true)
    },
      Some("""SELECT '{r_regionkey:int32,r_name:string}' AS t, count(*) AS n FROM region
             |UNION ALL
             |SELECT '{n_nationkey:int32,n_name:string,n_regionkey:int32}', count(*) FROM nation
             |ORDER BY t""".stripMargin)),

    // ---- union-typed (variant) column through group-by + cross-type
    // min/max (complex.go TypeUnion :290; Het.variant/compareKey): a
    // mixed int64/string stream groups by each value's runtime type and
    // aggregates under the cross-type total order
    ("q_het_union", (s, dir) => {
      val het = graft.operators.Het
      val e = t(s, dir, "events")
      val nums = e.select(het.variant(col("event_id").cast("long"), LongType).as("v"))
      val strs = e.select(het.variant(col("event_type"), StringType).as("v"))
      val mixed = nums.unionByName(strs)
      ZedOps.sort(
        mixed.groupBy(het.variantTypeOf(col("v")).as("t"))
          .agg(
            count(lit(1)).as("n"),
            het.render(het.minVariant(col("v"))).as("mn"),
            het.render(het.maxVariant(col("v"))).as("mx")),
        col("t") -> true)
    },
      Some("""SELECT 'int64' AS t, count(*) AS n,
             |       CAST(min(event_id) AS VARCHAR) AS mn,
             |       CAST(max(event_id) AS VARCHAR) AS mx FROM events
             |UNION ALL
             |SELECT 'string', count(*),
             |       '"' || min(event_type) || '"', '"' || max(event_type) || '"'
             |FROM events
             |ORDER BY t""".stripMargin)),

    // same union semantics, but through the FILE-SCALE typed reader: a
    // heterogeneous multi-shape .zson file read distributed (ZsonReader
    // .fromRDD — two-pass shape discovery + executor-side typed decode,
    // no driver materialization), proving file reads produce the same
    // tagged/variant frames as the in-memory harness
    ("q_het_file", (s, dir) => {
      val het = graft.operators.Het
      val e = t(s, dir, "events")
      val path = "/tmp/graft_io_het_zson"
      val lines = e.select(concat(lit("{v:"), col("event_id").cast("string"), lit("}")).as("l"))
        .unionAll(e.select(concat(lit("{v:\""), col("event_type"), lit("\"}")).as("l")))
      lines.write.mode("overwrite").text(path)
      val mixed = graft.sources.ZsonIO.read(s, path)
      ZedOps.sort(
        mixed.groupBy(het.variantTypeOf(col("v")).as("t"))
          .agg(
            count(lit(1)).as("n"),
            het.render(het.minVariant(col("v"))).as("mn"),
            het.render(het.maxVariant(col("v"))).as("mx")),
        col("t") -> true)
    },
      Some("""SELECT 'int64' AS t, count(*) AS n,
             |       CAST(min(event_id) AS VARCHAR) AS mn,
             |       CAST(max(event_id) AS VARCHAR) AS mx FROM events
             |UNION ALL
             |SELECT 'string', count(*),
             |       '"' || min(event_type) || '"', '"' || max(event_type) || '"'
             |FROM events
             |ORDER BY t""".stripMargin)),

    // ==== sources / sinks (graft.sources; ref zio/anyio, lake/) ====
    // Each round-trips real data through the format and re-verifies against
    // the oracle on the ORIGINAL table — reader+writer must both be exact.

    ("q_zson_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_zson_nation"
      graft.sources.ZsonIO.write(t(s, dir, "nation"), path)
      ZedOps.sort(
        graft.sources.ZsonIO.read(s, path).select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey")),
        col("n_nationkey") -> true)
    },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    ("q_zng_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_zng_nation"
      graft.sources.ZngIO.write(t(s, dir, "nation"), path)
      ZedOps.sort(
        graft.sources.ZngIO.read(s, path).select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey")),
        col("n_nationkey") -> true)
    },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    ("q_zjson_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_zjson_nation"
      graft.sources.ZjsonIO.write(t(s, dir, "nation"), path)
      ZedOps.sort(
        graft.sources.ZjsonIO.read(s, path).select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey")),
        col("n_nationkey") -> true)
    },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    ("q_vng_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_vng_supplier"
      val orig = t(s, dir, "supplier")
      graft.sources.VngIO.write(orig, path)
      val back = graft.sources.VngIO.read(s, path)
      ZedOps.sort(
        back.select(orig.schema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*),
        col("s_suppkey") -> true)
    },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    ("q_arrow_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_arrow_supplier"
      val orig = t(s, dir, "supplier")
      graft.sources.ArrowIO.write(orig, path)
      val back = graft.sources.ArrowIO.read(s, path)
      ZedOps.sort(
        back.select(orig.schema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*),
        col("s_suppkey") -> true)
    },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // gzip auto-detect (anyio/gzip.go): compressed ZSON reads through the
    // same path — text sources decompress via the Hadoop codec by suffix
    ("q_gzip_roundtrip", (s, dir) => {
      val plain = "/tmp/graft_io_gz_nation_plain"
      graft.sources.ZsonIO.write(t(s, dir, "nation").coalesce(1), plain)
      val gzDir = new java.io.File("/tmp/graft_io_gz_nation")
      org.apache.commons.io.FileUtils.deleteQuietly(gzDir); gzDir.mkdirs()
      val part = new java.io.File(plain).listFiles().filter(_.getName.startsWith("part-")).head
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(gzDir, "data.zson.gz")))
      out.write(java.nio.file.Files.readAllBytes(part.toPath)); out.close()
      ZedOps.sort(
        graft.sources.Formats.read(s, s"$gzDir/data.zson.gz").select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey")),
        col("n_nationkey") -> true)
    },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    ("q_zeek_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_zeek_nation"
      graft.sources.ZeekIO.write(t(s, dir, "nation"), path)
      // zeek TSV re-reads through the codegen block decode (uniform
      // multi-file directories) — exact against the original table
      ZedOps.sort(
        graft.sources.ZeekIO.read(s, path).select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey")),
        col("n_nationkey") -> true)
    },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    ("q_csv_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_csv_region.csv"
      graft.sources.Formats.write(t(s, dir, "region"), path, "csv")
      ZedOps.sort(
        graft.sources.Formats.read(s, path)
          .select(col("r_regionkey").cast("int").as("r_regionkey"), col("r_name")),
        col("r_regionkey") -> true)
    },
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    ("q_json_roundtrip", (s, dir) => {
      val path = "/tmp/graft_io_json_supplier.json"
      graft.sources.Formats.write(t(s, dir, "supplier"), path, "json")
      val orig = t(s, dir, "supplier")
      val back = graft.sources.Formats.read(s, path)
      ZedOps.sort(
        back.select(orig.schema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*),
        col("s_suppkey") -> true)
    },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    // lake-lite: two `load` commits then a merge-on-read scan (lake/, load.go)
    ("q_lake_scan", (s, dir) => {
      val root = "/tmp/graft_io_lake"
      val pool = "orders_" + System.nanoTime()
      val orders = t(s, dir, "orders")
      graft.sources.Lake.load(orders.filter(col("o_orderstatus") === "F"), root, pool)
      graft.sources.Lake.load(orders.filter(col("o_orderstatus") =!= "F"), root, pool)
      ZedOps.sort(
        graft.sources.Lake.scan(s, root, pool)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
        col("o_orderkey") -> true)
    },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // keyed pool (zed create -orderby; lake/seekindex/writer.go): loads
    // range-sort by the pool key and journal each object's [min,max]; a
    // range scan opens only overlapping objects and pushes the key
    // predicate into parquet row-group stats inside them
    ("q_lake_range", (s, dir) => {
      val root = "/tmp/graft_io_lake"
      val pool = "keyed_" + System.nanoTime()
      val lk = graft.sources.Lake
      lk.create(root, pool, Some("o_orderkey"))
      val orders = t(s, dir, "orders")
      lk.load(orders.filter(col("o_orderkey") < 3000), root, pool)
      lk.load(orders.filter(col("o_orderkey") >= 3000), root, pool)
      ZedOps.sort(
        lk.scan(s, root, pool, keyRange = Some(("1000", "2500")))
          .select(col("o_orderkey"), col("o_totalprice")),
        col("o_orderkey") -> true)
    },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_orderkey BETWEEN 1000 AND 2500 ORDER BY o_orderkey""".stripMargin)),

    // lake branches + delete-as-commit (lake/root.go:363-381, meta/
    // deleter.go): main keeps F orders after a delete on the branch; the
    // branch forks before the delete and adds P orders — each ref sees
    // its own live set, history intact
    ("q_lake_branch", (s, dir) => {
      val root = "/tmp/graft_io_lake"
      val pool = "branch_" + System.nanoTime()
      val orders = t(s, dir, "orders")
      val lk = graft.sources.Lake
      val c1 = lk.load(orders.filter(col("o_orderstatus") === "F"), root, pool)
      val c2 = lk.load(orders.filter(col("o_orderstatus") === "O"), root, pool)
      lk.branch(root, pool, "dev", Some(c1))
      lk.load(orders.filter(col("o_orderstatus") === "P"), root, pool, branch = "dev")
      lk.delete(root, pool, c2) // main loses the O orders
      val main = lk.scan(s, root, pool)
        .select(col("o_orderkey"), col("o_orderstatus"), lit("main").as("ref"))
      val dev = lk.scan(s, root, pool, Some("dev"))
        .select(col("o_orderkey"), col("o_orderstatus"), lit("dev").as("ref"))
      ZedOps.sort(main.unionByName(dev),
        col("ref") -> true, col("o_orderkey") -> true)
    },
      Some("""SELECT o_orderkey, o_orderstatus, 'main' AS ref FROM orders WHERE o_orderstatus = 'F'
             |UNION ALL
             |SELECT o_orderkey, o_orderstatus, 'dev' FROM orders WHERE o_orderstatus IN ('F','P')
             |ORDER BY ref, o_orderkey""".stripMargin)),

    // lake VECTOR twin read (db vector add; lake/api vector endpoints):
    // load → vectorAdd writes the object's VNG columnar twin → the PRUNED
    // VNG read of the twin must reproduce the rows exactly. This is the
    // vector-lake surface under the same DuckDB oracle as any table scan.
    ("q_vector_lake", (s, dir) => {
      val root = "/tmp/graft_io_lake"
      val pool = "vec_" + System.nanoTime()
      val lk = graft.sources.Lake
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val id = lk.load(docs, root, pool)
      lk.vectorAdd(s, root, pool, id)
      val back = graft.sources.VngIO.read(s, s"$root/$pool/data/$id-vector.vng")
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
      ZedOps.sort(back, col("doc_id") -> true)
    },
      Some("""SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""")),

    // `mirror` — batch output mux (runtime/sam/op/mirror/mirror.go): the
    // mirror leg lands in a real sink while the main leg flows on; both
    // legs must carry every row exactly once.
    ("q_mirror", (s, dir) => {
      val sink = "/tmp/graft_io_mirror_" + System.nanoTime()
      val nat = t(s, dir, "nation")
      val main = graft.sources.Lake.mirror(nat,
        _.write.mode("overwrite").parquet(sink))
      val side = s.read.parquet(sink)
      ZedOps.sort(
        main.withColumn("leg", lit("main"))
          .unionByName(side.withColumn("leg", lit("mirror"))),
        col("leg") -> true, col("n_nationkey") -> true)
    },
      Some("""SELECT *, 'main' AS leg FROM nation
             |UNION ALL
             |SELECT *, 'mirror' AS leg FROM nation
             |ORDER BY leg, n_nationkey""".stripMargin)),

    // STREAMING tumbling-window aggregation (Structured Streaming:
    // readStream → watermark → window → memory sink, AvailableNow) — the
    // stream answer must equal the batch GROUP BY date_trunc oracle.
    ("q_stream_window", (s, dir) => {
      val path = stageStreamDir(s"$dir/events.parquet")
      val schema = s.read.parquet(path).schema
      val ev = s.readStream.schema(schema).parquet(path)
        .withColumn("event_time", F.asTs(col("ts"), schema("ts").dataType))
        .withWatermark("event_time", "10 minutes")
      val agg = graft.streaming.StreamOps.everyCounts(ev, "1 hour")
      val sinkName = "q_stream_window_" + System.nanoTime()
      val q = agg.writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ZedOps.sort(
        s.table(sinkName).select(col("bucket"), col("count"),
          round(col("sum_value"), 2).as("sum_value")),
        col("bucket") -> true)
    },
      Some("""SELECT date_trunc('hour', ts) AS bucket, count(*) AS count,
             |  round(sum("value"), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAMING exact dedup (state-store dropDuplicates under a
    // watermark) — the kept key set is deterministic, so the stream
    // answer equals DISTINCT in batch.
    ("q_stream_dedup", (s, dir) => {
      val path = stageStreamDir(s"$dir/events.parquet")
      val schema = s.read.parquet(path).schema
      val ev = s.readStream.schema(schema).parquet(path)
        .withColumn("event_time", F.asTs(col("ts"), schema("ts").dataType))
        .withWatermark("event_time", "10 minutes")
      val dd = graft.streaming.StreamOps.dedupStream(ev, Seq("user_id", "event_type"))
        .select(col("event_time"), col("user_id"), col("event_type"))
      val sinkName = "q_stream_dedup_" + System.nanoTime()
      val q = dd.writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ZedOps.sort(s.table(sinkName),
        col("event_time") -> true, col("user_id") -> true,
        col("event_type") -> true)
    },
      Some("""SELECT DISTINCT ts AS event_time, user_id, event_type
             |FROM events ORDER BY event_time, user_id, event_type""".stripMargin)),

    // misc family (coalesce.go, len.go, compare.go)
    ("q_fn_misc", (s, dir) =>
      ZedOps.sort(
        t(s, dir, "customer").select(
          col("c_custkey"),
          coalesce(lit(null).cast("string"), col("c_mktsegment")).as("co"),
          length(col("c_name")).as("len_str"),
          size(split(col("c_name"), "#")).as("len_arr"),
          F.compareVals(col("c_acctbal"), lit(0.0)).as("cmp"),
          col("c_acctbal").cast("string").cast("double").as("cast_rt")),
        col("c_custkey") -> true),
      Some("""SELECT c_custkey,
             |  coalesce(CAST(NULL AS VARCHAR), c_mktsegment) AS co,
             |  length(c_name) AS len_str,
             |  len(string_split(c_name, '#')) AS len_arr,
             |  CASE WHEN c_acctbal < 0 THEN -1 WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS cmp,
             |  c_acctbal AS cast_rt
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )

  // ==== the Zed language frontend (graft.lang: Lexer → Parser → Compiler) ====
  // Every q_lang_* entry runs a *query string* through the full
  // parse → semantic → Catalyst pipeline (reference compiler/parser/parser.peg,
  // semantic/op.go) and is held to the same DuckDB oracle as the hand-built
  // DataFrame twin above — the frontend must reproduce the engine exactly.

  private def lang(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val df0 = graft.lang.Graft.query(s, dir, q)
      // the per-row shape tag is engine metadata, not result data
      val df = if (df0.columns.contains(graft.operators.Het.typeTag))
        df0.drop(graft.operators.Het.typeTag)
      else df0
      // an all-null error/bare-value carrier (e.g. assert's error leg when
      // every row passed) is engine plumbing too — a relational consumer
      // sees the uniform record stream, like the reference would emit
      if (df.columns.contains("this") && df.columns.length > 1 &&
          graft.sources.ZsonIO.isVariantType(df.schema("this").dataType) &&
          df.filter(org.apache.spark.sql.functions.col("this").isNotNull).isEmpty)
        df.drop("this")
      else df
    }

  private val mainOracle: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap

  private val langRegistry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    ("q_lang_q1", lang(
      """from lineitem
        || where l_shipdate <= 1998-09-02
        || summarize sum_qty:=sum(cast(l_quantity,"decimal(18,2)")),
        |    sum_base_price:=sum(cast(l_extendedprice,"decimal(18,2)")),
        |    sum_disc_price:=sum(cast(l_extendedprice,"decimal(18,2)")
        |                        * (cast(1,"decimal(18,2)") - cast(l_discount,"decimal(18,2)"))),
        |    avg_qty:=avg(l_quantity), count_order:=count()
        |  by l_returnflag, l_linestatus
        || put sum_qty:=cast(sum_qty,"float64"), sum_base_price:=cast(sum_base_price,"float64"),
        |      sum_disc_price:=cast(sum_disc_price,"float64"), avg_qty:=round(avg_qty,4)
        || sort l_returnflag, l_linestatus""".stripMargin),
      Some(mainOracle("q1_agg"))),

    ("q_lang_where", lang(
      """from lineitem | where l_returnflag=="R" and l_quantity==30.0
        || cut l_orderkey, l_linenumber, l_quantity | sort l_orderkey, l_linenumber""".stripMargin),
      Some(mainOracle("q_where"))),

    ("q_lang_cut", lang(
      "from lineitem | cut l_orderkey, l_linenumber, l_shipdate | sort l_orderkey, l_linenumber"),
      Some(mainOracle("q_cut"))),

    ("q_lang_put", lang(
      """from lineitem
        || put revenue:=cast(cast(l_extendedprice,"decimal(18,2)")
        |       * (cast(1,"decimal(18,2)") - cast(l_discount,"decimal(18,2)")),"float64")
        || cut l_orderkey, l_linenumber, revenue | sort l_orderkey, l_linenumber""".stripMargin),
      Some(mainOracle("q_put"))),

    ("q_lang_drop", lang(
      "from part | drop p_name, p_brand, p_type | sort p_partkey"),
      Some(mainOracle("q_drop"))),

    ("q_lang_rename", lang(
      "from nation | rename name:=n_name | sort n_nationkey"),
      Some(mainOracle("q_rename"))),

    ("q_lang_sort", lang(
      "from orders | cut o_orderkey, o_totalprice | sort o_totalprice desc, o_orderkey"),
      Some(mainOracle("q_sort"))),

    ("q_lang_head", lang(
      "from orders | cut o_orderkey, o_totalprice | sort o_orderkey | head 10"),
      Some(mainOracle("q_head"))),

    ("q_lang_tail", lang(
      "from orders | cut o_orderkey, o_totalprice | tail 10"),
      Some(mainOracle("q_tail"))),

    ("q_lang_top", lang(
      "from orders | cut o_orderkey, o_totalprice | top 5 o_totalprice, o_orderkey"),
      Some(mainOracle("q_top"))),

    ("q_lang_uniq", lang(
      "from lineitem | cut l_returnflag, l_linestatus | sort l_returnflag, l_linestatus | uniq"),
      Some(mainOracle("q_uniq"))),

    ("q_lang_uniq_count", lang(
      "from lineitem | cut l_returnflag, l_linestatus | sort l_returnflag, l_linestatus | uniq -c"),
      Some(mainOracle("q_uniq_count"))),

    // a lone unnamed aggregate is a bare value in zed (`count()` → 3, not
    // {count:3}) — carried as `this`
    ("q_lang_count", lang("from lineitem | count()"),
      Some("SELECT count(*) AS this FROM lineitem")),

    ("q_lang_count_by", lang(
      "from events | count() by event_type | sort event_type"),
      Some(mainOracle("q_count_by"))),

    ("q_lang_agg_stats", lang(
      """from events
        || summarize sum_value:=sum(value), avg_value:=avg(value),
        |    min_value:=min(value), max_value:=max(value) by event_type
        || put sum_value:=round(sum_value,2), avg_value:=round(avg_value,4)
        || sort event_type""".stripMargin),
      Some(mainOracle("q_agg_stats"))),

    ("q_lang_every", lang(
      """from events | summarize count:=count(), sum_value:=sum(value) by bucket:=every(1h)
        || put sum_value:=round(sum_value,2) | sort bucket""".stripMargin),
      Some(mainOracle("q_every"))),

    ("q_lang_count_distinct", lang(
      "from events | summarize dusers:=count_distinct(user_id) by event_type | sort event_type"),
      Some(mainOracle("q_count_distinct"))),

    // agg `where` clause (summarize.md: per-aggregate input filter)
    ("q_lang_agg_where", lang(
      """from events | summarize n_hi:=count() where value > 50.0, n:=count() by event_type
        || sort event_type""".stripMargin),
      Some("""SELECT event_type,
             |  count(*) FILTER (WHERE "value" > 50.0) AS n_hi,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    ("q_lang_join_inner", lang(
      """from orders | inner join (from customer) on o_custkey=c_custkey c_name, c_mktsegment
        || cut o_orderkey, c_name, c_mktsegment | sort o_orderkey""".stripMargin),
      Some(mainOracle("q_join_inner"))),

    ("q_lang_join_left", lang(
      """from customer | left join (from orders) on c_custkey=o_custkey o_orderkey
        || summarize n_orders:=count(o_orderkey) by c_custkey | sort c_custkey""".stripMargin),
      Some(mainOracle("q_join_left"))),

    ("q_lang_join_anti", lang(
      """from customer | cut c_custkey
        || anti join (from orders | where o_orderstatus=="P") on c_custkey=o_custkey
        || sort c_custkey""".stripMargin),
      Some(mainOracle("q_join_anti"))),

    // single-pass switch: projection-shaped branches compile to CASE chains
    ("q_lang_switch", lang(
      """from events
        || switch (
        |    case event_type=="purchase" => cut event_id, branch:="p"
        |    case event_type=="error" => cut event_id, branch:="e"
        |    default => cut event_id, branch:="other"
        |  )
        || sort event_id""".stripMargin),
      Some(mainOracle("q_switch"))),

    ("q_lang_merge", lang(
      """from orders
        || fork (
        |    => where o_orderstatus=="F" | cut o_orderkey, o_orderstatus
        |    => where o_orderstatus=="O" | cut o_orderkey, o_orderstatus
        |  )
        || merge o_orderkey""".stripMargin),
      Some(mainOracle("q_merge"))),

    ("q_lang_fuse", lang(
      """from orders
        || fork (
        |    => cut id:=o_orderkey, amount:=o_totalprice
        |    => from customer | cut id:=c_custkey, name:=c_name
        |  )
        || fuse | sort id, amount, name""".stripMargin),
      Some(mainOracle("q_fuse"))),

    ("q_lang_over", lang(
      """from embeddings | over embedding with vec_id => ( yield {vec_id, elem:this} )
        || sort vec_id, elem""".stripMargin),
      Some(mainOracle("q_over"))),

    // yield with record constructor + plan-time typeof (function/types.go)
    ("q_lang_yield", lang(
      """from events | yield {event_id, double_val:value*2.0, vtype:typeof(value)}
        || sort event_id""".stripMargin),
      Some("""SELECT event_id, "value"*2.0 AS double_val, 'float64' AS vtype
             |FROM events ORDER BY event_id""".stripMargin)),

    // assert passes satisfying rows UNTOUCHED (failing rows would become
    // error values — none here, so the oracle is the plain projection)
    ("q_lang_assert", lang(
      """from lineitem | cut l_orderkey, l_linenumber, l_quantity
        || assert l_quantity > 0 | sort l_orderkey, l_linenumber""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    ("q_lang_grep", lang(
      """from documents | where grep("fast", text, source) | cut doc_id, source | sort doc_id""".stripMargin),
      Some(mainOracle("q_fn_grep"))),

    ("q_lang_agg_bool", lang(
      """from events
        || summarize all_pos:=and(value > 0.0), any_hi:=or(value > 90.0) by event_type
        || sort event_type""".stripMargin),
      Some("""SELECT event_type, bool_and("value" > 0.0) AS all_pos,
             |  bool_or("value" > 90.0) AS any_hi
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    ("q_lang_any", lang(
      "from nation | summarize rk:=any(n_regionkey) by n_nationkey | sort n_nationkey"),
      Some("""SELECT n_nationkey, n_regionkey AS rk FROM nation
             |ORDER BY n_nationkey""".stripMargin)),

    // explode by type with schema-driven leaf discovery (explode.go)
    ("q_lang_explode", lang(
      "from orders | explode this by string as v | sort v"),
      Some(mainOracle("q_explode"))),

    // keyword search sugar (search-expressions.md): bare string → grep
    ("q_lang_search", lang(
      """from documents | search "fast" | cut doc_id | sort doc_id""".stripMargin),
      Some("""SELECT doc_id FROM documents
             |WHERE text LIKE '%fast%' OR lang LIKE '%fast%' OR source LIKE '%fast%'
             |ORDER BY doc_id""".stripMargin)),

    // nested in-place rename (renamer.go dotted form), flattened for the oracle
    ("q_lang_rename_nested", lang(
      """from customer | put info:={name:c_name, seg:c_mktsegment}
        || rename info.label:=info.name
        || yield {c_custkey, label: info.label, seg: info.seg} | sort c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_name AS label, c_mktsegment AS seg
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // slices (expressions.md: 0-based, end-exclusive, negative from end)
    ("q_lang_slice", lang(
      """from embeddings
        || yield {vec_id, head3: len(embedding[0:3]), tail4: len(embedding[-4:]),
        |        mid: round(float64(embedding[2:3][0]), 4)}
        || sort vec_id""".stripMargin),
      Some("""SELECT vec_id, 3 AS head3, 4 AS tail4,
             |  round(CAST(embedding[3] AS DOUBLE), 4) AS mid
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // const + func + f-string through the oracle gate (statements.md);
    // money math in the exact decimal domain (r1 q_put lesson)
    ("q_lang_statements", lang(
      """const LIM = 10
        |func margin(p, d): (cast(p,"decimal(18,2)") * (cast(1,"decimal(18,2)") - cast(d,"decimal(18,2)")))
        |from lineitem | where l_quantity <= LIM
        || yield {l_orderkey, l_linenumber, m: cast(margin(l_extendedprice, l_discount), "float64"),
        |         tag: f"q{int64(l_quantity)}"}
        || sort l_orderkey, l_linenumber""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             |       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS m,
             |  'q' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS tag
             |FROM lineitem WHERE l_quantity <= 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // scalar-function expressions through the language
    ("q_lang_fn", lang(
      """from customer
        || put lo:=lower(c_name), rlen:=rune_len(c_name),
        |      repl:=replace(c_name,"Customer","Cust"),
        |      seg3:=upper(c_mktsegment), bal2:=round(c_acctbal*2.0,2)
        || cut c_custkey, lo, rlen, repl, seg3, bal2 | sort c_custkey""".stripMargin),
      Some("""SELECT c_custkey, lower(c_name) AS lo, length(c_name) AS rlen,
             |  replace(c_name,'Customer','Cust') AS repl,
             |  upper(c_mktsegment) AS seg3, round(c_acctbal*2.0,2) AS bal2
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )

  /** DuckDB twin of TextOps.langId, GENERATED from the same profile
    * tables so the two can't drift: normalize → whitespace tokens →
    * per-language stopword hits → argmax in profile order, with the CJK
    * short-circuit and the no-hits "und" fallback.
    */
  private def langIdOracleSql: String = {
    val profs = graft.pipeline.TextOps.profiles
    val scoreCols = profs.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS s_$lang"
    }.mkString(",\n    ")
    val best = s"greatest(${profs.map(p => "s_" + p._1).mkString(", ")})"
    val caseChain = profs.map { case (lang, _) =>
      s"WHEN s_$lang = best THEN '$lang'"
    }.mkString("\n       ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
       |    len(regexp_extract_all(text, '\\p{Han}')) AS cjk
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, lang, cjk, len(toks) AS ntok,
       |    $scoreCols
       |  FROM t
       |), b AS (SELECT *, $best AS best FROM s)
       |SELECT doc_id, lang,
       |  CASE WHEN cjk > 0 AND cjk >= ntok THEN 'zh'
       |       WHEN best <= 0 THEN 'und'
       |       $caseChain
       |  END AS lang_pred
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of DedupOps.simhash/simhashPairs: the md5-based 60-bit
    * per-token hash is identical across engines, so the oracle rebuilds
    * the full signature (per-bit majority), the 16-bit band candidates,
    * and the Hamming filter — exact pair-for-pair comparison.
    */
  /** DuckDB twin of TextOps.winnowFingerprints with the md5 token hash:
    * same tokenizer as the simhash oracle, per-window minima over w=5,
    * dedup + sort, joined to one string for the hash compare.
    */
  private def winnowOracleSql: String =
    raw"""WITH tok AS (
       |  SELECT doc_id, t, ord FROM (
       |    SELECT doc_id,
       |      unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t,
       |      generate_subscripts(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '), 1) AS ord
       |    FROM documents)
       |), h AS (
       |  SELECT doc_id, ord, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
       |), hl AS (
       |  SELECT doc_id, list(h ORDER BY ord) AS hs FROM h GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) >= 5 THEN
       |      list_sort(list_distinct(list_transform(range(1, len(hs) - 3), i -> list_min(hs[i:i+4]))))
       |    WHEN len(hs) > 0 THEN [list_min(hs)]
       |    ELSE [] END AS fps
       |  FROM hl
       |)
       |SELECT doc_id, array_to_string(fps, ',') AS fps FROM fp ORDER BY doc_id""".stripMargin

  /** DuckDB twin of VectorOps.cosineNearDupPairs over the planted-copy
    * corpus: the seed-42 hyperplanes inlined, sign-bit buckets, 1-bit
    * multi-probe on the query side, bucket equi-join, cosine >= 0.9.
    */
  private def cosineNearDupOracleSql: String = {
    val planes = graft.pipeline.VectorOps.hyperplanes(64, 4, 42L)
    def planeArr(p: Array[Double]): String =
      p.map(_.toString).mkString("[", ", ", "]")
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(e::DOUBLE[], ${planeArr(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding AS e FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(embedding, x -> x * 2.0::FLOAT)
       |  FROM embeddings WHERE vec_id < 20
       |), b AS (
       |  SELECT vec_id, e, $bucketExpr AS b0 FROM corpus
       |), probes AS (
       |  SELECT vec_id AS d1, e AS e1,
       |    unnest([b0, xor(b0, 1), xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket
       |  FROM b
       |), cand AS (
       |  SELECT DISTINCT p.d1, b.vec_id AS d2, p.e1, b.e AS e2
       |  FROM probes p JOIN b ON p.bucket = b.b0 AND p.d1 < b.vec_id
       |)
       |SELECT d1, d2, round(list_cosine_similarity(e1::DOUBLE[], e2::DOUBLE[]), 4) AS cos4
       |FROM cand WHERE list_cosine_similarity(e1::DOUBLE[], e2::DOUBLE[]) >= 0.9
       |ORDER BY d1, d2""".stripMargin
  }

  private def simhashOracleSql: String = {
    val bits = graft.pipeline.DedupOps.SimhashBits
    val bitSums = (0 until bits).map(i =>
      s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n    ")
    val sig = (0 until bits).map(i =>
      s"(CASE WHEN b$i > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
       |), bs AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $sig AS simhash FROM bs
       |), banded AS (
       |  SELECT doc_id, simhash, c AS chunk, (simhash >> (c*16)) & 65535 AS ch
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS c)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS s1, b.simhash AS s2
       |  FROM banded a JOIN banded b ON a.chunk = b.chunk AND a.ch = b.ch AND a.doc_id < b.doc_id
       |)
       |SELECT d1, d2, bit_count(xor(s1, s2)) AS hamming FROM cand
       |WHERE bit_count(xor(s1, s2)) <= 8 ORDER BY d1, d2""".stripMargin
  }

  /** DuckDB twin of VectorOps.knnLsh: the seed-42 hyperplanes are
    * INLINED as literals (Double.toString round-trips exactly), then the
    * same sign-bit buckets, 1-bit-flip multi-probe, bucket equi-join,
    * and per-query cosine top-k run in SQL.
    */
  private def knnLshOracleSql: String = {
    val planes = graft.pipeline.VectorOps.hyperplanes(64, 4, 42L)
    def planeArr(p: Array[Double]): String =
      p.map(_.toString).mkString("[", ", ", "]")
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(e::DOUBLE[], ${planeArr(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH c AS (
       |  SELECT vec_id AS nid, embedding,
       |         ($bucketExpr) AS bucket
       |  FROM (SELECT vec_id, embedding, embedding AS e FROM embeddings)
       |), q0 AS (
       |  SELECT vec_id AS qid, embedding AS qe,
       |         ($bucketExpr) AS b0
       |  FROM (SELECT vec_id, embedding, embedding AS e FROM embeddings WHERE vec_id < 5)
       |), q AS (
       |  SELECT qid, qe, unnest([b0, xor(b0, 1), xor(b0, 2), xor(b0, 4), xor(b0, 8)]) AS bucket
       |  FROM q0
       |), scored AS (
       |  SELECT qid, nid, list_cosine_similarity(qe, c.embedding) AS cos
       |  FROM q JOIN c USING (bucket) WHERE nid <> qid
       |)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) t WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  /** SQL twin of VectorOps.knnIvf: the k-means training itself runs in
    * SQL — portable md5 init hash, three unrolled Lloyd iterations, and
    * float32 rounding of centroids/scores at every step so the two
    * engines' different summation orders collapse to identical bits
    * (verified row-identical vs Spark at sf0.01).
    */
  private def knnIvfOracleSql: String = {
    def iteration(k: Int): String = s"""
      |a$k AS (
      |  SELECT vec_id, e, cid FROM (
      |    SELECT v.vec_id, v.e, c.cid,
      |           row_number() OVER (PARTITION BY v.vec_id
      |             ORDER BY CAST(list_dot_product(v.e, c.cent) AS REAL) DESC, c.cid) AS rn
      |    FROM corpus v CROSS JOIN c$k c) WHERE rn = 1
      |),
      |l$k AS (
      |  SELECT cid, list(m ORDER BY pos) AS mean FROM (
      |    SELECT cid, pos, avg(val) AS m FROM (
      |      SELECT cid, unnest(e) AS val, generate_subscripts(e,1) AS pos FROM a$k)
      |    GROUP BY cid, pos)
      |  GROUP BY cid
      |),
      |c${k + 1} AS (
      |  SELECT c$k.cid,
      |         CASE WHEN l$k.mean IS NULL THEN c$k.cent
      |              ELSE list_transform(l$k.mean,
      |                x -> CAST(CAST(x / sqrt(list_dot_product(l$k.mean, l$k.mean)) AS REAL) AS DOUBLE)) END AS cent
      |  FROM c$k LEFT JOIN l$k ON c$k.cid = l$k.cid
      |)""".stripMargin
    s"""WITH corpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
       |),
       |init AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, e FROM (
       |    SELECT vec_id, e,
       |           ('0x'||substr(md5(CAST(vec_id AS VARCHAR)||':42'),1,8))::BIGINT AS h
       |    FROM corpus)
       |  QUALIFY row_number() OVER (ORDER BY h, vec_id) <= 16
       |),
       |c0 AS (
       |  SELECT cid, list_transform(e,
       |    x -> CAST(CAST(x / sqrt(list_dot_product(e, e)) AS REAL) AS DOUBLE)) AS cent
       |  FROM init
       |),${iteration(0)},${iteration(1)},${iteration(2)},
       |assign AS (
       |  SELECT vec_id AS nid, e AS ne, cid AS list FROM (
       |    SELECT v.vec_id, v.e, c.cid,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY CAST(list_dot_product(v.e, c.cent) AS REAL) DESC, c.cid) AS rn
       |    FROM corpus v CROSS JOIN c3 c) WHERE rn = 1
       |),
       |qd AS (
       |  SELECT q.vec_id AS qid, q.e AS qe, c.cid,
       |         CAST(list_dot_product(q.e, c.cent) AS REAL) AS d
       |  FROM corpus q CROSS JOIN c3 c WHERE q.vec_id < 5
       |),
       |probes AS (
       |  SELECT DISTINCT qid, qe, cid AS list FROM (
       |    SELECT qid, qe, cid, d,
       |           row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn,
       |           min(cid) OVER (PARTITION BY qid, d) AS mcid
       |    FROM qd) WHERE rn <= 4 AND cid = mcid
       |),
       |scored AS (
       |  SELECT p.qid, a.nid,
       |         CAST(list_cosine_similarity(p.qe, a.ne) AS REAL) AS cos
       |  FROM probes p JOIN assign a USING (list)
       |  WHERE a.nid <> p.qid
       |)
       |SELECT qid, nid, rank FROM (
       |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) t WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (registry ++ langRegistry).map { case (n, fn, _) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (registry ++ langRegistry).collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
