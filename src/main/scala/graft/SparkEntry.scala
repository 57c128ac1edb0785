package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ZedOps

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
          "sum_qty" -> sum(dec(col("l_quantity"))).cast("double"),
          "sum_base_price" -> sum(dec(col("l_extendedprice"))).cast("double"),
          // product of two 2-decimal decimals is exact at 4 decimals — no
          // rounding anywhere, so no engine tie-breaking can diverge
          "sum_disc_price" -> sum(
            dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))
          ).cast("double"),
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
    ("q_every", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("bucket" -> ZedOps.timeBucketNs(col("ts"), "1h")),
          Seq("count" -> count(lit(1)),
              "sum_value" -> round(sum(col("value")), 2))),
        col("bucket") -> true),
      Some("""SELECT date_trunc('hour', ts) AS bucket, count(*) AS count,
             |  round(sum("value"), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // approx distinct (zed dcount = HLL; estimates differ per impl ⇒ rows-only)
    ("q_dcount", (s, dir) =>
      ZedOps.sort(
        ZedOps.summarize(t(s, dir, "events"),
          Seq("event_type" -> col("event_type")),
          Seq("dusers" -> approx_count_distinct(col("user_id")))),
        col("event_type") -> true),
      None),

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
          // exact decimal money math — see q1_agg note
          "revenue" -> (dec(col("l_extendedprice"))
            * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).cast("double"))
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
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))
  )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, fn, _) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
