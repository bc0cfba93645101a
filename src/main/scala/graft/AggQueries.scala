package graft

import graft.model.GraftStore
import graft.ops.{Aggregations, Search}
import graft.qp.ApParser
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the aggregation family (SURVEY.md §2.4), each
  * driven through the `ap=` parser exactly as the HTTP API would. */
object AggQueries {

  private def st(s: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(s, dir)

  private def run(s: SparkSession, dir: String, path: String, ap: String,
                  qp: Option[String] = None): DataFrame = {
    val store = st(s, dir)
    val base = Search.run(store, Search.Request(path = path, qp = qp))
    Aggregations.run(store, base, ApParser.parse(ap).head)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // type:term — top-K by doc count, ES tie-break (count desc, key asc)
    "q_agg_term" -> ((s, dir) =>
      run(s, dir, "/orders", "type:term,field::orderpriority,size:3")),

    // type:stats — count/min/max/sum/avg on a numeric field
    "q_agg_stats" -> ((s, dir) =>
      run(s, dir, "/lineitem", "type:stats,field::quantity")),

    // type:stats under a qp filter (aggregate over a search result)
    "q_agg_stats_filtered" -> ((s, dir) =>
      run(s, dir, "/lineitem", "type:stats,field::extendedprice",
        qp = Some("returnflag::R,quantity>25"))),

    // type:stats over a DATE field — ES date-stats semantics (epoch
    // millis); the sum accumulates in decimal(30,2) because ~1.4e12
    // per row overflows an 18-digit sum around 10k rows
    "q_agg_stats_date" -> ((s, dir) =>
      run(s, dir, "/orders", "type:stats,field::orderdate")),

    // type:hist — fixed-interval histogram
    "q_agg_hist" -> ((s, dir) =>
      run(s, dir, "/orders", "type:hist,field::totalprice,interval:50000")),

    // type:hist with extended bounds: the bucket spine is forced to
    // [extMin, extMax] and empty buckets surface (minDocCount:0 — the
    // ES extended_bounds pairing)
    "q_agg_hist_ext" -> ((s, dir) =>
      run(s, dir, "/customer",
        "type:hist,field::acctbal,interval:2000,minDocCount:0," +
          "extMin:-4000,extMax:12000")),

    // type:card — exact distinct count
    "q_agg_card" -> ((s, dir) =>
      run(s, dir, "/orders", "type:card,field::custkey")),

    // nested: term buckets with per-bucket stats sub-aggregation
    "q_agg_nested" -> ((s, dir) =>
      run(s, dir, "/orders",
        "type:term,field::orderstatus,size:3<type:stats,field::totalprice>")
        .orderBy(col("doc_count").desc, col("key").asc)),

    // nested, depth 2: term buckets -> term sub-buckets -> stats leaf
    // (arbitrary strict nesting, FTSService.scala:1008-1036)
    "q_agg_nested_deep" -> ((s, dir) =>
      run(s, dir, "/orders",
        "type:term,field::orderstatus,size:3" +
          "<type:term,field::orderpriority,name:pri,size:10" +
          "<type:stats,field::totalprice>>")
        .orderBy(col("key").asc, col("pri_key").asc)),

    // nested: term buckets with a cardinality sub-aggregation
    "q_agg_nested_card" -> ((s, dir) =>
      run(s, dir, "/orders",
        "type:term,field::orderstatus,size:3<type:card,field::custkey>")
        .orderBy(col("doc_count").desc, col("key").asc)),

    // nested: sig-terms under term buckets (FTSService.scala:1008-1036
    // allows any nesting): fg = the bucket's orders, bg = all orders
    "q_agg_nested_sig" -> ((s, dir) =>
      run(s, dir, "/orders",
        "type:term,field::orderstatus,size:3" +
          "<type:sig,field::orderpriority,name:sig,size:3>")
        .orderBy(col("key").asc, col("sig_key").asc)),

    // type:sig — significant event types among high-value versions
    // vs all versions (JLH-style score)
    "q_agg_sig" -> ((s, dir) => {
      val store = st(s, dir)
      val fg = Search.run(store, Search.Request(path = "/user",
        withHistory = true, qp = Some("value>150")))
      val bg = Search.run(store, Search.Request(path = "/user",
        withHistory = true))
      Aggregations.sigTerms(store, fg, bg,
        Aggregations.SigTermsAgg("sig", "event_type", size = 5))
    }),

    // sig-terms with backgroundTerm (`backgroundTerm:event_type*click`,
    // Parsers.scala:207): props significant among high-value events vs
    // a background of ONLY click events (spanning versions — ES
    // background_filter indexes every version as a doc)
    "q_agg_sig_bg" -> ((s, dir) => {
      val store = st(s, dir)
      val fg = Search.run(store, Search.Request(path = "/user",
        withHistory = true, qp = Some("value>150")))
      Aggregations.run(store, fg,
        Aggregations.SigTermsAgg("sig", "props", size = 5,
          backgroundTerm = Some(("event_type", "click"))))
    }))

  val oracles: Map[String, String] = Map(
    "q_agg_term" ->
      """SELECT o_orderpriority AS key, count(*) AS doc_count FROM orders
        |GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 3""".stripMargin,
    "q_agg_stats" ->
      """SELECT count(l_quantity) AS "count", min(l_quantity) AS "min",
        |max(l_quantity) AS "max",
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS "sum",
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS "avg"
        |FROM lineitem""".stripMargin,
    "q_agg_stats_date" ->
      """SELECT count(o_orderdate) AS "count",
        |min(epoch_ms(o_orderdate)) AS "min",
        |max(epoch_ms(o_orderdate)) AS "max",
        |CAST(sum(CAST(epoch_ms(o_orderdate) AS DECIMAL(30,2))) AS DOUBLE) AS "sum",
        |CAST(sum(CAST(epoch_ms(o_orderdate) AS DECIMAL(30,2))) AS DOUBLE)
        |  / count(o_orderdate) AS "avg"
        |FROM orders""".stripMargin,
    "q_agg_stats_filtered" ->
      """SELECT count(l_extendedprice) AS "count", min(l_extendedprice) AS "min",
        |max(l_extendedprice) AS "max",
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS "sum",
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS "avg"
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25""".stripMargin,
    "q_agg_hist" ->
      """SELECT floor(o_totalprice / 50000) * 50000 AS bucket,
        |count(*) AS doc_count FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_hist_ext" ->
      """WITH counts AS (SELECT floor(c_acctbal / 2000) * 2000 AS bucket,
        |  count(*) AS doc_count FROM customer GROUP BY 1),
        |spine AS (SELECT CAST(-4000 + 2000 * i AS DOUBLE) AS b
        |  FROM UNNEST(generate_series(0, 8)) AS t(i))
        |SELECT COALESCE(s.b, c.bucket) AS bucket,
        |  COALESCE(c.doc_count, 0) AS doc_count
        |FROM spine s FULL OUTER JOIN counts c ON s.b = c.bucket
        |ORDER BY bucket""".stripMargin,
    "q_agg_card" ->
      "SELECT count(DISTINCT o_custkey) AS card FROM orders",
    "q_agg_nested" ->
      """SELECT o_orderstatus AS key, count(*) AS doc_count,
        |count(o_totalprice) AS totalprice_count, min(o_totalprice) AS totalprice_min,
        |max(o_totalprice) AS totalprice_max,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS totalprice_sum
        |FROM orders GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 3""".stripMargin,
    "q_agg_nested_deep" ->
      """WITH top AS (SELECT o_orderstatus AS key, count(*) AS doc_count
        |  FROM orders GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 3)
        |SELECT t.key, t.doc_count, o.o_orderpriority AS pri_key,
        |  count(*) AS pri_count,
        |  count(o_totalprice) AS totalprice_count,
        |  min(o_totalprice) AS totalprice_min,
        |  max(o_totalprice) AS totalprice_max,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totalprice_sum
        |FROM orders o JOIN top t ON o.o_orderstatus = t.key
        |GROUP BY 1, 2, 3 ORDER BY key ASC, pri_key ASC""".stripMargin,
    "q_agg_nested_card" ->
      """SELECT o_orderstatus AS key, count(*) AS doc_count,
        |count(DISTINCT o_custkey) AS custkey_card
        |FROM orders GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 3""".stripMargin,
    "q_agg_nested_sig" ->
      """WITH top AS (SELECT o_orderstatus AS key, count(*) AS doc_count
        |  FROM orders GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 3),
        |fg AS (SELECT o_orderstatus AS key, o_orderpriority AS sig_key,
        |  count(*) AS sig_fg FROM orders GROUP BY 1, 2),
        |fgt AS (SELECT key, sum(sig_fg) AS fg_total FROM fg GROUP BY 1),
        |bg AS (SELECT o_orderpriority AS sig_key, count(*) AS sig_bg
        |  FROM orders GROUP BY 1),
        |bgt AS (SELECT sum(sig_bg) AS bg_total FROM bg),
        |s AS (SELECT fg.key, fg.sig_key, sig_fg, sig_bg,
        |  (((CAST(sig_fg AS DOUBLE) / fg_total) - (CAST(sig_bg AS DOUBLE) / bg_total))
        |   * (CAST(sig_fg AS DOUBLE) / fg_total)) / (CAST(sig_bg AS DOUBLE) / bg_total)
        |    AS sig_score
        |  FROM fg JOIN fgt USING(key) JOIN bg USING(sig_key) CROSS JOIN bgt
        |  WHERE sig_fg >= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY key
        |    ORDER BY sig_score DESC, sig_key ASC) AS rn
        |  FROM s WHERE sig_score > 0)
        |SELECT t.key, t.doc_count, r.sig_key, r.sig_fg, r.sig_bg, r.sig_score
        |FROM r JOIN top t USING(key) WHERE rn <= 3
        |ORDER BY key ASC, sig_key ASC""".stripMargin,
    "q_agg_sig_bg" ->
      """WITH fg AS (SELECT props AS key, count(*) AS fg_count FROM events
        |  WHERE "value" > 150 GROUP BY 1),
        |bg AS (SELECT props AS key, count(*) AS bg_count FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |j AS (SELECT fg.key, fg_count, bg_count,
        |  (SELECT sum(fg_count) FROM fg) AS fg_total,
        |  (SELECT sum(bg_count) FROM bg) AS bg_total
        |  FROM fg JOIN bg ON fg.key = bg.key)
        |SELECT key, fg_count, bg_count,
        |  (((CAST(fg_count AS DOUBLE) / fg_total) - (CAST(bg_count AS DOUBLE) / bg_total))
        |   * (CAST(fg_count AS DOUBLE) / fg_total)) / (CAST(bg_count AS DOUBLE) / bg_total) AS score
        |FROM j WHERE fg_count >= 1
        |AND (((CAST(fg_count AS DOUBLE) / fg_total) - (CAST(bg_count AS DOUBLE) / bg_total))
        |   * (CAST(fg_count AS DOUBLE) / fg_total)) / (CAST(bg_count AS DOUBLE) / bg_total) > 0
        |ORDER BY score DESC, key ASC LIMIT 5""".stripMargin,
    "q_agg_sig" ->
      """WITH fg AS (SELECT event_type AS key, count(*) AS fg_count FROM events
        |  WHERE "value" > 150 GROUP BY 1),
        |bg AS (SELECT event_type AS key, count(*) AS bg_count FROM events GROUP BY 1),
        |j AS (SELECT fg.key, fg_count, bg_count,
        |  (SELECT sum(fg_count) FROM fg) AS fg_total,
        |  (SELECT sum(bg_count) FROM bg) AS bg_total
        |  FROM fg JOIN bg ON fg.key = bg.key)
        |SELECT key, fg_count, bg_count,
        |  (((CAST(fg_count AS DOUBLE) / fg_total) - (CAST(bg_count AS DOUBLE) / bg_total))
        |   * (CAST(fg_count AS DOUBLE) / fg_total)) / (CAST(bg_count AS DOUBLE) / bg_total) AS score
        |FROM j WHERE fg_count >= 1
        |AND (((CAST(fg_count AS DOUBLE) / fg_total) - (CAST(bg_count AS DOUBLE) / bg_total))
        |   * (CAST(fg_count AS DOUBLE) / fg_total)) / (CAST(bg_count AS DOUBLE) / bg_total) > 0
        |ORDER BY score DESC, key ASC LIMIT 5""".stripMargin)
}
