package graft

import graft.ingest.Merger
import graft.model.GraftStore
import graft.ops.{Admin, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the admin/maintenance surface (SURVEY.md §2.6
  * `_track`, §2.7 purge, VirtualInfoton `/proc`) — the last operators
  * whose coverage was ScalaTest-only. Each runs the real maintenance
  * code path and projects the relational post-state for the DuckDB
  * oracle. */
object AdminQueries {

  private def st(s: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(s, dir)

  private val T0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** purge-all / purge-history over a TOMBSTONED store: every suppkey
    * % 7 == 0 supplier takes a delete_path (2 versions: original +
    * tombstone), then /supplier/14 is purged entirely (nothing
    * remains, not even the tombstone — the purge-all contract) and
    * /supplier/21, /supplier/35 purge their history (only the current
    * tombstone survives). Per-path version/tombstone counts read back
    * with-history + with-deleted. */
  private def purge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = st(s, dir)
    val cmds = store.current
      .where(col("system.path").startsWith("/supplier/"))
      .select(col("system.path"), Search.fieldN("suppkey"))
      .as[(String, Double)]
      .filter(_._2.toLong % 7 == 0)
      .map { case (p, _) =>
        Merger.Command("delete_path", p, T0, Map.empty, Map.empty)
      }
    // merge against the /supplier subtree only — the purge surface and
    // the read-back never leave it, and cogrouping the other tables
    // (plus re-deriving their current flags) is avoidable work at
    // every scale (same scoping as q_stp's sensor subtree)
    val tombstoned = Merger.merge(s,
      Merger.subtree(store.infotons, "/supplier"), cmds)
    val purged = Admin.purgeHistory(
      Admin.purgeHistory(
        Admin.purgePath(tombstoned, "/supplier/14"),
        "/supplier/21"),
      "/supplier/35")
    val st2 = GraftStore.fromInfotons(s, purged, Some(store.fieldTypes))
    Search.run(st2, Search.Request(path = "/supplier",
        withHistory = true, withDeleted = true))
      .groupBy(regexp_extract(col("system.path"), "^/supplier/(\\d+)$", 1)
        .cast("long").as("suppkey"))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("system.kind") === "DeletedInfoton", 1L)
          .otherwise(0L)).as("n_tombstones"))
      .orderBy("suppkey")
  }

  /** `_track` (per-ingest-batch outcome report): one merge batch
    * carries acctbal updates for every custkey % 50 == 0 and
    * delete_path for every custkey % 70 == 3 (disjoint sets — no
    * solution to both congruences); the report diffs store uuids
    * before/after and counts written versions and tombstones per
    * parent. */
  private def track(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = st(s, dir)
    val cmds = store.current
      .where(col("system.path").startsWith("/customer/"))
      .select(col("system.path"), Search.fieldN("custkey"),
        Search.fieldN("acctbal"))
      .as[(String, Double, Double)]
      .flatMap { case (p, ckD, bal) =>
        val ck = ckD.toLong
        if (ck % 50 == 0) {
          val nv = bal + 1
          Seq(Merger.Command("update", p, T0,
            Map("acctbal" -> Seq(Merger.FieldValue(nv.toString, Some(nv),
              None, None, graft.model.InfotonModel.TDouble, None, None))),
            Map("acctbal" -> Seq.empty)))
        } else if (ck % 70 == 3)
          Seq(Merger.Command("delete_path", p, T0, Map.empty, Map.empty))
        else Nil
      }
    // the batch touches /customer only — scope the merge (and the
    // before-side of the uuid diff) to that subtree
    val scoped = Merger.subtree(store.infotons, "/customer")
    val after = Merger.merge(s, scoped, cmds)
    Admin.trackingReport(scoped, after)
      .select(col("parent"), col("written"),
        col("tombstones").as("n_tombstones"))
      .orderBy("parent")
  }

  /** VirtualInfoton `/proc` — read-time synthesized per-directory
    * stats; projected to the five dirs with SQL-stable counts
    * (version count = raw row count; current count = one per path). */
  private def proc(s: SparkSession, dir: String): DataFrame = {
    val dirs = Seq("/customer", "/supplier", "/orders", "/user",
      "/documents").map(d => s"/proc/dir$d")
    Admin.proc(st(s, dir))
      .select(col("system.path").as("path"),
        element_at(col("fields")("versions"), 1).getField("n")
          .cast("long").as("versions"),
        element_at(col("fields")("currentCount"), 1).getField("n")
          .cast("long").as("cur"))
      .where(col("path").isin(dirs: _*))
      .orderBy("path")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_purge" -> purge,
    "q_track" -> track,
    "q_proc" -> proc)

  val oracles: Map[String, String] = Map(
    "q_purge" ->
      """SELECT s_suppkey AS suppkey,
        |  CAST(CASE WHEN s_suppkey IN (21, 35) THEN 1
        |            WHEN s_suppkey % 7 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_versions,
        |  CAST(CASE WHEN s_suppkey % 7 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_tombstones
        |FROM supplier WHERE s_suppkey <> 14
        |ORDER BY suppkey""".stripMargin,
    "q_track" ->
      """SELECT '/customer' AS parent,
        |  CAST((SELECT count(*) FROM customer WHERE c_custkey % 50 = 0) +
        |       (SELECT count(*) FROM customer WHERE c_custkey % 70 = 3)
        |    AS BIGINT) AS written,
        |  CAST((SELECT count(*) FROM customer WHERE c_custkey % 70 = 3)
        |    AS BIGINT) AS n_tombstones""".stripMargin,
    "q_proc" ->
      """SELECT path, CAST(versions AS BIGINT) AS versions,
        |  CAST(cur AS BIGINT) AS cur FROM (
        |  SELECT '/proc/dir/customer' AS path,
        |    (SELECT count(*) FROM customer) AS versions,
        |    (SELECT count(*) FROM customer) AS cur
        |  UNION ALL SELECT '/proc/dir/documents',
        |    (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents)
        |  UNION ALL SELECT '/proc/dir/orders',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders)
        |  UNION ALL SELECT '/proc/dir/supplier',
        |    (SELECT count(*) FROM supplier),
        |    (SELECT count(*) FROM supplier)
        |  UNION ALL SELECT '/proc/dir/user',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(DISTINCT user_id) FROM events))
        |ORDER BY path""".stripMargin)
}
