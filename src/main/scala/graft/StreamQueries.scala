package graft

import graft.ingest.Merger
import graft.model.{GraftStore, InfotonModel}
import graft.ops.Search
import graft.streaming.{Stp, Streaming}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the STREAMING surfaces (SURVEY.md §2.6
  * qstream / subscribe / stp) — the operators whose ScalaTest coverage
  * the oracle gate couldn't see. Each runs the real streaming code
  * path (Structured Streaming micro-batches through a file source, or
  * the stp sensor/refresh loop) and lifts the relational POST-STATE to
  * a DuckDB-checkable result.
  */
object StreamQueries {

  private def st(s: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(s, dir)

  private val T0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** 2024-01-15T00:00Z in epoch micros — the qstream replay cut.
    * indexTime is timezone-free micros on both engines (the loader
    * reads the parquet NANOS value raw; DuckDB's epoch_us returns the
    * same raw micros), so the literal must be built from the naive
    * datetime, never through a local-zone java.sql.Timestamp. */
  private val QstreamCut: Long =
    java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  /** The streamed corpus: every /user event VERSION plus the /customer
    * tree as decoys — the path scope and qp of each rule/request must
    * do the filtering, so the source deliberately carries rows the
    * subscription should NOT match. */
  private def streamSource(store: GraftStore,
                           keepFields: Seq[String]): DataFrame =
    store.infotons.where(col("system.path").startsWith("/user/") ||
      col("system.path").startsWith("/customer/"))
      // ROW scope stays full (decoys included — the rules must do the
      // row filtering); the FIELDS map is projected to the keys the
      // request/rules reference, so the parquet hand-off write does
      // not materialize every field of every decoy (guide §2.3) —
      // missing keys null out exactly as they would post-transform
      .withColumn("fields", map_filter(col("fields"),
        (k, _) => k.isInCollection(keepFields)))

  /** Sink dirs of [[throughStream]] invocations. Each returned frame
    * reads its sink's parquet LAZILY, so the dir must outlive every
    * consumption of that frame — a fixed "reap on the next stream
    * query" policy would invalidate a result the caller still holds
    * (two concurrent stream results, or re-consuming an earlier one)
    * with a FileNotFoundException at action time. Deletion is instead
    * tied to the frame's REACHABILITY: a Cleaner reaps a sink only
    * once the result's ANALYZED PLAN OBJECT has been
    * garbage-collected, and a JVM shutdown hook sweeps whatever
    * survives. The plan node — not the DataFrame wrapper — is the
    * referent because every DERIVED frame (`result.orderBy(...)`,
    * `result.select(...)`) captures the parent's logical plan by
    * reference while the wrapper itself becomes garbage immediately;
    * keying on the wrapper deleted sinks mid-consumption (measured:
    * FAILED_READ_FILE on the very next orderBy). Disk held between
    * collections is bounded by the stream RESULTS still referenced
    * (post-aggregation rows, not the source corpus). */
  private val sinkCleaner = java.lang.ref.Cleaner.create()
  private val liveSinks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def reapOnUnreachable(frame: AnyRef, sinkDir: String): Unit = {
    liveSinks.add(sinkDir)
    sinkCleaner.register(frame, () => {
      liveSinks.remove(sinkDir)
      graft.model.GraftStore.rmTree(new java.io.File(sinkDir))
    })
  }
  sys.addShutdownHook {
    liveSinks.forEach(d => graft.model.GraftStore.rmTree(new java.io.File(d)))
    liveSinks.clear()
  }

  /** Cleaner reaping is GC-DRIVEN: in a long-lived session that
    * rarely collects, unreachable sinks can pile up on disk until
    * shutdown. This opportunistic drain (invoked at every
    * [[throughStream]] entry) bounds that: once the live sinks hold
    * more than `SinkDiskSoftLimit` bytes it requests a GC so the
    * Cleaner can run its registered actions — only sinks whose plan
    * objects are genuinely unreachable are freed, so frames the
    * caller still holds stay valid (a hard delete-past-threshold
    * would violate exactly the reachability contract the Cleaner
    * exists for). Bulk consumers that need DETERMINISTIC space reuse
    * call [[drainAllSinks]] at a point where no stream result is
    * still held. */
  private val SinkDiskSoftLimit: Long =
    sys.env.get("SPARK_GRAFT_STREAM_SINK_SOFT_LIMIT_BYTES")
      .map(_.toLong).getOrElse(2L * 1024 * 1024 * 1024)
  private def dirBytes(d: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum
    catch { case _: Exception => 0L } finally s.close()
  }
  private def drainIfOverSoftLimit(): Unit = {
    val held = liveSinks.toArray(Array.empty[String]).map(dirBytes).sum
    if (held > SinkDiskSoftLimit) {
      System.gc() // lets the Cleaner reap sinks whose plans are garbage
      Thread.sleep(50) // cleaner thread runs async; give it a beat
    }
  }

  /** EXPLICIT release hook: deterministically deletes EVERY stream
    * sink, reaped-or-not. Invalidates any stream result the caller
    * still holds (its lazy parquet read will fail at next action) —
    * for bulk consumers that process results eagerly and want disk
    * back NOW rather than at the next GC. Also the escape hatch for
    * the `result.rdd` hazard: extracting the RDD and dropping the
    * Dataset drops the analyzed-plan referent the Cleaner keys on, so
    * such callers must either keep the Dataset reachable while the
    * RDD is in use, or finish with the RDD before any drain/GC. */
  def drainAllSinks(): Unit = {
    liveSinks.forEach(d => graft.model.GraftStore.rmTree(new java.io.File(d)))
    liveSinks.clear()
  }

  /** Run `transform` of a micro-batched stream of `src`'s rows through
    * Structured Streaming (file source → parquet FILE sink), return
    * the sink read back as a distributed frame. The parquet hand-off
    * is the ONLY way to drive a real streaming plan from a batch frame
    * without a broker. The sink side is a file sink, NOT the memory
    * sink: memory-sink results collect into the driver JVM, which is
    * exactly the non-scale shape this library bans elsewhere — the
    * factor-1000 decade probe measured it fatally (q_stream_dedup at
    * 5M docs died on spark.driver.maxResultSize; the session stream
    * over 100M events exhausted the heap). With a file sink the
    * result stays on disk/executors at every scale and the driver
    * holds only the paths. */
  private def throughStream(s: SparkSession, src: DataFrame,
                            flushes: Seq[DataFrame] = Nil)
                           (transform: DataFrame => DataFrame): DataFrame = {
    drainIfOverSoftLimit()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_src_").toString
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_stream_sink_").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    try {
      src.write.mode("overwrite").parquet(dir)
      // SIZE THE STREAM'S STATE PARALLELISM TO THE STREAM, not to the
      // session: stateful operators (session windows, dedup state,
      // windowed counts) allocate one state-store instance per shuffle
      // partition, and every micro-batch pays a per-partition
      // plan/commit/checkpoint round even when a partition holds a few
      // KB — with the session's core-count partitioning a tiny replay
      // corpus spends more wall time on state-store protocol than on
      // rows (the same fixed-vs-scaled defect the ETL build sizing
      // fixed, GraftStore.etlCachedDir). Partition count derives from
      // the JUST-WRITTEN source bytes (~16 MB of source per state
      // partition, metadata-only walk), floored at 2 and capped at the
      // session setting, so the cap — the production value — returns
      // exactly at the volumes where per-partition state is real;
      // SPARK_GRAFT_STREAM_STATE_PARTS overrides for probes. State
      // partitioning is internal to the operator: results are
      // identical at any setting (pinned by the unchanged oracles).
      val sessionParts = s.conf.get("spark.sql.shuffle.partitions")
      // No-data micro-batches exist to advance watermarks/evict state
      // WITHOUT new input; this harness never relies on them — every
      // watermark advance that matters arrives as an explicit sentinel
      // flush batch (see `flushes` above). Each no-data batch still
      // pays a full protocol round (re-plan + offset/commit log +
      // per-partition state commit), so turn them off for the stream's
      // lifetime (save/restore like the partition sizing). Results are
      // pinned by the unchanged oracles.
      val noDataBefore =
        s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      // compute the sizing BEFORE touching any session conf: nothing
      // may throw between a conf.set and the try whose finally
      // restores it (a dirBytes failure here would otherwise leave
      // no-data batches disabled for every later query)
      val streamParts = sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTS")
        .flatMap(v => scala.util.Try(v.toInt).toOption)
        .getOrElse {
          val srcBytes = dirBytes(dir)
          math.max(2L, math.min(sessionParts.toLong,
            srcBytes / (16L * 1024 * 1024) + 1)).toInt
        }
      // restore scope covers EVERYTHING from the set — a transform or
      // start() that throws must not leave the session pinned at the
      // stream-sized partition count for every later batch query
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", streamParts.toString)
      val outSchema = try {
        val streamed = transform(s.readStream.schema(src.schema).parquet(dir))
        val outSchema0 = streamed.schema
        val q = streamed.writeStream.format("parquet")
          .option("path", sinkDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        // `flushes` arrive as LATER micro-batches (one file write + one
        // drain each). Watermarked append-mode operators only emit a
        // window/session once the watermark passes its close, and the
        // watermark used by batch N is computed from batches < N — so
        // closing ALL real windows deterministically needs TWO
        // far-future sentinel batches: the first advances the
        // watermark, the second triggers the batch that emits under it
        // (no reliance on no-data micro-batch scheduling).
        try {
          q.processAllAvailable()
          flushes.foreach { f =>
            f.write.mode("append").parquet(dir)
            q.processAllAvailable()
          }
        } finally q.stop()
        outSchema0
      } finally {
        // restore the session's partitioning for everything after the
        // stream (the stream itself pinned its state partitioning at
        // start from the sized value)
        s.conf.set("spark.sql.shuffle.partitions", sessionParts)
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          noDataBefore)
      }
      // explicit schema: a stream that emitted zero rows leaves a
      // sink with metadata but no data files — inference would throw
      val result = s.read.schema(outSchema).parquet(sinkDir)
      reapOnUnreachable(result.queryExecution.analyzed, sinkDir)
      result
    } finally {
      graft.model.GraftStore.rmTree(new java.io.File(dir))
      graft.model.GraftStore.rmTree(new java.io.File(ckpt))
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // op=qstream: the search request applied to a LIVE stream of
    // infoton versions — path scope + qp + indexTime offset (resume
    // from a cursor position, the streaming analog of consume's
    // token). The /customer decoys and pre-cut events must not pass.
    "q_qstream" -> ((s, dir) => {
      val store = st(s, dir)
      val out = throughStream(s,
          streamSource(store, Seq("event_type", "event_id"))) { stream =>
        Streaming.qstream(stream, store,
          Search.Request(path = "/user",
            qp = Some("event_type::purchase")),
          fromIndexTime = QstreamCut)
          .select(Search.fieldN("event_id").cast("long").as("event_id"))
      }
      out.orderBy("event_id")
    }),

    // op=subscribe: RTS rules compiled once, every arriving version
    // tagged with the subscribers whose (path, qp) rule it matches;
    // non-matching rows dropped. One row per (version, subscriber).
    "q_subscribe" -> ((s, dir) => {
      val store = st(s, dir)
      val out = throughStream(s,
          streamSource(store,
            Seq("event_type", "event_id", "acctbal"))) { stream =>
        Streaming.subscribe(stream, store, Seq(
            Streaming.Rule("purchase-watch", "/user",
              Some("event_type::purchase")),
            Streaming.Rule("error-watch", "/user",
              Some("event_type::error")),
            Streaming.Rule("bal-watch", "/customer",
              Some("acctbal>9000"))))
          .select(col("system.path").as("path"),
            Search.fieldN("event_id").cast("long").as("event_id"),
            explode(col("subscribers")).as("subscriber"))
      }
      out.select("path", "subscriber", "event_id")
        .orderBy("path", "subscriber", "event_id")
    }),

    // Watermarked tumbling-window counts over the live event stream
    // (the windowed extension on qstream): 6 h windows × event_type,
    // 1 h lateness. Two far-future sentinel batches close every real
    // window (see throughStream); the sentinel's own key group is
    // dropped. Oracle = the full relational recount — any window the
    // watermark machinery failed to flush (or flushed twice) breaks
    // row parity.
    "q_stream_window" -> ((s, dir) => {
      // project to the two columns the windowed count reads BEFORE the
      // parquet hand-off (guide §2.3 "project before the exchange"):
      // the stream-side scan prunes columns anyway, but the hand-off
      // WRITE otherwise materializes all six event columns to disk per
      // run — pure I/O for data no operator touches
      val ev = graft.model.TableLoader.events(s, dir)
        .select(col("ts"), col("event_type"))
      def flush(ts: String) = s.range(1).select(
        to_timestamp(lit(ts)).as("ts"), lit("__flush").as("event_type"))
      val out = throughStream(s, ev, Seq(
          flush("2024-03-01 00:00:00"), flush("2024-04-01 00:00:00"))) {
        stream => Streaming.windowedCounts(stream, "ts",
          "6 hours", "1 hour", keys = Seq("event_type"))
      }
      out.where(col("event_type") =!= "__flush")
        .select(unix_micros(col("window_start")).as("window_start_us"),
          unix_micros(col("window_end")).as("window_end_us"),
          col("event_type"), col("n"))
        .orderBy("window_start_us", "event_type")
    }),

    // Streaming gap-sessionization: the SAME oracle as the batch
    // q_sessionize (identical session_window semantics), but computed
    // through real micro-batches with append-mode session state —
    // sessions emit only once the watermark passes their close, so
    // streaming/batch parity proves the state machinery loses nothing.
    "q_stream_session" -> ((s, dir) => {
      // (ts, user_id) is all sessionization reads — project before the
      // parquet hand-off, same rationale as q_stream_window; the flush
      // sentinel keeps user_id = -1 so the post-filter is unchanged
      val ev = graft.model.TableLoader.events(s, dir)
        .select(col("ts"), col("user_id"))
      def flush(ts: String) = s.range(1).select(
        to_timestamp(lit(ts)).as("ts"), lit(-1L).as("user_id"))
      val out = throughStream(s, ev, Seq(
          flush("2024-03-01 00:00:00"), flush("2024-04-01 00:00:00"))) {
        stream => Streaming.sessionizeStream(
          stream.select(col("ts"), col("user_id")),
          gapMinutes = 30, lateness = "1 hour")
      }
      out.where(col("user_id") >= 0).orderBy("user_id", "start_us")
    }),

    // Streaming exact dedup (the in-flight ingest duplicate guard):
    // batch 1 streams the corpus, batch 2 streams salted COPIES of
    // every fifth doc (same text, shifted id/ts) — the keyed digest
    // state must drop every copy ACROSS the micro-batch boundary.
    // Emitted-count per digest is the check: a broken guard emits 2
    // for the salted digests and breaks parity with the distinct
    // recount.
    "q_stream_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .withColumn("ts", timestamp_micros(
          lit(1704067200000000L) + col("doc_id") * lit(1000000L)))
      val copies = docs.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000L)
        .withColumn("ts", timestamp_micros(
          lit(1704067200000000L) + col("doc_id") * lit(1000000L)))
      val out = throughStream(s, docs, Seq(copies)) { stream =>
        Streaming.dedupStream(stream, "ts", "30 days")
      }
      out.groupBy("digest").agg(count(lit(1)).as("n_emitted"))
        .orderBy("digest")
    }),

    // stp (SPARQL-triggered materialized view): sensor = a consume
    // cursor on /customer; tick 1 materializes, tick 2 (no new
    // versions) is a provable no-op, then a write batch (+10000 for
    // every custkey % 100 == 0) fires tick 3, which re-evaluates the
    // view over the merged store — newly-qualifying customers appear.
    "q_stp" -> ((s, dir) => {
      import s.implicits._
      val store = st(s, dir)
      val job = Stp.Job("hot-building", "/customer", None,
        """PREFIX ont: <cmwell://ont#>
          |SELECT ?c WHERE {
          |  ?c ont:mktsegment "BUILDING" .
          |  ?c ont:acctbal ?b .
          |  FILTER (?b > 9000)
          |} ORDER BY ?c""".stripMargin)
      val r1 = Stp.refresh(store, job, Stp.initialToken(job))
      require(r1.view.isDefined && r1.newVersions > 0,
        "initial tick must materialize")
      val r2 = Stp.refresh(store, job, r1.nextToken)
      val quietNoop = r2.view.isEmpty && r2.newVersions == 0L
      val cmds = store.current
        .where(col("system.path").startsWith("/customer/"))
        .select(col("system.path"), Search.fieldN("custkey"),
          Search.fieldN("acctbal"))
        .as[(String, Double, Double)]
        .filter(_._2.toLong % 100 == 0)
        .map { case (p, _, bal) =>
          val nv = bal + 10000
          Merger.Command("update", p, T0,
            Map("acctbal" -> Seq(Merger.FieldValue(nv.toString, Some(nv),
              None, None, InfotonModel.TDouble, None, None))),
            Map("acctbal" -> Seq.empty))
        }
      // merge against the SENSOR-SCOPED subtree: the job's sensor and
      // view both live under /customer, so cogrouping the other nine
      // tables (and re-exploding their quads for st2's view) would be
      // pure waste — at sf1 the full-store form spent ~30 of 37 s
      // exploding unrelated quads. Same result, subtree-sized work.
      // persisted ([[graft.ops.Caches]]): the merged subtree feeds the
      // tick-3 sensor probe AND every BGP triple-pattern scan of the
      // re-evaluated view (each pattern explodes the infoton frame
      // separately) — unpersisted, the /customer merge plan re-ran per
      // reference
      val merged = graft.ops.Caches.persist(Merger.merge(s,
        Merger.subtree(store.infotons, "/customer"), cmds))
      val st2 = GraftStore.fromInfotons(s, merged, Some(store.fieldTypes))
      val r3 = Stp.refresh(st2, job, r2.nextToken)
      r3.view.getOrElse(sys.error("delta tick must re-materialize"))
        .withColumn("n_delta", lit(r3.newVersions))
        .withColumn("quiet_noop", lit(quietNoop))
        .orderBy("c")
    }))

  val oracles: Map[String, String] = Map(
    "q_stream_window" ->
      """WITH b AS (SELECT event_type,
        |  epoch_us(ts) - epoch_us(ts) % 21600000000 AS ws FROM events)
        |SELECT ws AS window_start_us, ws + 21600000000 AS window_end_us,
        |  event_type, count(*) AS n
        |FROM b GROUP BY 1, 2, 3
        |ORDER BY window_start_us, event_type""".stripMargin,
    "q_stream_session" ->
      """WITH m AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |  THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, sum(brk) OVER
        |  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
        |  AS sid FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS start_us,
        |  epoch_us(max(ts)) AS last_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "q_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS digest, CAST(1 AS BIGINT) AS n_emitted
        |FROM documents ORDER BY digest""".stripMargin,
    "q_qstream" ->
      """SELECT event_id FROM events
        |WHERE event_type = 'purchase'
        |  AND epoch_us(ts) > epoch_us(TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY event_id""".stripMargin,
    "q_subscribe" ->
      """SELECT path, subscriber, event_id FROM (
        |  SELECT '/user/' || CAST(user_id AS VARCHAR) AS path,
        |    'purchase-watch' AS subscriber, event_id
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT '/user/' || CAST(user_id AS VARCHAR),
        |    'error-watch', event_id
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR),
        |    'bal-watch', CAST(NULL AS BIGINT)
        |  FROM customer WHERE c_acctbal > 9000)
        |ORDER BY path, subscriber, event_id""".stripMargin,
    "q_stp" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS c,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   WHERE c_custkey % 100 = 0) AS n_delta,
        |  TRUE AS quiet_noop
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND (CASE WHEN c_custkey % 100 = 0 THEN c_acctbal + 10000
        |       ELSE c_acctbal END) > 9000
        |ORDER BY c""".stripMargin)
}
