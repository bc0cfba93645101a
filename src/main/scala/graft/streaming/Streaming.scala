package graft.streaming

import graft.model.{GraftStore, InfotonModel}
import graft.ops.Search
import graft.qp.{FilterCompiler, QpParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming operators (SURVEY.md §2.6): `op=qstream` and
  * `op=subscribe` re-expressed on Structured Streaming.
  *
  * Reference: qStream is an akka-streams Source of search results
  * ordered by indexTime (Streams.qStream:366-441); subscribe evaluates
  * RTS rules — a path filter + field predicates — against every
  * incoming write and pushes matches (cmwell-rts Rule.scala:26-89,
  * Publisher.scala:25-96).
  *
  * Spark shape: the SAME qp compiler that serves batch search compiles
  * the rule predicate for a streaming DataFrame — one filter
  * expression, applied per micro-batch; `indexTime` is the natural
  * event-time column (monotone, assigned at commit), so no watermark
  * is needed for the exactly-once delta semantics (the reference's
  * consume contract) and `withWatermark` only enters for windowed
  * extensions. The source is anything Spark can readStream: the
  * engine's own parquet store directory (new version files appear as
  * append), Kafka, or a socket of NT lines through the ingest parser.
  */
object Streaming {

  /** `op=qstream` — the continuous variant of consume: the filtered
    * infoton stream, restricted to rows past `fromIndexTime`. Apply to
    * any streaming DataFrame with the infoton schema. */
  def qstream(stream: DataFrame, store: GraftStore, req: Search.Request,
              fromIndexTime: Long = 0L): DataFrame = {
    var pred = Search.pathPredicate(req.path, req.descendants) &&
      col("system.indexTime") > fromIndexTime
    if (!req.withDeleted)
      pred = pred && col("system.kind") =!= InfotonModel.KindDeleted
    req.qp.foreach { q =>
      pred = pred && new FilterCompiler(store).compile(QpParser.parse(q))
    }
    stream.where(pred)
  }

  /** One RTS subscription rule: subscriber id + path scope + optional
    * qp predicate (rule parser analog: Parsers.scala:303-351). */
  final case class Rule(subscriber: String, path: String,
                        qp: Option[String] = None)

  /** `op=subscribe` — tag every incoming infoton with the subscribers
    * whose rule it matches; rows matching no rule are dropped. The
    * result streams to any sink (`foreachBatch` webhook, Kafka, ...).
    * Rules compile ONCE into a single array-of-struct projection —
    * per-batch cost is one codegen'd predicate per rule, not a join. */
  def subscribe(stream: DataFrame, store: GraftStore,
                rules: Seq[Rule]): DataFrame = {
    val compiler = new FilterCompiler(store)
    val tags = rules.map { r =>
      val pred = r.qp.map(q => compiler.compile(QpParser.parse(q)))
        .foldLeft(Search.pathPredicate(r.path, descendants = true))(_ && _)
      when(pred, lit(r.subscriber)).otherwise(lit(null).cast("string"))
    }
    stream
      .withColumn("subscribers",
        filter(array(tags: _*), t => t.isNotNull))
      .where(size(col("subscribers")) > 0)
  }

  /** The command-source ingest sink — the reference's Kafka
    * persist_topic consumer (cmwell-bg ImpStream) re-expressed: any
    * readStream source with a string `value` column (Kafka, socket,
    * file drops) carries N-Triples/N-Quads lines; each micro-batch
    * folds to per-subject commands and merges onto the evolving store
    * snapshot via the SAME batch merge ([[graft.ingest.Merger.merge]]),
    * so streaming and bulk writes share one code path.
    *
    * The snapshot chains across batches through `localCheckpoint` —
    * lineage is cut per batch (the streaming-state discipline; in
    * production each batch lands in the parquet store and the next
    * reads it back, same truncation). `onBatch` receives the new full
    * store per epoch. */
  def ingestCommands(lines: DataFrame, initial: DataFrame,
                     lastModifiedOf: Long => java.sql.Timestamp)
                    (onBatch: (DataFrame, Long) => Unit)
      : DataStreamWriter[Row] =
    ingestCommandsWithDelta(lines, initial, lastModifiedOf)(
      (store, _, epoch) => onBatch(store, epoch))

  /** [[ingestCommands]], additionally handing the callback each
    * batch's DELTA — the new rows the merge created, batch-sized
    * ([[graft.ingest.Merger.mergeWithDelta]]). The delta is the
    * reference bg pipeline's index-command stream (ImpStream persists
    * to Cassandra, then emits IndexCommands the indexer applies
    * WITHOUT re-reading the store): feed it through [[versionLog]]
    * into [[currentFlags]] and the index side's current pointers are
    * maintained by keyed state ∝ LIVE PATHS — each batch costs
    * delta-sized work on the index, never a snapshot-wide flag
    * rewrite. StreamingSpec's composition test proves the change-log
    * fold lands on exactly the store's current flags. */
  def ingestCommandsWithDelta(lines: DataFrame, initial: DataFrame,
                              lastModifiedOf: Long => java.sql.Timestamp)
                             (onBatch: (DataFrame, DataFrame, Long) => Unit)
      : DataStreamWriter[Row] = {
    var snapshot = initial
    lines.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val nt = batch.select(col("value").cast("string")).as[String]
      val (merged, delta) = graft.ingest.Ingest
        .ingestWithDelta(spark, snapshot, nt, lastModifiedOf(epoch))
      val stored = merged
        .localCheckpoint(true) // materialize + cut lineage for the chain
      snapshot = stored
      onBatch(stored, delta, epoch)
    }
  }

  /** Map one ingest batch's merge delta to the [[currentFlags]] input:
    * real versions only — synthesized parent stubs carry no uuid and
    * no index pointer to maintain. */
  def versionLog(delta: DataFrame): org.apache.spark.sql.Dataset[VersionIn] = {
    import delta.sparkSession.implicits._
    delta.where(col("system.uuid").isNotNull)
      .select(col("system.path").as("path"), col("system.uuid").as("uuid"),
        col("system.indexTime").as("indexTime"))
      .as[VersionIn]
  }

  /** Watermarked tumbling-window aggregation over a qstream — the
    * windowed extension the reference lacks (SURVEY §2.6 marks windows
    * "absent in reference"; a training-data pipeline wants ingest-rate
    * / per-key counts over event time). `eventTime` must be a
    * timestamp column; late rows beyond `lateness` are dropped by the
    * watermark so state stays bounded — the standard Structured
    * Streaming shape (state size ∝ windows in flight × keys, never
    * the stream's history). */
  def windowedCounts(stream: DataFrame, eventTime: String,
                     windowLen: String, lateness: String,
                     keys: Seq[String] = Nil): DataFrame = {
    val keyCols = window(col(eventTime), windowLen) +: keys.map(col)
    stream
      .withWatermark(eventTime, lateness)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keys.map(col) :+ col("n"): _*)
  }

  /** Streaming EXACT dedup — the ingest-time duplicate guard of the
    * batch [[graft.pipeline.Dedup.exact]]/incrementalExact family:
    * content is digested (md5) and the first arrival inside the
    * watermark horizon passes; later copies are dropped by keyed
    * state. `dropDuplicatesWithinWatermark` bounds state to digests
    * seen within `lateness` of the max event time (the batch digest
    * INDEX plays this role across ingest sessions; this operator is
    * the in-flight guard between index refreshes), so state never
    * grows with stream history — the only safe shape at 100 TB/day
    * ingest rates. */
  def dedupStream(docs: DataFrame, eventTime: String, lateness: String,
                  textCol: String = "text"): DataFrame =
    docs.withColumn("digest", md5(col(textCol)))
      .withWatermark(eventTime, lateness)
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming gap-sessionization — the continuous form of
    * [[graft.pipeline.Sessions.sessionize]] (same session_window
    * expression, same output shape): a session is emitted once the
    * watermark passes its close, so state holds OPEN sessions only —
    * bounded by active users × lateness horizon, never by stream
    * history. Catalyst's native session merge handles out-of-order
    * arrivals inside the horizon (they extend/merge the open session);
    * rows behind the watermark are dropped. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        unix_micros(col("first_ts")).as("start_us"),
        unix_micros(col("last_ts")).as("last_us"),
        col("n_events"))

  /** One version arriving on the stream (current-flag maintenance). */
  final case class VersionIn(path: String, uuid: String, indexTime: Long)
  /** Change-log row: the version's resolved current flag at emit time. */
  final case class CurrentOut(path: String, uuid: String,
                              indexTime: Long, current: Boolean)
  /** Internal keyed state of [[currentFlags]] — public only because
    * Spark's state-encoder codegen needs the accessors. */
  final case class CurrentState(uuid: String, indexTime: Long)

  /** Streaming CURRENT-FLAG maintenance — the continuous form of the
    * write path's version flip ([[graft.ingest.Merger]]'s
    * latest-wins window, same (indexTime, uuid) winner order): keyed
    * CUSTOM STATE via `flatMapGroupsWithState`, the one streaming
    * shape the built-in operators can't express — each arrival must
    * both read the winner-so-far AND emit a derived row for the
    * version it dethrones.
    *
    * Per path the state is the winning (uuid, indexTime). A new
    * winner emits a `current=false` FLIP for the dethroned version
    * plus its own `current=true` row; a stale arrival (out-of-order
    * replica delivery — the inter-DC case) emits itself already
    * flagged false and leaves state untouched. The output is the
    * change-log a downstream index applies blindly.
    *
    * State shape at 100 TB: one (uuid, long) per LIVE PATH — the
    * entity dimension, the same cardinality the store's current flag
    * occupies, never the stream's history. NoTimeout is therefore the
    * correct retention (a path's winner must outlive any gap between
    * its versions); use the batch merge for full-store rebuilds. */
  def currentFlags(versions: org.apache.spark.sql.Dataset[VersionIn])
      : org.apache.spark.sql.Dataset[CurrentOut] = {
    import versions.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    versions.groupByKey(_.path)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (path: String, it: Iterator[VersionIn],
         state: GroupState[CurrentState]) => {
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[CurrentOut]
          // deterministic within-batch order (a batch may carry
          // several versions of one path, in any partition order)
          it.toSeq.sortBy(v => (v.indexTime, v.uuid)).foreach { v =>
            cur match {
              case Some(c) if Ordering[(Long, String)]
                .gt((v.indexTime, v.uuid), (c.indexTime, c.uuid)) =>
                out += CurrentOut(path, c.uuid, c.indexTime, current = false)
                out += CurrentOut(path, v.uuid, v.indexTime, current = true)
                cur = Some(CurrentState(v.uuid, v.indexTime))
              case Some(c) if (v.indexTime, v.uuid) == (c.indexTime, c.uuid) =>
                // duplicate redelivery of the LIVE winner (at-least-once
                // sources): a no-op — emitting current=false here would
                // un-current the live version in a blindly-applying index
                ()
              case Some(_) => // stale arrival: enters already dethroned
                out += CurrentOut(path, v.uuid, v.indexTime, current = false)
              case None =>
                out += CurrentOut(path, v.uuid, v.indexTime, current = true)
                cur = Some(CurrentState(v.uuid, v.indexTime))
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
  }

  /** Push sink: deliver each micro-batch from the EXECUTORS — the
    * webhook/queue push of the reference's push-mode subscribe. The
    * callback runs once per partition on the executor that holds it,
    * so a high-volume rule match never funnels through the driver JVM;
    * `f` must be serializable (open the connection inside the callback,
    * the standard foreachPartition discipline). */
  def deliver(matched: DataFrame, epochIntervalMs: Long = 1000L)
             (f: (Iterator[Row], Long) => Unit): DataStreamWriter[Row] =
    matched.writeStream
      .trigger(Trigger.ProcessingTime(epochIntervalMs))
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        batch.foreachPartition((it: Iterator[Row]) => f(it, epoch))
      }
}
