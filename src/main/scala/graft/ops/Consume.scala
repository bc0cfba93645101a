package graft.ops

import graft.model.GraftStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** The consume family — ordered, resumable delta scans keyed by the
  * monotone `indexTime` (SURVEY.md §2.6).
  *
  * Reference: `op=create-consumer`/`_consume` (Application.scala:
  * 1395-1453; Streams.qStream:366-441), `op=bulk-consume`
  * (BulkScrollHandler.scala:56-200), position token = gzip+base64
  * `ConsumeState` (cmwell/ws/adt/ConsumeState.scala:26-60).
  *
  * Chunk semantics: a chunk is "everything with
  * `from < indexTime <= boundary`", where boundary is the indexTime of
  * the chunkSize-th row. Including ALL rows that share the boundary
  * indexTime is how the reference avoids losing rows when a chunk
  * boundary splits equal timestamps (the same-indexTime edge case,
  * Streams.qStream:397-437) — this makes every chunk a deterministic
  * SET, so a consumer can resume from the token with no loss and no
  * duplicates.
  *
  * Scale: finding the boundary is a `limit(N).agg(max)` — a top-N over
  * a (pushed-down) range filter, not a global sort; the chunk itself
  * is a pure range predicate. Row-group pruning depends on the
  * LAYOUT: the primary materialized layout sorts path-major within
  * each parent (point reads, merge writes), so its per-row-group
  * indexTime min/max stay wide and a consume over a big directory
  * scans most row groups. Consume-heavy parents write the
  * indexTime-major secondary layout
  * ([[graft.model.GraftStore.materializeInfotonsByIndexTime]]) whose
  * row-group indexTime ranges are tight and disjoint — there the
  * range predicate prunes to the boundary row groups (pinned against
  * parquet footer stats by EngineSpec), which is what makes a 100 TB
  * drain per-chunk-sized instead of per-directory-sized.
  */
object Consume {

  /** Position token (gzip+base64 of k=v lines — same trick as the
    * reference's ConsumeState). */
  final case class State(path: String, from: Long, qp: Option[String],
                         withHistory: Boolean = true) {
    def encode: String = {
      val s = s"path=$path\nfrom=$from\nqp=${qp.getOrElse("")}\n" +
        s"withHistory=$withHistory"
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(s.getBytes(UTF_8)); gz.close()
      Base64.getUrlEncoder.encodeToString(bos.toByteArray)
    }
  }
  object State {
    def decode(token: String): State = {
      val bytes = Base64.getUrlDecoder.decode(token)
      val gz = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val s = new String(gz.readAllBytes(), UTF_8)
      val kv = s.linesIterator.map { l =>
        val i = l.indexOf('='); l.take(i) -> l.drop(i + 1)
      }.toMap
      State(kv("path"), kv("from").toLong,
        Option(kv.getOrElse("qp", "")).filter(_.nonEmpty),
        kv.get("withHistory").forall(_.toBoolean))
    }
  }

  /** `exhausted` is a zero-cost drain hint: true when the boundary
    * top-N saw fewer than chunkSize pending rows, i.e. this chunk is
    * the last non-empty one and the next consume would return None.
    * The token protocol is unchanged (the reference's consumer learns
    * it is done from an empty chunk); a drain LOOP that honors the
    * hint skips that final empty-probe action. false on token-less
    * results and on paths that don't compute a count (nextChunk). */
  final case class Result(chunk: DataFrame, nextToken: Option[String],
                          exhausted: Boolean = false,
                          /** Rows the boundary top-N saw (=
                            * min(pending, chunkSize)) — when the chunk
                            * was sized to swallow everything
                            * (chunkSize ≥ pending, i.e. `exhausted`),
                            * this IS the chunk's row count, so a
                            * consumer needing it (stp's
                            * newVersions) skips a recount action. */
                          seen: Long = 0L)

  /** `op=create-consumer` — initial token for a path+qp scan. */
  def createConsumer(path: String, qp: Option[String] = None): String =
    State(path, 0L, qp).encode

  // consume scans read the indexTime-major SECONDARY layout when the
  // store carries one ([[graft.model.GraftStore.consumeView]]): the
  // chunk's range predicate then prunes to the boundary row groups —
  // the reference's bulk-consume shape (BulkScrollHandler.scala:81-129)
  // at parquet granularity. Identity fallback otherwise.
  private def matching(store: GraftStore, st: State): DataFrame =
    Search.run(store.consumeView, Search.Request(path = st.path,
      qp = st.qp, withHistory = st.withHistory))

  /** `_consume` — next chunk after the token; chunkSize defaults to the
    * reference's consume.simple-chunk-size=3000. */
  def consume(store: GraftStore, token: String,
              chunkSize: Int = 3000): Result = {
    val st = State.decode(token)
    val pending = matching(store, st)
      .where(col("system.indexTime") > st.from)
    // boundary = indexTime of the chunkSize-th pending row (driver-side
    // scalar — this IS the position-token computation)
    val bRow = pending.select(col("system.indexTime").as("it"))
      .orderBy("it").limit(chunkSize).agg(max("it"), count(lit(1))).head()
    if (bRow.isNullAt(0)) Result(pending.limit(0), None) // drained
    else {
      val boundary = bRow.getLong(0)
      val chunk = pending.where(col("system.indexTime") <= boundary)
      Result(chunk, Some(st.copy(from = boundary).encode),
        exhausted = bRow.getLong(1) < chunkSize, seen = bRow.getLong(1))
    }
  }

  /** First-chunk probe that also SIZES the drain — ONE action returns
    * the total pending count, a ~(1/targetChunks) quantile boundary,
    * and the max indexTime (the drain-complete hint). A drain loop
    * that wants ~targetChunks chunks over an unknown-size pending set
    * starts here instead of paying a separate COUNT action before the
    * first boundary probe: the caller derives
    * chunkSize = ceil(n/targetChunks) for the remaining [[consume]]
    * calls. The boundary is an OBSERVED indexTime
    * (approx_percentile returns a value from the data), so the chunk
    * keeps [[consume]]'s set semantics — `from < it <= boundary`,
    * ties included — and the token advances exactly as [[consume]]'s
    * would; only the boundary PICK differs (approximate quantile
    * instead of exact top-N), which the reference itself allows:
    * bulk-consume binary-searches an approximate range end rather
    * than counting exactly (BulkScrollHandler.scala:81-129). */
  def consumeSized(store: GraftStore, token: String,
                   targetChunks: Int): (Result, Long) = {
    require(targetChunks >= 1,
      s"consumeSized needs targetChunks >= 1, got $targetChunks")
    val st = State.decode(token)
    val pending = matching(store, st)
      .where(col("system.indexTime") > st.from)
    val row = pending.agg(
      count(lit(1)).as("n"),
      percentile_approx(col("system.indexTime"),
        lit(1.0 / targetChunks), lit(100000)).as("b"),
      max(col("system.indexTime")).as("mx")).head()
    val n = row.getLong(0)
    if (n == 0) (Result(pending.limit(0), None), 0L)
    else {
      val boundary = row.getLong(1)
      val chunk = pending.where(col("system.indexTime") <= boundary)
      (Result(chunk, Some(st.copy(from = boundary).encode),
        exhausted = boundary == row.getLong(2)), n)
    }
  }

  /** `op=bulk-consume` — like consume but sized for throughput
    * (consume.bulk.threshold=100000): one indexTime RANGE per call.
    * The reference binary-searches the range end; here it's the exact
    * threshold-th indexTime (same one-pass top-N as above). */
  def bulkConsume(store: GraftStore, token: String,
                  threshold: Int = 100000): Result =
    consume(store, token, threshold)

  /** EXPANDABLE consume — `_consume` with per-chunk graph expansion
    * (the reference's second consume mode: chunks capped by
    * `consume.expandable-chunk-size`, application.conf:101, hardLimit
    * pick Application.scala:1495; expansion order gqp → yg → xg,
    * expandSearchResultsForSortedIteration, Application.scala:
    * 1696-1806). The POSITION TOKEN is computed on the UNEXPANDED
    * chunk and advances exactly as [[consume]] does — gqp may filter a
    * chunk to nothing and xg/yg may add neighbors without ever moving
    * the cursor, so a consumer resumes loss-free regardless of what
    * expansion did to the payload. Expansion output follows the Graph
    * operators' semantics: gqp filters the chunk, yg/xg union in the
    * reached CURRENT infotons. */
  def consumeExpand(store: GraftStore, token: String,
                    xg: Option[String] = None, yg: Option[String] = None,
                    gqp: Option[String] = None,
                    chunkSize: Int = 3000): Result =
    expandChunk(store, consume(store, token, chunkSize), xg, yg, gqp)

  /** Expansion of an ALREADY-consumed chunk — the same gqp → yg → xg
    * order as [[consumeExpand]], with zero additional actions: the
    * returned position token is the base result's BY CONSTRUCTION
    * (expansion never moves the cursor), which is the invariant
    * [[consumeExpand]] re-derives by consuming internally. A drain
    * loop that already holds each chunk's [[Result]] should expand
    * through this instead of paying a second boundary computation per
    * chunk. */
  def expandChunk(store: GraftStore, base: Result,
                  xg: Option[String] = None, yg: Option[String] = None,
                  gqp: Option[String] = None): Result = {
    var chunk = base.chunk
    gqp.foreach(g => chunk = Graph.gqp(store, chunk, g))
    yg.foreach(y => chunk = Graph.yg(store, chunk, y))
    xg.foreach(x => chunk = Graph.xg(store, chunk,
      Graph.parseXg(x, Graph.refFields(store))))
    Result(chunk, base.nextToken, base.exhausted)
  }

  /** `op=create-iterator` / `op=next-chunk` (FTSService.startScroll:721,
    * scroll:796; ScrollActor) — a deterministic scroll over a filtered
    * result, ordered by path.
    *
    * The reference keeps server-side scroll state with a TTL; here the
    * token IS the whole state (keyset pagination): it carries the last
    * path of the previous chunk, and the next chunk is
    * `path > last ORDER BY path LIMIT n` — a pushed-down range
    * predicate + top-N, so chunk N costs the same as chunk 1 (an
    * OFFSET scroll would re-scan N·chunk rows, and server state
    * wouldn't survive a 1000-executor restart). */
  final case class IterState(path: String, qp: Option[String],
                             after: Option[String]) {
    def encode: String = {
      val s = s"path=$path\nqp=${qp.getOrElse("")}\nafter=${after.getOrElse("")}"
      val bos = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(s.getBytes(UTF_8)); gz.close()
      Base64.getUrlEncoder.encodeToString(bos.toByteArray)
    }
  }
  object IterState {
    def decode(token: String): IterState = {
      val gz = new GZIPInputStream(new ByteArrayInputStream(
        Base64.getUrlDecoder.decode(token)))
      val kv = new String(gz.readAllBytes(), UTF_8).linesIterator.map { l =>
        val i = l.indexOf('='); l.take(i) -> l.drop(i + 1)
      }.toMap
      IterState(kv("path"), kv.get("qp").filter(_.nonEmpty),
        kv.get("after").filter(_.nonEmpty))
    }
  }

  /** `op=create-iterator` — initial scroll token. */
  def createIterator(path: String, qp: Option[String] = None): String =
    IterState(path, qp, None).encode

  /** `op=next-chunk` — the next `length` infotons after the token. */
  def nextChunk(store: GraftStore, token: String,
                length: Int = 100): Result = {
    val st = IterState.decode(token)
    var pending = Search.run(store,
      Search.Request(path = st.path, qp = st.qp))
    st.after.foreach(a => pending = pending.where(col("system.path") > a))
    val chunk = pending.orderBy("system.path").limit(length)
    val lastRow = chunk.select(max(col("system.path"))).head()
    if (lastRow.isNullAt(0)) Result(chunk.limit(0), None)
    else Result(chunk, Some(st.copy(after = Some(lastRow.getString(0))).encode))
  }

  /** Drain everything as indexTime-range slices of ~`sliceSize` rows —
    * the batch analog of repeated bulk-consume (the reference
    * binary-searches each range end; BulkScrollHandler.scala:81-129).
    *
    * Slice boundaries come from `approxQuantile` on indexTime (a
    * driver-side array of numSlices longs — the position-token scalars
    * themselves), and slice assignment is a pure expression against
    * that literal array, so nothing is ever globally sorted or moved
    * to one partition. Rows sharing a boundary indexTime land in the
    * same slice (set semantics — no loss, no duplication at seams);
    * slice sizes are therefore approximate, exactly like the
    * reference's ~100k-doc ranges. */
  def exportSlices(store: GraftStore, path: String,
                   sliceSize: Int): DataFrame = {
    val base = Search.run(store.consumeView,
        Search.Request(path = path, withHistory = true))
      .select(col("system.indexTime").as("it"))
    val n = base.count()
    val numSlices = math.max(1L, n / sliceSize).toInt
    val bounds: Array[Long] =
      if (numSlices <= 1) Array.empty
      else base.stat.approxQuantile("it",
        (1 until numSlices).map(_.toDouble / numSlices).toArray, 0.001)
        .map(_.toLong).distinct
    val boundsArr = array(bounds.map(lit(_)): _*)
    base.withColumn("slice",
        size(filter(boundsArr, b => b < col("it"))).cast("long"))
      .groupBy("slice")
      .agg(min("it").as("from_it"), max("it").as("to_it"),
        count(lit(1)).as("rows"))
      .orderBy("slice")
  }
}
