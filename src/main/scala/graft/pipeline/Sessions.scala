package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the event stream — the standard
  * user-activity grouping a training-data pipeline derives behavioral
  * documents from (and the reference's consume/stream surface has no
  * analog for; beyond-reference extension).
  *
  * Spark shape: `session_window(ts, gap)` inside a groupBy — one
  * shuffle on (user, merged-window); Catalyst's native session-window
  * merge does the island detection, so there is no per-user sort or
  * window function pass. The same expression works under Structured
  * Streaming with a watermark (state = open sessions only), which is
  * the 100 TB continuous-ingest path; the batch form here is the
  * backfill job.
  */
object Sessions {

  /** One row per (user, session): session = maximal event run where
    * consecutive gaps are < `gapMinutes`. Emits epoch-micro bounds
    * (first/last event — not the speculative window end) so results
    * compare exactly against relational oracles. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        unix_micros(col("first_ts")).as("start_us"),
        unix_micros(col("last_ts")).as("last_us"),
        col("n_events"))

  /** AS-OF (backward temporal) join: each left row picks the LATEST
    * right row with `right.ts <= left.ts` for the same key — the
    * point-in-time attribution join (DuckDB/kdb `ASOF JOIN`,
    * pandas `merge_asof`) that Spark has no native operator for.
    *
    * Spark-first shape — this is why it scales: instead of the naive
    * `l JOIN r ON key AND r.ts <= l.ts` + rank (whose join output is
    * |matches| = O(n·m) per key before the rank prunes it), both
    * sides are UNIONED and sorted once per key, and the match is a
    * running `last(payload, ignoreNulls)` carry-forward — one
    * shuffle+sort of |L|+|R|, zero intermediate blowup, AQE-splittable
    * like any sort. Right rows sort BEFORE left rows at equal ts
    * (inclusive match), and equal-ts right rows resolve to the
    * greatest `payloadCols.head` (pass a unique id first for a
    * deterministic pick).
    *
    * Returns every left row (left-outer: no prior right row → nulls)
    * with the matched payload columns appended as `<outPrefix><col>`. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String = "user_id", tsCol: String = "ts",
               payloadCols: Seq[String] = Seq("event_id", "value"),
               outPrefix: String = "r_"): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, outPrefix,
      forward = false)

  /** FORWARD as-of: each left row picks the EARLIEST right row with
    * `right.ts >= left.ts` for the same key — the "next event after"
    * attribution (time-to-next-error, next-touch conversion). Same
    * union + one-per-key-sort shape as the backward [[asofJoin]],
    * mirrored: the carry scans the FOLLOWING frame and same-ts right
    * rows sort after the left row so a tie (r.ts == l.ts) still
    * matches, with the payload head ascending as the deterministic
    * tie-break among simultaneous right rows. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      keyCol: String = "user_id", tsCol: String = "ts",
                      payloadCols: Seq[String] = Seq("event_id", "value"),
                      outPrefix: String = "r_"): DataFrame =
    asofImpl(left, right, keyCol, tsCol, payloadCols, outPrefix,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String,
                       payloadCols: Seq[String], outPrefix: String,
                       forward: Boolean): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val pType = right.select(payload.as("p")).schema.head.dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema.head.dataType
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
      lit(1).as("__side"), payload.as("__p"),
      lit(null).cast(lType).as("__l"))
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
      lit(0).as("__side"), lit(null).cast(pType).as("__p"),
      lStruct.as("__l"))
    // backward: right rows sort BEFORE same-ts left rows (side desc)
    // and the match is the LAST payload in the preceding frame;
    // forward: the SAME running-carry shape over the REVERSED order —
    // "first right row with t >= mine under (t asc, side asc, id asc)"
    // ≡ "last right row at-or-before me under (t desc, side desc,
    // id desc)". Both directions therefore use the GROWING
    // [unboundedPreceding, currentRow] frame, which Spark evaluates
    // incrementally (O(rows) per key). The literal following-frame
    // formulation (first() over [currentRow, unboundedFollowing])
    // re-aggregates the remaining frame for every row — O(rows²) per
    // key: invisible on uniform keys, 92× on a Zipf corpus where one
    // hot user holds 20% of the stream (the round-15 skew probe's
    // catch). Payload-head tie-break per direction is pinned by the
    // oracles: backward picks the max simultaneous id (last over asc),
    // forward the min (last over desc).
    val w0 = Window.partitionBy("__k")
    val w =
      if (forward)
        w0.orderBy(col("__t").desc, col("__side").desc,
            col("__p").getField(payloadCols.head).desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w0.orderBy(col("__t").asc, col("__side").desc,
            col("__p").getField(payloadCols.head).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = last(col("__p"), ignoreNulls = true)
    r.unionByName(l)
      .withColumn("__m", pick.over(w))
      .where(col("__side") === 0)
      .select(col("__l.*") +:
        payloadCols.map(c =>
          col("__m").getField(c).as(outPrefix + c)): _*)
  }

  /** Bucketed RANGE JOIN: for each left row, aggregate the right rows
    * of the same key with `ts` in `[left.ts, left.ts + horizon)` —
    * the follow-up-window attribution count.
    *
    * Spark-first shape: a raw `ON key AND r.ts BETWEEN …` inequality
    * join degenerates to a per-key nested loop; instead right rows
    * are assigned to fixed `horizon`-wide time buckets and each left
    * row probes its TWO covering buckets (an interval of length
    * `horizon` spans at most 2 such buckets) through a plain
    * equi-join on (key, bucket), with the exact range applied as a
    * post-filter. The join is hash/sort-merge like any other — at
    * 100 TB the bucket key rides the shuffle and skew tooling (AQE)
    * that inequality joins can't use. */
  def rangeCount(left: DataFrame, right: DataFrame,
                 horizonMinutes: Int,
                 keyCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val hUs = horizonMinutes * 60000000L
    val rb = right.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__rt"),
      (unix_micros(col(tsCol)) divide lit(hUs)).cast("long").as("__b"))
    val lb = left.select(col(idCol), col(keyCol), col(tsCol),
        unix_micros(col(tsCol)).as("__lt"))
      .withColumn("__b", explode(array(
        (col("__lt") divide lit(hUs)).cast("long"),
        ((col("__lt") + lit(hUs)) divide lit(hUs)).cast("long"))))
    val matched = lb.join(rb,
        lb(keyCol) === rb("__k") && lb("__b") === rb("__b") &&
          rb("__rt") >= col("__lt") && rb("__rt") < col("__lt") + lit(hUs))
      .groupBy(idCol).agg(count(lit(1)).as("__n"))
    left.select(col(idCol), col(keyCol),
        unix_micros(col(tsCol)).as("ts_us"))
      .join(matched, Seq(idCol), "left")
      .select(col(idCol), col(keyCol), col("ts_us"),
        coalesce(col("__n"), lit(0L)).as("n_follow"))
  }

  /** ORDERED FUNNEL: per user, the earliest chain of events matching
    * `steps` in order — `t₁ = min ts(type = s₁)`, `tᵢ = min ts(type =
    * sᵢ, ts > tᵢ₋₁)` — plus the reached level. Greedy-earliest is
    * EXACT for unconstrained gaps (an earlier prefix timestamp only
    * ever widens the remaining search space), which is why this
    * definition is used; per-step deadline variants lose that
    * property and need a per-start scan.
    *
    * Spark shape: ONE shuffle (groupBy user, collect the user's
    * (ts, type) pairs), then each step is an O(events) in-row
    * `filter`+`array_min` over the collected array. Step i's
    * threshold is materialized as a COLUMN before step i+1 references
    * it — inlining would re-derive the whole prefix chain per element
    * (exponential). Per-user state is the user's event history —
    * bounded like [[sessionize]]'s groups; a whale user caps at its
    * own history length, never the corpus. Returns (user_id,
    * step1_us…stepK_us, level) with epoch-micro timestamps. */
  def funnel(events: DataFrame, steps: Seq[String],
             keyCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val evs = col("__evs")
    var df = events
      .groupBy(col(keyCol))
      .agg(collect_list(struct(unix_micros(col(tsCol)).as("ts"),
        col(typeCol).as("et"))).as("__evs"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val matching =
        if (i == 0) filter(evs, e => e.getField("et") === s)
        else filter(evs, e => e.getField("et") === s &&
          e.getField("ts") > col(s"__t${i - 1}"))
      // array_min ignores nulls and yields null on empty — exactly
      // the unbound-step semantics; a null prior step nulls the
      // comparison, so later steps stay null without special-casing
      df = df.withColumn(s"__t$i",
        array_min(transform(matching, _.getField("ts"))))
    }
    val level = steps.indices.map(i =>
      when(col(s"__t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    df.select(col(keyCol) +:
      steps.indices.map(i => col(s"__t$i").as(s"step${i + 1}_us")) :+
      level.as("level"): _*)
  }

  /** RETENTION COHORTS: users grouped by their first-activity period
    * (`bucketDays`-wide epoch buckets), counted as active per
    * (cohort, periods-since-cohort) — the standard retention matrix.
    *
    * Scale shape: the first-activity table is user-dimension-sized
    * (one min-agg), the join back keys on the user like every event
    * enrichment, and the distinct + count pair is one map-side-
    * combined shuffle on (user, cohort, offset). No windows, no
    * per-user sort. */
  def retention(events: DataFrame, bucketDays: Int = 7,
                keyCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val periodUs = bucketDays * 86400000000L
    def bucket(c: Column): Column = // floor, not truncate-toward-zero:
      floor(unix_micros(c) / lit(periodUs)).cast("long") // pre-1970 safe
    val firsts = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__first"))
    events.join(firsts, keyCol)
      .select(bucket(col("__first")).as("cohort"),
        (bucket(col(tsCol)) - bucket(col("__first"))).as("offset"),
        col(keyCol))
      .distinct()
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))
    // no orderBy here: ordering is presentation, and a baked-in global
    // sort taxes consumers that re-aggregate or join the matrix — the
    // call site sorts if it wants to (funnel/sessionize convention)
  }

  /** Exact integral division on long columns. `(c / lit(w))` routes
    * through DOUBLE division, and a value one below a bucket boundary
    * (k·w − 1, quotient k − 1/w) rounds UP to k when 1/w is inside
    * half an ulp of the quotient — a real misbucketing at epoch-micro
    * magnitudes. Subtracting the remainder first makes the numerator
    * an exact multiple of w; the division then runs in DECIMAL, not
    * double (a double quotient is only exact below 2^53 — epoch
    * micros stay under that until ~2255, but the helper is generic
    * over long columns, where nanos/offsets reach it). An exact
    * integer quotient survives decimal division at any scale. */
  private def idiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** INTERVAL OVERLAP JOIN: all pairs (a, b) whose closed intervals
    * [aStart,aEnd] and [bStart,bEnd] intersect. Spark has no interval
    * join; the naive form is a cross join with a range predicate —
    * quadratic, the classic accidental scale-killer. The scale shape:
    * explode BOTH sides to the fixed-width time buckets their
    * interval covers, equi-join on the bucket (so only temporally
    * near rows ever meet), verify the exact overlap, and keep a
    * qualifying pair ONLY in the bucket containing
    * max(aStart, bStart) — each overlapping pair meets in exactly
    * that one bucket, so the join needs NO distinct pass. Bucket
    * width is the tuning knob: around the median interval length the
    * per-row explode factor stays ~2 while the equi-join prunes
    * everything non-near. Both sides shuffle once on the bucket key —
    * the same plan as any equi-join, skew-safe for time-spread data. */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  aStart: String, aEnd: String,
                  bStart: String, bEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth >= 1: $bucketWidth")
    // fail loud on the two silent-corruption preconditions: shared
    // column names make col(aStart) ambiguous after the bucket join
    // (rename one side first — asofJoin's outPrefix discipline), and
    // a pre-existing __bk would be overwritten then dropped
    val dup = a.columns.toSet intersect b.columns.toSet
    require(dup.isEmpty,
      s"overlapJoin inputs share column names $dup — rename one side")
    require(!a.columns.contains("__bk") && !b.columns.contains("__bk"),
      "overlapJoin inputs must not carry a __bk column")
    def buckets(s: Column, e: Column) =
      sequence(idiv(s, bucketWidth), idiv(e, bucketWidth))
    val ab = a.withColumn("__bk",
      explode(buckets(col(aStart), col(aEnd))))
    val bb = b.withColumn("__bk",
      explode(buckets(col(bStart), col(bEnd))))
    ab.join(bb, Seq("__bk"))
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bk") === idiv(greatest(col(aStart), col(bStart)),
          bucketWidth))
      .drop("__bk")
  }
}
