package graft.streaming

import graft.model.GraftStore
import graft.ops.Consume
import graft.sparql.Sparql
import org.apache.spark.sql.DataFrame

/** SPARQL-triggered processor (stp) — standing materialized views
  * (SURVEY.md §2.8; reference cmwell-sparql-agent
  * SparqlProcessorManager: each Job has sensors consuming path deltas
  * and a SPARQL template re-evaluated when a sensor fires).
  *
  * Spark shape: a sensor is a consume cursor (position token); a
  * refresh runs only when the sensor sees new versions, and the view
  * recomputes as one BGP-join job. Scheduling is external (cron /
  * Structured Streaming trigger); this module is the per-tick step,
  * deterministic and restart-safe because the token carries the whole
  * cursor state.
  */
object Stp {

  /** One standing view: watch `sensorPath` (optionally filtered), keep
    * `sparql` materialized. */
  final case class Job(name: String, sensorPath: String,
                       sensorQp: Option[String], sparql: String)

  final case class Refresh(view: Option[DataFrame], nextToken: String,
                           newVersions: Long)

  def initialToken(job: Job): String =
    Consume.createConsumer(job.sensorPath, job.sensorQp)

  /** One stp tick: consume the sensor delta; if anything changed,
    * re-evaluate the view. `view=None` ⇒ nothing new, keep the old
    * materialization. */
  def refresh(store: GraftStore, job: Job, token: String): Refresh = {
    val delta = Consume.consume(store, token, chunkSize = Int.MaxValue)
    // chunkSize = MaxValue makes the boundary probe see EVERY pending
    // row, so its count is exactly the chunk's row count (ties are
    // inside the boundary by construction) — re-counting the chunk
    // here was a second full action per tick (3 ticks per q_stp)
    val n = if (delta.nextToken.isEmpty) 0L else delta.seen
    if (n == 0) Refresh(None, token, 0L)
    else Refresh(Some(Sparql.select(store, job.sparql)),
      delta.nextToken.getOrElse(token), n)
  }
}
