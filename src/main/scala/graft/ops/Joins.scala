package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe join shapes.
  *
  * AQE's skew-join split handles sort-merge skew transparently, but it
  * only kicks in per shuffle-read statistics; SALTING is the explicit,
  * plannable lever when one key dominates a fact table and the build
  * side is too big to broadcast — the standard web-corpus case (one
  * domain = half the rows) called out in the brief.
  */
object Joins {

  /** Salted equi-join: replicate each build-side row into `salt`
    * copies (salt ids 0..salt-1) and scatter probe rows uniformly
    * across them, so a hot key's probe rows spread over `salt` tasks
    * instead of funneling into one. The result is row-identical to
    * the plain join — salting only changes the physical distribution.
    *
    * The probe row's salt is a deterministic hash of the whole row
    * (not a random), so re-runs and retried tasks land identically;
    * duplicate probe rows share a salt, which costs spread only if
    * duplicates themselves dominate. Cost: build side × `salt`
    * (choose salt ≈ hot-key-rows / target-task-rows, typically 8-64;
    * the build side is dim-sized, so the replication is the cheap
    * half of the trade). `how` = inner or left — the probe side is
    * preserved row-for-row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int, how: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt >= 1: $salt")
    require(how == "inner" || how == "left",
      s"salting replicates the dim side — join must preserve fact rows ($how)")
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    val factSalt = pmod(hash(struct(fact.columns.map(col): _*)), lit(salt))
    val saltedFact = fact.withColumn("__salt", factSalt)
    saltedFact.join(saltedDim, Seq(key, "__salt"), how).drop("__salt")
  }
}
