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
    // salt from the hashable columns only: hash() rejects MapType,
    // and hashing wide payload columns (document text) per row buys
    // no extra spread worth its CPU — strings are capped via a cheap
    // length+prefix surrogate
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hashable(a.elementType)
        case _ => true
      }
    val parts = fact.schema.fields.filter(f => hashable(f.dataType))
      .map { f =>
        f.dataType match {
          case org.apache.spark.sql.types.StringType =>
            substring(col(f.name), 1, 32)
          case _ => col(f.name)
        }
      }
    require(parts.nonEmpty, "saltedJoin: no hashable fact columns")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(parts.toIndexedSeq: _*), lit(salt)))
    saltedFact.join(saltedDim, Seq(key, "__salt"), how).drop("__salt")
  }
}
