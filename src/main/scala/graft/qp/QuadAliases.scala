package graft.qp

import graft.ingest.Rdf

/** Named-graph alias resolution for `system.quad::` filters.
  *
  * The reference accepts either a full quad URL or a registered alias
  * and resolves the alias through its cached alias table before the
  * filter compiles (wsutil/RawFieldFilter.scala:104-112,
  * `getQuadUrlForAlias`); an unknown alias is an error, not an
  * everything-misses filter. Same plan-time dictionary pattern as
  * [[Namespaces]] — a driver-side lookup, never a join:
  *
  *   - `/path/form`   — the stored tag form, passes through
  *   - `proto://iri`  — full graph IRI, normalized to path form
  *   - `bare-alias`   — resolved through the registry, fail-loud
  *
  * The table starts EMPTY: whatever loads a dataset registers its
  * graphs (the synthetic-corpus loader registers `srcN`,
  * `model/TableLoader.scala`); a production deployment never
  * inherits demo aliases that would mask the unknown-alias error.
  */
object QuadAliases {

  private val byAlias =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(alias: String, graphIri: String): Unit =
    byAlias.put(alias, Rdf.iriToPath(graphIri))

  /** Resolve a `system.quad::` comparand to the stored path-form tag. */
  def resolve(value: String): String =
    if (value.startsWith("/")) value
    else if (value.contains("://")) Rdf.iriToPath(value)
    else {
      val hit = byAlias.get(value)
      require(hit != null,
        s"unknown quad alias '$value' — register it or pass the graph IRI")
      hit
    }
}
