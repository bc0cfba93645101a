package graft.qp

/** Namespace-qualified field-key resolution — the /meta/ns layer
  * (SURVEY.md §2.2 last row; reference grammar Parsers.scala:55-135,
  * resolution wsutil/package.scala). qp/sort-by/fields= accept four
  * key spellings:
  *
  *   - `local`          — plain key (the engine's canonical form)
  *   - `local.prefix`   — namespace prefix, resolved via the ns table
  *   - `$full-uri$`     — explicit predicate IRI between `$`
  *   - `local.$nsHash`  — hash-form namespace qualifier
  *
  * All resolve to the canonical key before predicate compile
  * (the survey's "dictionary lookup at plan time"); an unknown
  * prefix / hash / namespace IRI fails loud — a typo must not
  * silently become a field name that matches nothing.
  *
  * The engine keeps ONE canonical key per predicate (SURVEY §7.5), so
  * resolution is a driver-side dictionary lookup, never a join. The
  * default table registers the synthetic corpus's namespace
  * (`ont → cmwell://ont#`); ingest paths carrying other vocabularies
  * add theirs via [[register]].
  *
  * CANONICAL-KEY CLAIMS (the reference's internal name-mangling,
  * AbstractJsonSerializer.scala:37-49, re-expressed): the first
  * namespace to use a local name owns the bare key; a LATER namespace
  * sharing that local name gets the qualified key `local.$nsHash` —
  * two vocabularies never alias one field. Claims are minted
  * DRIVER-SIDE only ([[claimAll]] over an ingest batch's distinct
  * predicates, sorted for determinism) and shipped to executors as a
  * broadcast map; [[keyOf]] is the pure query-side lookup. Load the
  * primary vocabulary first (the loader pre-claims its keys) — the
  * same warm-the-ns-cache discipline the reference has.
  */
object Namespaces {

  val DefaultNs = "cmwell://ont#"

  /** Stable hash id for a namespace IRI — the reference's internal
    * nsHash analog (any derivation works as long as register and
    * resolve agree; crc32 hex is short and deterministic). */
  def hashOf(uri: String): String = {
    val crc = new java.util.zip.CRC32()
    crc.update(uri.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.toHexString(crc.getValue)
  }

  private val byPrefix =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val byHash =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val uris =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** (ns, local) → canonical key. */
  private val claims =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  /** local → namespace owning the BARE key. */
  private val bareOwner =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(prefix: String, uri: String): Unit = {
    byPrefix.put(prefix, uri)
    byHash.put(hashOf(uri), uri)
    uris.add(uri)
  }

  register("ont", DefaultNs)

  /** Predicate IRI → (namespace, local name) at the last `#` or `/`. */
  def splitIri(iri: String): (String, String) = {
    val cut = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/')) + 1
    (iri.take(cut), iri.drop(cut))
  }

  private def qualKey(ns: String, local: String) = s"$local.$$${hashOf(ns)}"

  /** Claim the canonical key for one predicate (DRIVER-side only —
    * executors receive claims as a broadcast map, never mutate). */
  def claim(ns: String, local: String): String = synchronized {
    val existing = claims.get((ns, local))
    if (existing != null) existing
    else {
      uris.add(ns)
      byHash.put(hashOf(ns), ns)
      val owner = bareOwner.putIfAbsent(local, ns)
      val key = if (owner == null || owner == ns) local else qualKey(ns, local)
      claims.put((ns, local), key)
      key
    }
  }

  /** Reserve bare keys for the default namespace (loader dictionary) so
    * a foreign vocabulary ingested later can't alias an engine field. */
  def claimDefaults(locals: Iterable[String]): Unit =
    locals.foreach(claim(DefaultNs, _))

  /** Claim a batch of predicate IRIs (sorted first — which namespace
    * wins the bare key is deterministic per batch) → IRI → key map,
    * broadcastable to executors. Dictionary-scale: distinct predicates
    * of a batch, the /meta/ns cardinality class. */
  def claimAll(preds: Seq[String]): Map[String, String] =
    preds.distinct.sorted.map { p =>
      val (ns, local) = splitIri(p)
      p -> claim(ns, local)
    }.toMap

  /** Pure query-side lookup: the canonical key a predicate IRI maps
    * to. Unclaimed predicates fall back to the deterministic would-be
    * key (they match nothing either way — standard unknown-field
    * search behavior). Never mutates claim state. */
  def keyOf(iri: String): String = {
    val (ns, local) = splitIri(iri)
    keyFor(ns, local)
  }

  private def keyFor(ns: String, local: String): String = {
    val claimed = claims.get((ns, local))
    if (claimed != null) claimed
    else {
      val owner = bareOwner.get(local)
      if (owner == null || owner == ns) local else qualKey(ns, local)
    }
  }

  /** All canonical keys claimed under a namespace IRI — the
    * ns-wildcard (`*.prefix` / `*.$nsHash`) expansion universe
    * (reference nsWildcardPattern, Parsers.scala:370-375). Sorted for
    * deterministic expansion order. */
  def keysInNamespace(ns: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    claims.asScala.collect { case ((n, _), key) if n == ns => key }
      .toSeq.sorted
  }

  /** Whether a namespace IRI is registered (loader/ingest/claims) —
    * the fail-loud check behind `$nsUri#*$` wildcards: an unknown IRI
    * must not silently expand over zero fields. */
  def isRegistered(ns: String): Boolean = uris.contains(ns)

  /** Prefix → namespace IRI (None = unregistered). */
  def uriOfPrefix(prefix: String): Option[String] =
    Option(byPrefix.get(prefix))

  /** nsHash → namespace IRI (None = unknown hash). */
  def uriOfHash(h: String): Option[String] = Option(byHash.get(h))

  /** Canonical key → full predicate IRI for every claim OUTSIDE the
    * default namespace — bare keys owned by a foreign vocabulary AND
    * qualified keys (formatter emission: a field renders under its
    * CLAIMED namespace, so the vocabulary survives the roundtrip).
    * Keys absent here render under the default ont namespace. */
  def claimedIris: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    claims.asScala.collect {
      case ((ns, local), key) if ns != DefaultNs => key -> (ns + local)
    }.toMap
  }

  /** Canonical key → generated XML QName `n<nsHash>:<local>` for
    * non-default claims (RDF/XML element names; pair with
    * [[claimedNamespaces]]). */
  def claimedXmlNames: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    claims.asScala.collect {
      case ((ns, local), key) if ns != DefaultNs =>
        key -> s"n${hashOf(ns)}:$local"
    }.toMap
  }

  /** nsHash → namespace IRI for non-default claims (the extra
    * `xmlns:n<hash>` declarations an RDF/XML doc needs). */
  def claimedNamespaces: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    claims.asScala.collect {
      case ((ns, _), _) if ns != DefaultNs => hashOf(ns) -> ns
    }.toMap
  }

  /** Resolve any accepted key spelling to the canonical local key.
    *
    * The `$...$` forms are syntactically unambiguous, so an unknown
    * namespace IRI or hash fails loud. A dotted key whose qualifier is
    * NOT a registered prefix stays VERBATIM: RDF local names may
    * legitimately contain dots (`version.2` from `…#version.2`), and
    * rejecting them would make those fields unreachable — an unknown
    * plain field name already matches nothing, the standard search
    * behavior. */
  def resolve(key: String): String =
    if (key.startsWith("$") && key.endsWith("$") && key.length > 2) {
      val uri = key.substring(1, key.length - 1)
      val (ns, local) = splitIri(uri)
      require(uris.contains(ns), s"unknown namespace IRI '$ns' in $key")
      require(local.nonEmpty, s"empty local name in $key")
      keyFor(ns, local)
    } else {
      val dot = key.lastIndexOf('.')
      if (dot <= 0) key
      else {
        val (local, qual) = (key.take(dot), key.drop(dot + 1))
        if (qual.startsWith("$")) {
          // hash form is unambiguous syntax — fail loud on a bad hash
          val ns = byHash.get(qual.drop(1))
          require(ns != null,
            s"unknown namespace hash '${qual.drop(1)}' in $key")
          keyFor(ns, local)
        } else {
          val ns = byPrefix.get(qual)
          if (ns != null) keyFor(ns, local)
          else key // a literal dotted field name, not a qualifier
        }
      }
    }
}
