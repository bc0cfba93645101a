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
  * All resolve to the canonical local key before predicate compile
  * (the survey's "dictionary lookup at plan time"); an unknown
  * prefix / hash / namespace IRI fails loud — a typo must not
  * silently become a field name that matches nothing.
  *
  * The engine keeps ONE canonical key per predicate (SURVEY §7.5), so
  * resolution is a driver-side dictionary lookup, never a join. The
  * default table registers the synthetic corpus's namespace
  * (`ont → cmwell://ont#`); ingest paths carrying other vocabularies
  * add theirs via [[register]].
  */
object Namespaces {

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

  def register(prefix: String, uri: String): Unit = {
    byPrefix.put(prefix, uri)
    byHash.put(hashOf(uri), uri)
    uris.add(uri)
  }

  register("ont", "cmwell://ont#")

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
      val cut = math.max(uri.lastIndexOf('#'), uri.lastIndexOf('/')) + 1
      val (ns, local) = (uri.take(cut), uri.drop(cut))
      require(uris.contains(ns), s"unknown namespace IRI '$ns' in $key")
      require(local.nonEmpty, s"empty local name in $key")
      local
    } else {
      val dot = key.lastIndexOf('.')
      if (dot <= 0) key
      else {
        val (local, qual) = (key.take(dot), key.drop(dot + 1))
        if (qual.startsWith("$")) {
          // hash form is unambiguous syntax — fail loud on a bad hash
          require(byHash.containsKey(qual.drop(1)),
            s"unknown namespace hash '${qual.drop(1)}' in $key")
          local
        } else if (byPrefix.containsKey(qual)) local
        else key // a literal dotted field name, not a qualifier
      }
    }
}
