package graft

import graft.model.GraftStore
import graft.ops.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the qp/search operator family (SURVEY.md §2.2,
  * §2.5, §2.7) with their DuckDB oracles. */
object SearchQueries {

  private def st(s: SparkSession, dir: String): GraftStore =
    GraftStore.forDir(s, dir)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // `fields=` mask (Infoton.masked): only the masked keys survive in
    // the fields map — an unmasked field reads back null
    "q_fields_mask" -> ((s, dir) => {
      val r = Search.run(st(s, dir), Search.Request(path = "/customer"))
      Search.maskFields(r, Seq("name", "acctbal"))
        .select(col("system.path").as("path"),
          Search.fieldS("name").as("name"),
          Search.fieldN("acctbal").as("acctbal"),
          Search.fieldS("mktsegment").as("mktsegment"))
        .orderBy("path")
    }),

    // Equals (`::`) term filter
    "q_search_eq" -> ((s, dir) =>
      Search.run(st(s, dir),
        Search.Request(path = "/customer", qp = Some("mktsegment::BUILDING")))
        .select(col("system.path").as("path")).orderBy("path")),

    // Must conjunction + typed numeric range (`>`)
    "q_search_range" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/customer",
          qp = Some("mktsegment::BUILDING,acctbal>1000")))
        .select(col("system.path").as("path"),
          Search.fieldN("acctbal").as("acctbal")).orderBy("path")),

    // Should group (SoftBoolean OR, FTSService.scala:1886-1905)
    "q_search_should" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/customer",
          qp = Some("*mktsegment::BUILDING,*mktsegment::MACHINERY")))
        .select(col("system.path").as("path")).orderBy("path")),

    // MustNot (`-`) + LessThanOrEquals (`<<`)
    "q_search_mustnot" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/customer",
          qp = Some("-mktsegment::BUILDING,acctbal<<500")))
        .select(col("system.path").as("path")).orderBy("path")),

    // nested bool group `[...]` (Parsers.scala:599-610)
    "q_search_nested" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/customer",
          qp = Some("[*mktsegment::BUILDING,*mktsegment::MACHINERY],acctbal>9000")))
        .select(col("system.path").as("path")).orderBy("path")),

    // field-existence filter over the WHOLE store (dynamic schema:
    // only customers carry `mktsegment`)
    "q_search_exists" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/", qp = Some("mktsegment:")))
        .select(col("system.path").as("path")).orderBy("path")),

    // Contains (`:`) — tokenized match
    "q_search_contains" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:widget")))
        .select(col("system.path").as("path")).orderBy("path")),

    // Contains phrase semantics (ES match_phrase parity,
    // FTSService.scala:895-896): the query tokens must appear
    // CONSECUTIVELY in the analyzed token stream. The probe "a part"
    // is chosen so the two Contains modes disagree (substring also
    // hits "dat[a part]") — this query pins the phrase semantics...
    "q_search_phrase" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/documents", qp = Some("text:a part")))
        .select(Search.fieldN("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")),

    // ...and this one pins the documented raw-substring fallback on
    // the SAME probe — different oracle, different row set
    "q_search_contains_raw" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/documents", qp = Some("text:a part"),
            substringContains = true))
        .select(Search.fieldN("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")),

    // English-analyzer opt-in (the ES english-chain analog; the
    // shipped template default stays Standard): the probe
    // "the widgets" raw-phrase-matches NOTHING (names are singular,
    // article-free), but analyzes to the single term "widget" — stop
    // word dropped, plural stemmed — so this query is non-vacuous
    // ONLY through the analyzer chain; EngineSpec pins the
    // Standard-vs-English disagreement on the same probe
    "q_search_stemmed" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:the widgets"),
            analyzer = graft.qp.TextAnalyzer.English))
        .select(col("system.path").as("path")).orderBy("path")),

    // Full-Porter opt-in (Lucene PorterStemFilter analog): the probe
    // "widgetization" reaches the "widget" term set ONLY through the
    // derivational steps 2-4 (ization→ize→∅) — Porter-lite leaves it
    // whole (0 rows), so this query is non-vacuous exactly through the
    // EnglishFull chain
    "q_search_stemmed_full" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:widgetization"),
            analyzer = graft.qp.TextAnalyzer.EnglishFull))
        .select(col("system.path").as("path")).orderBy("path")),

    // German-analyzer opt-in (the per-language ES chain analog): the
    // probe "den Ringen" raw-matches NOTHING, but analyzes to the
    // single term "ring" — "den" is a German stop word (gap sentinel,
    // trimmed), "ringen" (dative plural of Ring) loses its -en by the
    // light-German step-1 rule — so this query is non-vacuous ONLY
    // through the German chain (Standard sees "ringen" verbatim; the
    // English Porter rules never touch a bare -en); EngineSpec pins
    // the disagreement plus the umlaut folding/tokenizing behavior
    "q_search_stemmed_de" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:den Ringen"),
            analyzer = graft.qp.TextAnalyzer.German))
        .select(col("system.path").as("path")).orderBy("path")),

    // French-analyzer opt-in: the probe "les widgets" raw-matches
    // NOTHING, but analyzes to the single term "widget" — "les" is a
    // French stop word (gap, trimmed; the ENGLISH chain would stem it
    // to the term "le" and phrase-fail) and "widgets" loses its
    // plural -s by the minimal stemmer — so the match is non-vacuous
    // ONLY through the French chain; elision/apostrophe behavior is
    // pinned in EngineSpec
    "q_search_stemmed_fr" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:les widgets"),
            analyzer = graft.qp.TextAnalyzer.French))
        .select(col("system.path").as("path")).orderBy("path")),

    // Spanish-analyzer opt-in: "los gizmos" raw-matches NOTHING, but
    // analyzes to the single term "gizm" — "los" is a Spanish stop
    // word (gap, trimmed) and "gizmos" loses -os by the light stemmer
    // (Savoy 2006), meeting the doc token "gizmo" stemmed to the same
    // "gizm" — so the match is non-vacuous ONLY through the Spanish
    // chain (Standard indexes "gizmo" verbatim and the phrase
    // "los gizmos" fails; accent/stop edge cases pinned in EngineSpec)
    "q_search_stemmed_es" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:los gizmos"),
            analyzer = graft.qp.TextAnalyzer.Spanish))
        .select(col("system.path").as("path")).orderBy("path")),

    // Italian-analyzer opt-in: "gli widgeti" raw-matches NOTHING, but
    // analyzes to the single term "widget" — "gli" is an Italian stop
    // word (gap, trimmed) and "widgeti" (Italian-inflected plural of
    // the loanword) loses its final -i by the light stemmer (Savoy
    // 2006: one final-vowel rule), meeting the doc token "widget"
    // (consonant-final → untouched) — so the match is non-vacuous
    // ONLY through the Italian chain (Standard sees "widgeti"
    // verbatim); elision behavior is pinned in EngineSpec
    "q_search_stemmed_it" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:gli widgeti"),
            analyzer = graft.qp.TextAnalyzer.Italian))
        .select(col("system.path").as("path")).orderBy("path")),

    // Portuguese-analyzer opt-in: "os gizmos" raw-matches NOTHING,
    // but analyzes to the single term "gizm" — "os" is a Portuguese
    // stop word (gap, trimmed) and "gizmos" reduces -s then drops the
    // theme vowel -o by the light stemmer (Savoy 2006), meeting the
    // doc token "gizmo" stemmed to the same "gizm" — non-vacuous ONLY
    // through the Portuguese chain (the plural-alternation and
    // feminine edge cases are pinned in EngineSpec)
    "q_search_stemmed_pt" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:os gizmos"),
            analyzer = graft.qp.TextAnalyzer.Portuguese))
        .select(col("system.path").as("path")).orderBy("path")),

    // Dutch-analyzer opt-in: "de widgetten" raw-matches NOTHING, but
    // analyzes to the single term "widget" — "de" is a Dutch stop
    // word (gap, trimmed) and "widgetten" (Dutch-inflected plural of
    // the loanword, with the consonant doubling Dutch spelling
    // demands) loses -en then undoes the tt doubling by the light
    // stemmer, meeting the doc token "widget" (untouched) — so the
    // match is non-vacuous ONLY through the Dutch chain (Standard
    // sees "widgetten" verbatim; no other chain has the doubling
    // undo); -heden/-s/-e edge cases pinned in EngineSpec
    "q_search_stemmed_nl" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:de widgetten"),
            analyzer = graft.qp.TextAnalyzer.Dutch))
        .select(col("system.path").as("path")).orderBy("path")),

    // Swedish-analyzer opt-in: "de widgetarna" raw-matches NOTHING,
    // but analyzes to the single term "widget" — "de" is a Swedish
    // stop word (gap, trimmed) and "widgetarna" (Swedish definite
    // plural of the loanword) loses -arna by the light stemmer,
    // meeting the doc token "widget" (kept whole by the short-ending
    // gate: -et strips only past stem length 5) — non-vacuous ONLY
    // through the Swedish chain; genitive/definite edge cases pinned
    // in EngineSpec
    "q_search_stemmed_sv" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:de widgetarna"),
            analyzer = graft.qp.TextAnalyzer.Swedish))
        .select(col("system.path").as("path")).orderBy("path")),

    // Danish-analyzer opt-in: "de widgetterne" raw-matches NOTHING,
    // but analyzes to the single term "widget" — "de" is a Danish
    // stop word (gap, trimmed) and "widgetterne" (Danish definite
    // plural, with the consonant doubling Danish spelling demands)
    // loses -erne then undoes the tt doubling (the Snowball danish
    // UNDOUBLE step — the behavior that distinguishes this chain
    // from Swedish), meeting the doc token "widget" — non-vacuous
    // ONLY through the Danish chain; undouble edge cases pinned in
    // EngineSpec
    "q_search_stemmed_da" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("name:de widgetterne"),
            analyzer = graft.qp.TextAnalyzer.Danish))
        .select(col("system.path").as("path")).orderBy("path")),

    // Like (`~`) — fuzzy, ES AUTO fuzziness
    "q_search_fuzzy" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/region", qp = Some("name~AMERIKA")))
        .select(col("system.path").as("path")).orderBy("path")),

    // sort-by desc + offset/length pagination (§2.5)
    "q_sort_page" -> ((s, dir) =>
      Search.search(st(s, dir),
          Search.Request(path = "/customer", sortBy = Some("-acctbal")),
        offset = 20, length = 10)
        .select(col("system.path").as("path"),
          Search.fieldN("acctbal").as("acctbal"))),

    // listChildren of root — synthesized directory infotons (§2.5)
    "q_children" -> ((s, dir) =>
      Search.listChildren(st(s, dir), "/")
        .select(col("system.path").as("path")).orderBy("path")),

    // DatesFilter on version axis: /user versions in a window
    // (with-history read, §2.7)
    "q_dates" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/user",
          withHistory = true,
          from = Some("2024-01-15 00:00:00"), to = Some("2024-01-20 00:00:00")))
        .select(Search.fieldN("event_id").cast("long").as("event_id"))
        .orderBy("event_id")),

    // default current-only read: latest version per /user path (§1.5)
    "q_current" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/user"))
        .select(Search.fieldN("user_id").cast("long").as("user_id"),
          Search.fieldN("event_id").cast("long").as("event_id"))
        .orderBy("user_id")),

    // with-history: version count per path (§2.7)
    "q_history_count" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/user", withHistory = true))
        .groupBy(col("system.path").as("path"))
        .agg(count(lit(1)).as("versions")).orderBy("path")),

    // quad filter: documents whose values live in one named graph
    // (`system.quad::alias`, §2.2)
    "q_quad_filter" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/documents",
          qp = Some("system.quad::/graph/src7")))
        .select(Search.fieldN("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")),

    // quad filter through a registered ALIAS — resolved to the graph
    // IRI at plan time (RawFieldFilter.scala getQuadUrlForAlias)
    "q_quad_alias" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/documents",
          qp = Some("system.quad::src4")))
        .select(Search.fieldN("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")),

    // lang-tag filter: documents with a German-tagged text value
    "q_lang_filter" -> ((s, dir) =>
      Search.run(st(s, dir), Search.Request(path = "/documents",
          qp = Some("system.lang::de")))
        .select(Search.fieldN("doc_id").cast("long").as("doc_id"))
        .orderBy("doc_id")),

    // `_all` search across every field (§2.2 allFields)
    "q_search_all" -> ((s, dir) =>
      Search.run(st(s, dir),
          Search.Request(path = "/part", qp = Some("_all:red")))
        .select(col("system.path").as("path")).orderBy("path")),

    // op=read point/multi-get (§2.1)
    "q_read_multi" -> ((s, dir) =>
      Search.read(st(s, dir),
          Seq("/customer/1", "/customer/2", "/nation/1"))
        .select(col("system.path").as("path"),
          Search.fieldS("name").as("name")).orderBy("path")),

    // op=stream: full filtered export as one job (§2.6)
    "q_stream" -> ((s, dir) =>
      Search.stream(st(s, dir), Search.Request(path = "/lineitem",
          qp = Some("returnflag::R,quantity>48")))
        .select(col("system.path").as("path")).orderBy("path")),

    // CompoundInfoton: directory listing with the total envelope (§2.5)
    "q_children_compound" -> ((s, dir) =>
      graft.ops.Admin.compound(st(s, dir), "/region")
        .select("child", "total").orderBy("child")))

  val oracles: Map[String, String] = Map(
    "q_fields_mask" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path,
        |c_name AS name, c_acctbal AS acctbal, CAST(NULL AS VARCHAR) AS mktsegment
        |FROM customer ORDER BY path""".stripMargin,
    "q_search_eq" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path
        |FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY path""".stripMargin,
    "q_search_range" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path, c_acctbal AS acctbal
        |FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
        |ORDER BY path""".stripMargin,
    "q_search_should" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path
        |FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')
        |ORDER BY path""".stripMargin,
    "q_search_mustnot" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path
        |FROM customer WHERE c_mktsegment <> 'BUILDING' AND c_acctbal <= 500
        |ORDER BY path""".stripMargin,
    "q_search_nested" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path
        |FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')
        |AND c_acctbal > 9000 ORDER BY path""".stripMargin,
    "q_search_exists" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path
        |FROM customer ORDER BY path""".stripMargin,
    "q_search_contains" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_phrase" ->
      """SELECT doc_id FROM documents
        |WHERE ' ' || array_to_string(
        |  string_split_regex(lower(text), '[^a-z0-9]+'), ' ') || ' '
        |  LIKE '% a part %'
        |ORDER BY doc_id""".stripMargin,
    "q_search_contains_raw" ->
      """SELECT doc_id FROM documents WHERE lower(text) LIKE '%a part%'
        |ORDER BY doc_id""".stripMargin,
    // VOCABULARY ASSUMPTION shared by EVERY q_search_stemmed_* oracle
    // below: the graft side stems DOC tokens through the language
    // chain while the DuckDB side does an EXACT list_contains on the
    // expected stem ('widget'/'gizmo'/'ring'). Parity therefore
    // requires that no part-name token merely STEMS to that term
    // without equalling it (e.g. 'widgets', 'widgetter', 'ringen' as
    // a doc token) and that no doc token collides with a chain's stop
    // list. The driver's part-name vocabulary satisfies this today
    // (loanword singulars only); if the generator's vocabulary ever
    // gains analyzer-foldable forms, these oracles must switch to
    // stem-aware SQL, not exact match.
    "q_search_stemmed" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_full" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_de" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'ring')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_fr" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_es" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'gizmo')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_it" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_pt" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'gizmo')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_nl" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_sv" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_stemmed_da" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'widget')
        |ORDER BY path""".stripMargin,
    "q_search_fuzzy" ->
      """SELECT '/region/' || CAST(r_regionkey AS VARCHAR) AS path FROM region
        |WHERE levenshtein(lower(r_name), 'amerika') <= 2 ORDER BY path""".stripMargin,
    "q_sort_page" ->
      """SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path, c_acctbal AS acctbal
        |FROM customer
        |ORDER BY c_acctbal DESC, path ASC LIMIT 10 OFFSET 20""".stripMargin,
    "q_children" ->
      """SELECT path FROM (VALUES ('/customer'),('/documents'),('/lineitem'),
        |('/nation'),('/orders'),('/part'),('/region'),('/supplier'),('/user'))
        |AS t(path) ORDER BY path""".stripMargin,
    "q_dates" ->
      """SELECT event_id FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |AND ts <= TIMESTAMP '2024-01-20 00:00:00' ORDER BY event_id""".stripMargin,
    "q_current" ->
      """SELECT user_id, event_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q_history_count" ->
      """SELECT '/user/' || CAST(user_id AS VARCHAR) AS path,
        |count(*) AS versions FROM events GROUP BY 1 ORDER BY path""".stripMargin,
    "q_quad_filter" ->
      "SELECT doc_id FROM documents WHERE source = 'src7' ORDER BY doc_id",
    "q_quad_alias" ->
      "SELECT doc_id FROM documents WHERE source = 'src4' ORDER BY doc_id",
    "q_lang_filter" ->
      "SELECT doc_id FROM documents WHERE lang = 'de' ORDER BY doc_id",
    "q_search_all" ->
      """SELECT '/part/' || CAST(p_partkey AS VARCHAR) AS path FROM part
        |WHERE list_contains(string_split_regex(lower(p_name), '[^a-z0-9]+'), 'red')
        |OR list_contains(string_split_regex(lower(p_brand), '[^a-z0-9]+'), 'red')
        |OR list_contains(string_split_regex(lower(p_type), '[^a-z0-9]+'), 'red')
        |ORDER BY path""".stripMargin,
    "q_read_multi" ->
      """SELECT path, name FROM (
        |  SELECT '/customer/' || CAST(c_custkey AS VARCHAR) AS path,
        |    c_name AS name FROM customer WHERE c_custkey IN (1, 2)
        |  UNION ALL
        |  SELECT '/nation/' || CAST(n_nationkey AS VARCHAR), n_name
        |  FROM nation WHERE n_nationkey = 1) ORDER BY path""".stripMargin,
    "q_stream" ->
      """SELECT '/lineitem/' || CAST(l_orderkey AS VARCHAR) || '-' ||
        |  CAST(l_linenumber AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
        |  || '-' || CAST(l_suppkey AS VARCHAR) AS path
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 48
        |ORDER BY path""".stripMargin,
    "q_children_compound" ->
      """SELECT '/region/' || CAST(r_regionkey AS VARCHAR) AS child,
        |(SELECT count(*) FROM region) AS total FROM region
        |ORDER BY child""".stripMargin)
}
