package graft.model

import org.apache.spark.sql.types._

/** Schema of the Spark-native infoton model.
  *
  * The reference models every entity as an "infoton": a path-addressed
  * record with system metadata and a dynamic, multi-valued, typed field
  * map (reference: server/cmwell-domain/src/main/scala/cmwell/domain/
  * Infoton.scala:74-219, SystemFields at :69-72, fields at :77).
  *
  * Spark-first re-expression (SURVEY.md §1.6): ONE DataFrame `infotons`
  * with
  *   system: struct(path, parent, lastModified, lastModifiedBy, uuid,
  *           dc, indexTime, current, kind, protocol)
  *   fields: map<string, array<struct<s,n,t,b,vType,lang,quad>>>
  *
  * Each field value is a tagged union ("poor-man's variant"): the
  * canonical lexical form `s` is always set; `n`/`t`/`b` hold the typed
  * projection when the value is numeric / temporal / boolean so that
  * range predicates and sorts run on native types without per-row
  * string parsing (the reference gets this from ES type-mangled field
  * names, Infoton.scala:527-537; we get it from a struct slot).
  * `vType` is the single-char type tag (s/i/l/d/f/b/w=date/r=reference),
  * `lang` the RDF language tag, `quad` the named graph.
  *
  * At 100 TB this table is written as Parquet partitioned by
  * `system.parent` (table-like prefixes) and sorted by `system.path`
  * within files, so path/parent predicates become partition+min-max
  * pruning and never touch unrelated entities.
  */
object InfotonModel {

  val ValueType: StructType = StructType(Seq(
    StructField("s", StringType),      // canonical lexical form
    StructField("n", DoubleType),      // numeric projection (i/l/d/f)
    StructField("t", TimestampType),   // temporal projection (w)
    StructField("b", BooleanType),     // boolean projection
    StructField("vType", StringType),  // type tag
    StructField("lang", StringType),   // RDF lang tag
    StructField("quad", StringType)))  // named graph

  val SystemType: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("parent", StringType, nullable = false),
    StructField("lastModified", TimestampType),
    StructField("lastModifiedBy", StringType),
    StructField("uuid", StringType),
    StructField("dc", StringType),
    StructField("indexTime", LongType),
    StructField("current", BooleanType),
    StructField("kind", StringType),
    StructField("protocol", StringType)))

  val InfotonType: StructType = StructType(Seq(
    StructField("system", SystemType, nullable = false),
    StructField("fields",
      MapType(StringType, ArrayType(ValueType), valueContainsNull = false))))

  /** Quads (exploded EAV/RDF) view schema — SURVEY.md §1.6 (2). */
  val QuadType: StructType = StructType(Seq(
    StructField("subject", StringType),   // = system.path
    StructField("predicate", StringType), // = field name
    StructField("s", StringType),
    StructField("n", DoubleType),
    StructField("t", TimestampType),
    StructField("b", BooleanType),
    StructField("vType", StringType),
    StructField("lang", StringType),
    StructField("quad", StringType),
    StructField("lastModified", TimestampType),
    StructField("indexTime", LongType),
    StructField("current", BooleanType),
    StructField("kind", StringType)))

  // kind discriminators (Infoton.scala sealed trait subtypes)
  val KindObject = "ObjectInfoton"
  val KindDeleted = "DeletedInfoton"
  val KindLink = "LinkInfoton"
  val KindFile = "FileInfoton"
  val KindVirtual = "VirtualInfoton"

  // vType tags (Infoton.scala:527-537 type-prefix chars; `r` is ours for
  // FReference which the reference encodes as a plain string URI)
  val TString = "s"; val TInt = "i"; val TLong = "l"; val TDouble = "d"
  val TFloat = "f"; val TBool = "b"; val TDate = "w"; val TRef = "r"
}
