package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maps the driver's TPC-H-ish Parquet tables into the infoton model
  * (FIXTURES.md §B convention):
  *
  *   - path   = `/<table>/<pk>`, parent = `/<table>`
  *   - column → one typed field value
  *   - FK     → an additional FReference field pointing at the target
  *              path (`refCustomer` on orders, …) — these are the graph
  *              edges that xg/yg/gqp and the BGP compiler traverse
  *              (reference: FReference, Infoton.scala:672-695)
  *   - events → *versions* of `/user/<user_id>`: lastModified = ts and
  *              indexTime = unix_micros(ts), one `current=true` per path
  *              (reference versioning semantics: Infoton.scala uuid per
  *              version; ES `system.current`, FTSService.scala:850-854)
  *   - system.lastModified of static rows = deterministic function of
  *     the path (stable across runs, FIXTURES.md §B)
  *
  * Scale note: everything here is pure `Column` expressions — no
  * driver-side iteration — so the same loader runs unchanged over a
  * 100 TB input; the materialized store would be written as Parquet
  * partitioned by `system.parent` and z-ordered/sorted by path.
  */
object TableLoader {
  import InfotonModel._

  private val nullS = lit(null).cast("string")
  private val nullN = lit(null).cast("double")
  private val nullT = lit(null).cast("timestamp")
  private val nullB = lit(null).cast("boolean")

  private def value(s: Column, n: Column, t: Column, b: Column,
                    vType: String): Column =
    struct(s.cast("string").as("s"), n.cast("double").as("n"),
      t.cast("timestamp").as("t"), b.cast("boolean").as("b"),
      lit(vType).as("vType"), nullS.as("lang"), nullS.as("quad"))

  def sVal(c: Column): Column = value(c, nullN, nullT, nullB, TString)
  def lVal(c: Column): Column = value(c, c, nullT, nullB, TLong)
  def iVal(c: Column): Column = value(c, c, nullT, nullB, TInt)
  def dVal(c: Column): Column = value(c, c, nullT, nullB, TDouble)
  def bVal(c: Column): Column = value(c, nullN, nullT, c, TBool)
  def wVal(c: Column): Column = value(
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), nullN, c, nullB, TDate)
  /** FReference — `s` holds the target infoton path. */
  def rVal(targetPath: Column): Column =
    value(targetPath, nullN, nullT, nullB, TRef)

  /** Deterministic lastModified: a stable hash of the path spread over
    * one day from a fixed epoch (FIXTURES.md §B). */
  private def stableLastModified(path: Column): Column =
    timestamp_micros(lit(1717200000000000L) +
      pmod(xxhash64(path), lit(86400L)) * lit(1000000L))

  /** Static (field-name → vType) dictionary for the loaded store — the
    * analog of the reference's PassiveFieldTypesCache (SURVEY.md §1.4):
    * the query layer uses it to route predicates to the typed slot. */
  val fieldTypes: Map[String, String] = Map(
    "regionkey" -> TLong, "nationkey" -> TLong, "custkey" -> TLong,
    "suppkey" -> TLong, "partkey" -> TLong, "orderkey" -> TLong,
    "linenumber" -> TInt, "size" -> TInt,
    "acctbal" -> TDouble, "retailprice" -> TDouble, "totalprice" -> TDouble,
    "quantity" -> TDouble, "extendedprice" -> TDouble, "discount" -> TDouble,
    "tax" -> TDouble, "value" -> TDouble,
    "orderdate" -> TDate, "shipdate" -> TDate,
    "name" -> TString, "mktsegment" -> TString, "brand" -> TString,
    "type" -> TString, "orderstatus" -> TString, "orderpriority" -> TString,
    "returnflag" -> TString, "linestatus" -> TString,
    "event_type" -> TString, "props" -> TString, "text" -> TString,
    "lang" -> TString, "source" -> TString,
    "n_chars" -> TLong, "event_id" -> TLong, "doc_id" -> TLong,
    "xid" -> TLong,
    "refRegion" -> TRef, "refNation" -> TRef, "refCustomer" -> TRef,
    "refOrders" -> TRef, "refPart" -> TRef, "refSupplier" -> TRef)

  /** Fields mapped ANALYZED-ONLY — free text with no keyword slot
    * (document bodies): full-text searchable, but bucketing/sorting
    * them is an error in the reference's ES mapping and stays one
    * here (Aggregations.requireAggregatable). */
  val analyzedOnly: Set[String] = Set("text")

  // Reserve the loader's bare keys for the default namespace up front:
  // a foreign vocabulary ingested later in the session gets qualified
  // keys for these locals instead of aliasing an engine field.
  graft.qp.Namespaces.claimDefaults(fieldTypes.keys ++ Seq("linkTo"))

  private def system(path: Column, lm: Column, indexTime: Column,
                     current: Column, fields: Column): Column = {
    val parent = when(path === "/", "$root")
      .otherwise(regexp_replace(path, "/[^/]+$", ""))
    val parent2 = when(parent === "", "/").otherwise(parent)
    struct(
      path.as("path"), parent2.as("parent"), lm.as("lastModified"),
      lit("loader").as("lastModifiedBy"),
      // content-addressed version id — MD5 over path+lastModified+fields
      // (Infoton.scala:139-168)
      md5(concat_ws("|", path,
        date_format(lm, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        to_json(fields))).as("uuid"),
      lit("local").as("dc"), indexTime.cast("long").as("indexTime"),
      current.as("current"), lit(KindObject).as("kind"),
      lit("cmwell").as("protocol"))
  }

  private def static(df: DataFrame, table: String, pk: Column,
                     fields: Column): DataFrame = {
    val path = concat(lit(s"/$table/"), pk.cast("string"))
    val lm = stableLastModified(path)
    df.select(system(path, lm, unix_micros(lm), lit(true), fields)
      .as("system"), fields.as("fields"))
  }

  private def pq(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  /** events.parquet's `ts` physical type has varied across driver
    * generations: TIMESTAMP(NANOS) (rejected by Spark's vectorized
    * reader — read nanos as long and truncate to micros with integer
    * division; double division would lose precision above 2^53 ns),
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark maps to
    * TIMESTAMP_NTZ (rejected by unix_micros and friends — reinterpret
    * the wall-clock in the session zone, UTC, which is exactly how the
    * adjusted-to-UTC generations were read). Both normalizations are
    * lossless; downstream always sees TIMESTAMP. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = pq(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** This loader quad-tags document values /graph/<source>; the
    * matching aliases are registered HERE (and by every
    * [[GraftStore.forDir]] serve, including the warm cross-JVM path
    * that never calls [[load]]) — QuadAliases starts empty so a
    * deployment never inherits demo aliases that would mask its
    * unknown-alias errors. */
  def registerAliases(): Unit =
    (0 to 9).foreach(i =>
      graft.qp.QuadAliases.register(s"src$i", s"cmwell://graph/src$i"))

  /** All tables of one sf directory → one infoton DataFrame. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    registerAliases()
    val region = static(pq(spark, dir, "region"), "region", col("r_regionkey"),
      map(lit("regionkey"), array(lVal(col("r_regionkey"))),
          lit("name"), array(sVal(col("r_name")))))

    val nation = static(pq(spark, dir, "nation"), "nation", col("n_nationkey"),
      map(lit("nationkey"), array(lVal(col("n_nationkey"))),
          lit("name"), array(sVal(col("n_name"))),
          lit("regionkey"), array(lVal(col("n_regionkey"))),
          lit("refRegion"), array(rVal(
            concat(lit("/region/"), col("n_regionkey").cast("string"))))))

    val customer = static(pq(spark, dir, "customer"), "customer",
      col("c_custkey"),
      map(lit("custkey"), array(lVal(col("c_custkey"))),
          lit("name"), array(sVal(col("c_name"))),
          lit("nationkey"), array(lVal(col("c_nationkey"))),
          lit("acctbal"), array(dVal(col("c_acctbal"))),
          lit("mktsegment"), array(sVal(col("c_mktsegment"))),
          lit("refNation"), array(rVal(
            concat(lit("/nation/"), col("c_nationkey").cast("string"))))))

    val supplier = static(pq(spark, dir, "supplier"), "supplier",
      col("s_suppkey"),
      map(lit("suppkey"), array(lVal(col("s_suppkey"))),
          lit("name"), array(sVal(col("s_name"))),
          lit("nationkey"), array(lVal(col("s_nationkey"))),
          lit("acctbal"), array(dVal(col("s_acctbal"))),
          lit("refNation"), array(rVal(
            concat(lit("/nation/"), col("s_nationkey").cast("string"))))))

    val part = static(pq(spark, dir, "part"), "part", col("p_partkey"),
      map(lit("partkey"), array(lVal(col("p_partkey"))),
          lit("name"), array(sVal(col("p_name"))),
          lit("brand"), array(sVal(col("p_brand"))),
          lit("type"), array(sVal(col("p_type"))),
          lit("size"), array(iVal(col("p_size"))),
          lit("retailprice"), array(dVal(col("p_retailprice")))))

    val orders = static(pq(spark, dir, "orders"), "orders", col("o_orderkey"),
      map(lit("orderkey"), array(lVal(col("o_orderkey"))),
          lit("custkey"), array(lVal(col("o_custkey"))),
          lit("orderstatus"), array(sVal(col("o_orderstatus"))),
          lit("totalprice"), array(dVal(col("o_totalprice"))),
          lit("orderdate"), array(wVal(col("o_orderdate"))),
          lit("orderpriority"), array(sVal(col("o_orderpriority"))),
          lit("refCustomer"), array(rVal(
            concat(lit("/customer/"), col("o_custkey").cast("string"))))))

    // (orderkey, linenumber) is NOT unique in the synthetic data; the
    // 4-tuple with partkey+suppkey is — use it as the path key
    val lineitem = static(pq(spark, dir, "lineitem"), "lineitem",
      concat_ws("-", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")),
      map(lit("orderkey"), array(lVal(col("l_orderkey"))),
          lit("partkey"), array(lVal(col("l_partkey"))),
          lit("suppkey"), array(lVal(col("l_suppkey"))),
          lit("linenumber"), array(iVal(col("l_linenumber"))),
          lit("quantity"), array(dVal(col("l_quantity"))),
          lit("extendedprice"), array(dVal(col("l_extendedprice"))),
          lit("discount"), array(dVal(col("l_discount"))),
          lit("tax"), array(dVal(col("l_tax"))),
          lit("returnflag"), array(sVal(col("l_returnflag"))),
          lit("linestatus"), array(sVal(col("l_linestatus"))),
          lit("shipdate"), array(wVal(col("l_shipdate"))),
          lit("refOrders"), array(rVal(
            concat(lit("/orders/"), col("l_orderkey").cast("string")))),
          lit("refPart"), array(rVal(
            concat(lit("/part/"), col("l_partkey").cast("string")))),
          lit("refSupplier"), array(rVal(
            concat(lit("/supplier/"), col("l_suppkey").cast("string"))))))

    // documents carry RDF value tags: every value is quad-tagged with
    // its source graph (`/graph/<source>`) and the text value carries
    // the language tag — the one table exercising quad/lang filters
    // (reference FieldValue.quad / FString.lang, Infoton.scala:660-670)
    val docQuad = concat(lit("/graph/"), col("source"))
    val documents = static(pq(spark, dir, "documents"), "documents",
      col("doc_id"),
      map(lit("doc_id"), array(lVal(col("doc_id")).withField("quad", docQuad)),
          lit("text"), array(sVal(col("text")).withField("quad", docQuad)
            .withField("lang", col("lang"))),
          lit("lang"), array(sVal(col("lang")).withField("quad", docQuad)),
          lit("source"), array(sVal(col("source")).withField("quad", docQuad)),
          lit("n_chars"), array(lVal(col("n_chars")).withField("quad", docQuad))))

    // events → versions of /user/<user_id>; exactly one current per path
    // (row_number over indexTime desc — SURVEY.md §1.5)
    val ev = events(spark, dir)
    val evPath = concat(lit("/user/"), col("user_id").cast("string"))
    val evFields = map(
      lit("event_id"), array(lVal(col("event_id"))),
      lit("user_id"), array(lVal(col("user_id"))),
      lit("event_type"), array(sVal(col("event_type"))),
      lit("value"), array(dVal(col("value"))),
      lit("props"), array(sVal(col("props"))))
    val w = Window.partitionBy("system.path")
      .orderBy(col("system.indexTime").desc, col("system.uuid").desc)
    val users = ev.select(
        system(evPath, col("ts"), unix_micros(col("ts")), lit(true), evFields)
          .as("system"), evFields.as("fields"))
      .withColumn("system", col("system")
        .withField("current", row_number().over(w) === 1))

    // OPTIONAL dynamic-fields table — `xnodes.parquet`
    // (xid LONG, fields MAP<STRING, ARRAY<STRING>>): each row becomes
    // a /xnode/<xid> infoton whose field NAMES come from the DATA, the
    // open-vocabulary shape real CM-Well corpora carry (infoton fields
    // are an arbitrary map in the reference, Infoton.scala — the fixed
    // per-table maps above are just this demo loader's projection).
    // Values opening with '/' load as references (graph edges for
    // xg/yg/SPARQL), everything else as strings. This is also the
    // lever the scale probes use to generate a corpus-wide HOT
    // PREDICATE (the rdf:type shape: one predicate owning a large
    // share of all quads) — absent in the driver's sf dirs, so the
    // loaded store is unchanged there.
    val xnodes =
      if (!new java.io.File(s"$dir/xnodes.parquet").exists()) Nil
      else Seq(static(pq(spark, dir, "xnodes"), "xnode", col("xid"),
        map_concat(
          map(lit("xid"), array(lVal(col("xid")))),
          transform_values(col("fields"), (_, vs) =>
            transform(vs, v =>
              when(v.startsWith("/"), rVal(v)).otherwise(sVal(v)))))))

    val all = (Seq(region, nation, customer, supplier, part, orders,
      lineitem, documents, users) ++ xnodes).reduce(_ unionByName _)

    // missing-parents synthesis (reference auto-creates directory
    // infotons: ImpStream.scala:326-356)
    val parents = all.select(col("system.parent").as("p"))
      .union(all.sparkSession.range(1).select(lit("/").as("p")))
      .distinct()
      .where(col("p") =!= "$root")
      .select(system(col("p"),
        to_timestamp(lit("2024-06-01 00:00:00")), lit(0L), lit(true),
        lit(null).cast(InfotonType("fields").dataType)).as("system"),
        lit(null).cast(InfotonType("fields").dataType).as("fields"))

    all.unionByName(parents)
  }
}
