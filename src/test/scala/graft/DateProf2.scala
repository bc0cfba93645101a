package graft
import graft.model.GraftStore
import graft.sparql.Sparql
import org.apache.spark.sql.{DataFrame, SparkSession}
object DateProf2 {
  def t(name: String)(df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = GraftStore.forDir(spark, "/root/testdata/sf0.1")
    store.quads.count()
    val dir = "/tmp/graft_store_sf01"
    val t0 = System.nanoTime()
    GraftStore.materialize(store, dir)
    println(f"materialize: ${(System.nanoTime()-t0)/1e9}%.2f s")
    val pstore = GraftStore.forParquet(spark, dir)
    val full = """PREFIX ont: <cmwell://ont#>
      |SELECT ?o ?y ?mo ?d ?tz WHERE {
      |  ?o ont:orderdate ?w .
      |  BIND(YEAR(?w) AS ?y) BIND(MONTH(?w) AS ?mo) BIND(DAY(?w) AS ?d)
      |  BIND(HOURS(?w) AS ?h) BIND(TZ(?w) AS ?tz) BIND(TIMEZONE(?w) AS ?dur)
      |  FILTER (?dur = "PT0S") FILTER (?h = 0)
      |  FILTER (?y = 1995) FILTER (?mo <= 2)
      |} ORDER BY ?o""".stripMargin
    val scanQ = """PREFIX ont: <cmwell://ont#>
      |SELECT ?o ?w WHERE { ?o ont:orderdate ?w } ORDER BY ?o""".stripMargin
    t("mem scan only")(Sparql.select(store, scanQ))
    t("pq scan only")(Sparql.select(pstore, scanQ))
    t("mem full datefn")(Sparql.select(store, full))
    t("pq full datefn")(Sparql.select(pstore, full))
    t("mem full 2nd")(Sparql.select(store, full))
    t("pq full 2nd")(Sparql.select(pstore, full))
    spark.stop()
  }
}
