package graft
import graft.model.GraftStore
import graft.sparql.Sparql
import org.apache.spark.sql.{DataFrame, SparkSession}
object DateProf {
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
    val full = """PREFIX ont: <cmwell://ont#>
      |SELECT ?o ?y ?mo ?d ?tz WHERE {
      |  ?o ont:orderdate ?w .
      |  BIND(YEAR(?w) AS ?y)
      |  BIND(MONTH(?w) AS ?mo)
      |  BIND(DAY(?w) AS ?d)
      |  BIND(HOURS(?w) AS ?h)
      |  BIND(TZ(?w) AS ?tz)
      |  BIND(TIMEZONE(?w) AS ?dur)
      |  FILTER (?dur = "PT0S")
      |  FILTER (?h = 0)
      |  FILTER (?y = 1995)
      |  FILTER (?mo <= 2)
      |} ORDER BY ?o""".stripMargin
    t("full datefn")(Sparql.select(store, full))
    t("scan only")(Sparql.select(store,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?o ?w WHERE { ?o ont:orderdate ?w } ORDER BY ?o""".stripMargin))
    t("binds no filters")(Sparql.select(store,
      """PREFIX ont: <cmwell://ont#>
        |SELECT ?o ?y WHERE { ?o ont:orderdate ?w .
        |  BIND(YEAR(?w) AS ?y) } ORDER BY ?o""".stripMargin))
    val p = Sparql.select(store, full)
    println(p.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
