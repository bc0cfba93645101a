package graft
import graft.ingest.{Ingest, JsonLd}
import graft.model.GraftStore
import graft.ops.{Formatters, Search}
import org.apache.spark.sql.SparkSession
import java.sql.Timestamp
object JsonLdProf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val st = GraftStore.forDir(spark, dir)
    t("warm store") { st.infotons.count() }
    val cust = Search.run(st, Search.Request(path = "/customer"))
    t("search cust") { cust.count() }
    val docs = Formatters.jsonldDocs(cust).as[String]
    t("format jsonld") { docs.count() }
    val T0 = Timestamp.valueOf("2026-01-01 00:00:00")
    t("parse only") { docs.flatMap(JsonLd.parse(_)).count() }
    t("full ingest+merge") {
      Ingest.ingestJsonLd(spark, Ingest.emptyStore(spark), docs, T0).count() }
    // nt comparison
    val nt = Formatters.ntriples(cust).as[String]
    t("format nt") { nt.count() }
    t("full nt ingest") {
      Ingest.ingest(spark, Ingest.emptyStore(spark), nt, T0).count() }
    spark.stop()
  }
}
