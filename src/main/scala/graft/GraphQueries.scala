package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object GraphQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
