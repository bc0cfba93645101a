package graft
import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DIAGNOSTIC main (probe-only): decompose the two-level SemDeDup's
  * planted-pair loss at a decade corpus into (a) intrinsic SemDeDup
  * loss — the plant's FLAT nearest fine centroid differs from its
  * source's, so no within-cluster method can pair them — and (b)
  * two-level assignment drift — flat agrees but the coarse-cell
  * routing splits them. (b) is the only part the engine owns. */
object Sem2lLossProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val n0 = e0.count()
      val stride = math.max(1L, (n0 + 1999) / 2000)
      val g = if (n0 <= 2000) e0
        else e0.where(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
      val planted = PipelineQueries.plantDups(g)
      val e = e0.unionByName(planted.select("vec_id", "embedding"))
      val n = e.count()
      val k = math.max(10L, math.min(1024L, n / 50L)).toInt
      // FLAT assignment at the same k/iters/centroids as the 2L path
      val flat = Similarity.kmeans(e, k, 2)
      val pairsSrc = planted.select(col("src"), col("vec_id").as("pid"))
      val both = pairsSrc
        .join(flat.toDF("src", "c_src"), "src")
        .join(flat.toDF("pid", "c_pid"), "pid")
      val total = both.count()
      val flatAgree = both.where(col("c_src") === col("c_pid")).count()
      println(s"[sem2l-loss] $dir k=$k plants=$total " +
        s"flat_same_cluster=$flatAgree " +
        f"flat_recall_ceiling=${flatAgree.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
