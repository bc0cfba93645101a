package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY local-iteration probe (not part of any contract; delete
  * before round close): times expression variants over a docs dir to
  * attribute per-row cost inside the quality() projection. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Similarity, TextAnalysis}
    val docs = Similarity.computeParallel(
      spark.read.parquet(s"$dir/documents.parquet"))
    val stopArr = array(Seq("the", "a", "an", "and", "of", "to", "in",
      "is", "it", "for").map(lit): _*)
    def t(name: String)(df: DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name%-28s run $i  ${(System.nanoTime()-t0)/1e9}%7.2f s")
      }
    }
    val ts = TextAnalysis.tokens(col("text"))
    t("baseline_scan") { docs.select(col("doc_id"), length(col("text")).as("l")) }
    t("tokens_only") { docs.select(col("doc_id"), size(ts).as("n")) }
    val tsd = docs.select(col("doc_id"), col("text"), ts.as("__ts"))
    t("tokens_materialized") { tsd.select(col("doc_id"), size(col("__ts")).as("n")) }
    t("stopfilter") { tsd.select(col("doc_id"),
      size(filter(col("__ts"), x => array_contains(stopArr, x))).as("n")) }
    t("distinct") { tsd.select(col("doc_id"),
      size(array_distinct(col("__ts"))).as("n")) }
    t("regex_punct") { docs.select(col("doc_id"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).as("n")) }
    t("regex_ws") { docs.select(col("doc_id"),
      length(regexp_replace(col("text"), "\\s+", "")).as("n")) }
    t("ref1") { tsd.select(col("doc_id"), size(col("__ts")).as("a")) }
    t("ref2") { tsd.select(col("doc_id"), size(col("__ts")).as("a"),
      size(array_distinct(col("__ts"))).as("b")) }
    t("ref3") { tsd.select(col("doc_id"), size(col("__ts")).as("a"),
      size(array_distinct(col("__ts"))).as("b"),
      size(filter(col("__ts"), x => array_contains(stopArr, x))).as("c")) }
    t("ref5") { tsd.select(col("doc_id"), size(col("__ts")).as("a"),
      size(array_distinct(col("__ts"))).as("b"),
      size(filter(col("__ts"), x => array_contains(stopArr, x))).as("c"),
      element_at(col("__ts"), 1).as("d"),
      element_at(col("__ts"), -1).as("e")) }
    val nTok = size(col("__ts")).cast("double")
    t("m_stop") { tsd.select(col("doc_id"),
      (size(filter(col("__ts"), x => array_contains(stopArr, x))).cast("double") / nTok).as("sr")) }
    t("m_punct") { tsd.select(col("doc_id"),
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")) * lit(1.0) / length(col("text"))).as("pr")) }
    t("m_mwl") { tsd.select(col("doc_id"),
      ((length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0)) / nTok).as("mwl")) }
    t("m_rep") { tsd.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(col("__ts"))).cast("double") / nTok).as("rep")) }
    t("m_stop_rep") { tsd.select(col("doc_id"),
      (size(filter(col("__ts"), x => array_contains(stopArr, x))).cast("double") / nTok).as("sr"),
      (lit(1.0) - size(array_distinct(col("__ts"))).cast("double") / nTok).as("rep")) }
    t("m_stop_rep_mwl") { tsd.select(col("doc_id"),
      (size(filter(col("__ts"), x => array_contains(stopArr, x))).cast("double") / nTok).as("sr"),
      ((length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0)) / nTok).as("mwl"),
      (lit(1.0) - size(array_distinct(col("__ts"))).cast("double") / nTok).as("rep")) }
    def m(name: String, drop: Int): Unit = {
      val ms = Seq(
        size(col("__ts")).as("n_tokens"),
        (size(filter(col("__ts"), x => array_contains(stopArr, x))).cast("double") / nTok).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")) * lit(1.0) / length(col("text"))).as("punct_ratio"),
        ((length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0)) / nTok).as("mean_word_len"),
        (lit(1.0) - size(array_distinct(col("__ts"))).cast("double") / nTok).as("repetition"))
      val keep = ms.zipWithIndex.filter(_._2 != drop).map(_._1)
      t(name) { tsd.select(col("doc_id") +: keep: _*) }
    }
    m("all5", -1)
    m("drop_ntok", 0)
    m("drop_stop", 1)
    m("drop_punct", 2)
    m("drop_mwl", 3)
    m("drop_rep", 4)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    m("all5_nowscg", -1)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
    m("all5_hugelimit", -1)
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    def mc(name: String, keepIdx: Seq[Int]): Unit = {
      val ms = Seq(
        size(col("__ts")).as("n_tokens"),
        (size(filter(col("__ts"), x => array_contains(stopArr, x))).cast("double") / nTok).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")) * lit(1.0) / length(col("text"))).as("punct_ratio"),
        ((length(regexp_replace(col("text"), "\\s+", "")) * lit(1.0)) / nTok).as("mean_word_len"),
        (lit(1.0) - size(array_distinct(col("__ts"))).cast("double") / nTok).as("repetition"))
      t(name) { tsd.select(col("doc_id") +: keepIdx.map(ms): _*) }
    }
    mc("p", Seq(2))
    mc("p_n", Seq(0, 2))
    mc("p_s", Seq(1, 2))
    mc("p_m", Seq(2, 3))
    mc("p_r", Seq(2, 4))
    mc("p_n_s", Seq(0, 1, 2))
    mc("p_s_r", Seq(1, 2, 4))
    mc("p_m_r", Seq(2, 3, 4))
    mc("p_n_s_r", Seq(0, 1, 2, 4))
    t("quality_full") { TextAnalysis.quality(docs) }
    spark.stop()
  }
}
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextAnalysis
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val q = TextAnalysis.quality(docs)
    println(q.queryExecution.optimizedPlan.treeString.take(4000))
    spark.stop()
  }
}
