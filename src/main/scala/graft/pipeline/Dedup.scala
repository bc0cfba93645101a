package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design: the only all-pairs computation (`jaccardPairs`) joins
  * through the inverted shingle index (pairs share ≥1 shingle), never
  * a cross join; MinHash/SimHash replace it with band-bucket joins
  * whose candidate sets are tiny, which is the 100 TB path.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on the content digest; keeps the lowest
    * id as the canonical representative. One shuffle on the digest. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))

  /** Inverted index: (doc_id, shingle), distinct. */
  def shingleIndex(docs: DataFrame, n: Int,
                   textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("sh"))

  /** Exact n-gram Jaccard near-dup pairs (j >= tau). Intersections come
    * from a self-join on the inverted index — only docs sharing a
    * shingle ever meet. Frequent shingles (stopword bigrams) are the
    * skew risk at scale; cap them via maxDocFreq (drop shingles in more
    * than that fraction-free count of docs — standard df-pruning). */
  def jaccardPairs(docs: DataFrame, n: Int, tau: Double,
                   maxDocFreq: Option[Long] = None,
                   textCol: String = "text"): DataFrame = {
    val idx0 = shingleIndex(docs, n, textCol)
    val idx = maxDocFreq.fold(idx0) { cap =>
      val hot = idx0.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") > cap).select("sh")
      idx0.join(hot, Seq("sh"), "left_anti")
    }
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = idx.alias("a"); val b = idx.alias("b")
    val inter = a.join(b,
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jaccard") >= tau)
      .select("d1", "d2", "jaccard")
  }

  // MinHash: h_i(x) = (a_i * x + b_i) mod p over 64-bit shingle hashes.
  private val MersennePrime = 2305843009213693951L // 2^61 - 1
  private def hashParams(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)(
      (math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
        math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** MinHash signatures: one row per doc, `numHashes` min-hash values.
    * Computed as one grouped aggregation over the inverted index (no
    * per-doc loops; map-side partial mins make the shuffle tiny). */
  def minhashSignatures(docs: DataFrame, n: Int, numHashes: Int,
                        textCol: String = "text"): DataFrame = {
    val idx = shingleIndex(docs, n, textCol)
      .select(col("doc_id"), xxhash64(col("sh")).as("x"))
    // multiplication overflows 64-bit for large a*x — do it in decimal
    // then mod (load-bearing: plain long arithmetic would wrap)
    val aggs = hashParams(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(
        (col("x").cast("decimal(38,0)") * lit(a) + lit(b))
          .cast("decimal(38,0)"),
        lit(MersennePrime).cast("decimal(38,0)")).cast("long")).as(s"mh_$i")
    }
    idx.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: band the signatures, bucket-join,
    * then verify candidates with EXACT Jaccard (so precision is 1.0 and
    * only recall depends on the banding). bands*rowsPerBand must equal
    * numHashes. */
  def minhashLsh(docs: DataFrame, n: Int = 2, numHashes: Int = 128,
                 bands: Int = 32, tau: Double = 0.8,
                 textCol: String = "text"): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")
    val sig = minhashSignatures(docs, n, numHashes, textCol)
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * rows until (bnd + 1) * rows)
          .map(i => col(s"mh_$i")): _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bh"))
    val l = buckets.alias("l"); val r = buckets.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    // verify: exact jaccard on the candidate pairs only
    jaccardPairs(docs, n, tau, textCol = textCol)
      .join(candidates, Seq("d1", "d2"), "left_semi")
  }

  /** 64-bit SimHash fingerprints: per bit, the sign of the sum of ±1
    * votes from each distinct token's hash. One grouped agg. */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val idx = docs.select(col("doc_id"),
        explode(TextAnalysis.shingles(col(textCol), 1)).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1))
        .as(s"bit_$i")
    }
    val votes = idx.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"bit_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming,
    * blocked on 16-bit chunks (pigeonhole: distance ≤3 ⇒ at least one
    * of 4 chunks identical) so the join is bucketed, never all-pairs. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text"): DataFrame = {
    val fps = simhash(docs, textCol)
    val chunks = (0 until 4).map(i => struct(lit(i).as("chunk"),
      shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("ck")))
    val blocked = fps.select(col("doc_id"), col("simhash"),
        explode(array(chunks: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk"), col("c.ck"))
    val l = blocked.alias("l"); val r = blocked.alias("r")
    l.join(r, col("l.chunk") === col("r.chunk") &&
        col("l.ck") === col("r.ck") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash")))
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs. Exact variant: inverted through
    * nothing — a plain self-join, quadratic; use only when one side is
    * filtered. The scale path is [[Similarity.lshBuckets]] blocking. */
  def embeddingDupPairs(emb: DataFrame, tau: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"),
      Similarity.normalized(col("embedding")).as("v"))
    val a = withNorm.alias("a"); val b = withNorm.alias("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        Similarity.dot(col("a.v"), col("b.v")).as("cosine"))
      .where(col("cosine") >= tau)
  }
}
