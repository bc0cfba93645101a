package graft

import graft.functions.GramRunStats
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the native [[GramRunStats]] expression: random
  * token arrays through the REAL Spark expression vs an independent
  * plain-Scala reference of the same definitions. Guards the custom
  * codegen path against drift — every repetition/entropy signal
  * derives from these eight numbers. */
class RunStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session

  private case class Ref(n: Int, nRuns: Int, maxRun: Int, maxElem: String,
                         mass: Long, dupMass: Long, dupCount: Long,
                         entropy: Double)

  /** UTF-8 binary order — the expression compares UTF8String bytes,
    * which is CODE POINT order. Java String ordering compares UTF-16
    * code units, which sorts supplementary-plane tokens (surrogates,
    * 0xD800-0xDFFF) BELOW BMP chars in U+E000..U+FFFF — the reference
    * must not inherit that divergence. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Code points, not UTF-16 code units — matches UTF8String.numChars
    * (an astral char is one char of mass, not two). */
  private def cps(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Reference implementation: group-by counts + explicit formulas —
    * deliberately a DIFFERENT shape from the expression's sorted-run
    * scan. */
  private def ref(tokens: Seq[String], n: Int): Ref = {
    val grams = tokens.sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSeq
    val cnt = grams.size
    val byGram = grams.groupBy(identity).view.mapValues(_.size).toMap
    val maxRun = if (byGram.isEmpty) 0 else byGram.values.max
    val maxElem =
      if (byGram.isEmpty) ""
      else byGram.filter(_._2 == maxRun).keys.toSeq.sortWith(utf8Lt).head
    val dup = byGram.filter(_._2 > 1)
    val ent =
      if (cnt == 0) 0.0
      else -byGram.toSeq.sortWith((a, b) => utf8Lt(a._1, b._1))
        .map { case (_, c) =>
          val p = c.toDouble / cnt
          p * (math.log(p) / math.log(2.0))
        }.sum
    Ref(cnt, byGram.size, maxRun, maxElem,
      byGram.map { case (g, c) => cps(g) * c }.sum,
      dup.map { case (g, c) => cps(g) * c }.sum,
      dup.values.map(_.toLong).sum, ent)
  }

  test("native run stats match an independent reference on random corpora") {
    import spark.implicits._
    // small vocabulary forces collisions/runs; include multi-char and
    // unicode tokens for the char-mass arithmetic. "😀ab" (astral,
    // 2 UTF-16 units for 1 code point) + "ﬀ" (U+FB00) pin the
    // code-point-vs-code-unit divergence in BOTH mass and ordering:
    // UTF-16 sorts "😀ab" < "ﬀ" (surrogate units), code points the
    // reverse — the tie-break and entropy order must take the latter
    val token = Gen.oneOf("a", "b", "ab", "xyz", "中文", "q1", "😀ab", "ﬀ")
    val docGen = Gen.chooseNum(0, 40).flatMap(Gen.listOfN(_, token))
    val docs = Gen.listOfN(300, docGen).sample.get
    val df = docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "ts")
    for (n <- Seq(1, 2, 3)) {
      val got = df.select(col("id"), GramRunStats.of(col("ts"), n).as("r"))
        .select("id", "r.*").collect()
        .map(r => r.getLong(0) -> Ref(r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getDouble(8))).toMap
      docs.zipWithIndex.foreach { case (ts, i) =>
        val want = ref(ts, n)
        val g = got(i.toLong)
        // entropy: both sides sum the same terms in ascending-gram
        // order, so exact equality is expected (and holds); keep a
        // 1e-12 guard against future summation-order changes
        assert(math.abs(g.entropy - want.entropy) < 1e-12 &&
          g.copy(entropy = 0) == want.copy(entropy = 0),
          s"doc $i n=$n: got $g want $want (tokens=$ts)")
      }
    }
  }
}
