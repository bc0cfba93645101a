package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 reference-object expressions (LshSignatures, MatVec,
  * PqEncode, PqAdc, CentroidTopN) replaced per-plane/per-centroid
  * expression COLUMNS bit-for-bit — this spec pins that contract with
  * driver-side recomputations of the exact arithmetic (index-ascending
  * double accumulation, strict-less argmin with lowest-id ties,
  * left-fold ADC), over float vectors incl. sign/tie edge cases. */
class VectorExprParitySpec extends AnyFunSuite {
  import graft.functions.VectorExprs
  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  private val dim = 8
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0L until 64L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  private def dotD(v: Seq[Float], p: Seq[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < dim) { d += v(i).toDouble * p(i); i += 1 }
    d
  }

  test("LshSignatures equals the per-plane sign-bit fold") {
    val rnd = new scala.util.Random(3)
    val tables = 5; val planes = 6
    val mat = Array.fill(tables * planes)(
      Array.fill(dim)(rnd.nextGaussian()))
    val got = df.select(col("vec_id"),
        VectorExprs.lshSignatures(col("embedding"), mat, tables, planes)
          .as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = (0 until tables).map { t =>
        (0 until planes).foldLeft(0L) { (sig, j) =>
          if (dotD(v, mat(t * planes + j).toIndexedSeq) >= 0)
            sig | (1L << j)
          else sig
        }
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("MatVec equals row-wise dots in index order") {
    val rnd = new scala.util.Random(11)
    val mat = Array.fill(17)(Array.fill(dim)(rnd.nextGaussian()))
    val got = df.select(col("vec_id"),
        VectorExprs.matVec(col("embedding"), mat).as("mv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = mat.toSeq.map(r => dotD(v, r.toIndexedSeq))
      assert(got(id) == want, s"vec $id")
    }
  }

  test("CentroidTopN ranks dot-descending with lowest-id ties") {
    val rnd = new scala.util.Random(23)
    val cents = Array.fill(30)(Array.fill(dim)(rnd.nextGaussian()))
    // duplicate centroid → an exact tie; the EARLIER id must win
    cents(20) = cents(4).clone()
    val n = 6
    val got = df.select(col("vec_id"),
        VectorExprs.centroidTopN(col("embedding"), cents, n).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val scored = cents.toSeq.zipWithIndex
        .map { case (c, i) => (dotD(v, c.toIndexedSeq), i) }
      val want = scored.sortBy { case (d, i) => (-d, i) }.take(n).map(_._2)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("PqEncode equals the strict-less argmin over halfCC - sub.c") {
    val rnd = new scala.util.Random(31)
    val m = 4; val dsub = dim / m; val ksub = 5
    val books = Array.fill(m)(Array.fill(ksub)(
      Array.fill(dsub)(rnd.nextGaussian())))
    val nrm = df.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("nv"))
    val got = nrm.select(col("vec_id"),
        VectorExprs.pqEncode(col("nv"), books, dsub).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = (0 until m).map { j =>
        val sub = v.slice(j * dsub, (j + 1) * dsub).map(_.toDouble)
        val nds = books(j).toSeq.zipWithIndex.map { case (c, i) =>
          val hcc = c.map(x => x * x).sum / 2.0
          var d = 0.0; var t = 0
          while (t < dsub) { d += sub(t) * c(t); t += 1 }
          (hcc - d, i)
        }
        nds.minBy { case (nd, i) => (nd, i) }._2
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("CellArgmin equals the cell-restricted strict-less argmin " +
      "with the global id remap") {
    val rnd = new scala.util.Random(41)
    // 3 cells of unequal sizes; global fine ids deliberately
    // non-contiguous per cell, ascending within each
    val cellIds = Array(Array(0, 3, 7), Array(1, 4), Array(2, 5, 6, 8))
    val cents = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian()))
    // duplicate centroid INSIDE one cell → exact tie; lowest global
    // id (the earlier in-cell position) must win
    cents(7) = cents(3).clone()
    val cellCents = cellIds.map(_.map(cents(_)))
    val dv = df.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    (0 until 3).foreach { cell =>
      val got = dv.select(col("vec_id"),
          VectorExprs.cellArgmin(col("v"), lit(cell), cellCents, cellIds)
            .as("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vecs.foreach { case (id, v) =>
        val want = cellIds(cell).zip(cellCents(cell)).map {
          case (fid, c) =>
            val cc = c.foldLeft(0.0)((a, x) => a + x * x)
            (cc - 2.0 * dotD(v, c.toIndexedSeq), fid)
        }.minBy(identity)._2
        assert(got(id) == want, s"vec $id cell $cell")
      }
    }
  }

  test("CentroidTopNDist ranks cc-2vc ascending with lowest-id ties") {
    val rnd = new scala.util.Random(43)
    val cents = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    cents(15) = cents(6).clone() // exact tie → earlier id must rank first
    val n = 5
    val dv = df.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val got = dv.select(col("vec_id"),
        VectorExprs.centroidTopNDist(col("v"), cents, n).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = cents.toSeq.zipWithIndex.map { case (c, i) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        (cc - 2.0 * dotD(v, c.toIndexedSeq), i)
      }.sorted.take(n).map(_._2)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("CellsArgmin equals the (dist, global fid) argmin over the " +
      "probed cells' union") {
    val rnd = new scala.util.Random(47)
    val cellIds = Array(Array(0, 3, 7), Array(1, 4), Array(2, 5, 6, 8))
    val cents = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian()))
    // duplicate ACROSS probed cells: fid 7 (cell 0) vs fid 4 (cell 1)
    // — the LOWER GLOBAL fid must win even though its cell is probed
    // second below
    cents(7) = cents(4).clone()
    val cellCents = cellIds.map(_.map(cents(_)))
    val dv = df.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val probeSets = Seq(Seq(0, 1), Seq(2, 0), Seq(1, 2), Seq(0, 1, 2))
    probeSets.foreach { ps =>
      val got = dv.select(col("vec_id"),
          VectorExprs.cellsArgmin(col("v"),
            array(ps.map(lit): _*), cellCents, cellIds).as("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vecs.foreach { case (id, v) =>
        val want = ps.flatMap(cell => cellIds(cell).map { fid =>
          val c = cents(fid)
          val cc = c.foldLeft(0.0)((a, x) => a + x * x)
          (cc - 2.0 * dotD(v, c.toIndexedSeq), fid)
        }).minBy(identity)._2
        assert(got(id) == want, s"vec $id probes $ps")
      }
    }
  }

  test("PqEncode rejects a vector whose dim is not m*dsub") {
    val rnd = new scala.util.Random(37)
    val m = 4; val dsub = dim / m; val ksub = 3
    val books = Array.fill(m)(Array.fill(ksub)(
      Array.fill(dsub)(rnd.nextGaussian())))
    // a too-short vector must fail loud — on UnsafeArrayData an
    // out-of-bounds getDouble silently returns garbage codes
    val short = df.select(col("vec_id"),
      transform(slice(col("embedding"), 1, dim - 2),
        x => x.cast("double")).as("nv"))
    val e = intercept[Exception] {
      short.select(VectorExprs.pqEncode(col("nv"), books, dsub)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("vector dim")), e.toString)
  }

  test("PqAdc equals the j-ascending lookup fold") {
    val rows = Seq(
      (Seq(0, 2, 1), Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0),
        Seq(7.0, 8.0, 9.0))),
      (Seq(2, 0, 0), Seq(Seq(0.5, -1.0, 2.5), Seq(3.5, 0.0, -2.0),
        Seq(1.0, 1.0, 1.0))))
    val got = rows.toDF("codes", "lut")
      .select(VectorExprs.pqAdc(col("codes"), col("lut")).as("adc"))
      .collect().map(_.getDouble(0)).toSeq
    val want = rows.map { case (codes, lut) =>
      codes.zipWithIndex.map { case (c, j) => lut(j)(c) }.sum }
    assert(got == want)
  }
}
