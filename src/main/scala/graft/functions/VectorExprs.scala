package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector similarity expressions.
  *
  * Why custom Catalyst expressions (the builder brief's escalation
  * path (b)): the two alternatives both fall off the fast path at
  * pair-join scale —
  *   - higher-order functions (`aggregate(zip_with(...))`) evaluate
  *     INTERPRETED, per element, with a fresh lambda frame each row;
  *   - a dim-unrolled `getItem` tree (64 products + adds per side)
  *     blows past codegen's method-size limits on the join's generated
  *     method, so Spark silently reverts the whole stage to
  *     interpreted eval (observed: 5 MiB task binaries, 20 s for a
  *     1 M-pair join that should take < 1 s).
  * A BinaryExpression with a tight generated loop keeps the scoring
  * inside whole-stage codegen at ~3 flops/element regardless of
  * dimension, for any array length.
  */
abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs float/double arrays, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def elemAt(arr: ArrayData, fl: Boolean, i: Int): Double =
    if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
  protected def elemCode(v: String, fl: Boolean): String =
    if (fl) s"(double) $v.getFloat(%I%)" else s"$v.getDouble(%I%)"

  /** Fail-loud input guards: a dimension mismatch or a null element is
    * data corruption — the replaced HOF forms nulled the whole score
    * (silently excluding the row); truncating to min(length) or
    * reading null slots as 0.0 would produce a plausible-but-wrong
    * score. Throwing keeps the repo's fail-loud policy. */
  protected def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${a.numElements()} vs " +
          s"${b.numElements()})")
    n
  }
  protected def checkNull(arr: ArrayData, i: Int): Unit =
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(
        s"$prettyName: null element at index $i")
  /** Generated-code guards (same semantics as above). */
  protected def lenGuardCode(a: String, b: String, n: String): String =
    s"""int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  throw new IllegalArgumentException("$prettyName: vector " +
       |    "dimensions differ (" + $a.numElements() + " vs " +
       |    $b.numElements() + ")");
       |}""".stripMargin
  protected def nullGuardCode(v: String, i: String): String =
    s"""if ($v.isNullAt($i)) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: null element at index " + $i);
       |}""".stripMargin
}

/** dot(a, b) = Σ aᵢbᵢ — index-ordered accumulation (matches the SQL
  * oracle's evaluation order, so comparisons stay bit-stable). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpr {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = checkedLen(a, b)
    var d = 0.0; var i = 0
    while (i < n) {
      checkNull(a, i); checkNull(b, i)
      d += elemAt(a, lf, i) * elemAt(b, rf, i); i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("dot")
      val ga = elemCode(a, isFloat(left)).replace("%I%", i)
      val gb = elemCode(b, isFloat(right)).replace("%I%", i)
      s"""
        |${lenGuardCode(a, b, n)}
        |double $d = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${nullGuardCode(a, i)}
        |  ${nullGuardCode(b, i)}
        |  $d += ($ga) * ($gb);
        |}
        |${ev.value} = $d;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = Σ aᵢbᵢ / (‖a‖‖b‖) over the RAW arrays — DuckDB's
  * list_cosine_similarity formula; no normalized intermediate array is
  * ever built. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpr {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = checkedLen(a, b)
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      checkNull(a, i); checkNull(b, i)
      val x = elemAt(a, lf, i); val y = elemAt(b, rf, i)
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val ga = elemCode(a, isFloat(left)).replace("%I%", i)
      val gb = elemCode(b, isFloat(right)).replace("%I%", i)
      s"""
        |${lenGuardCode(a, b, n)}
        |double $d = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${nullGuardCode(a, i)}
        |  ${nullGuardCode(b, i)}
        |  double $x = $ga; double $y = $gb;
        |  $d += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level cosine similarity (any dimension). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level dot product (any dimension). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level multi-table LSH signatures (see [[LshSignatures]]). */
  def lshSignatures(v: Column, planes: Array[Array[Double]],
                    tables: Int, planesPerTable: Int): Column =
    ColumnBridge.column(LshSignatures(
      ColumnBridge.expression(v), planes, tables, planesPerTable))

  /** Column-level matrix × vector (see [[MatVec]]). */
  def matVec(v: Column, mat: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVec(ColumnBridge.expression(v), mat))

  /** Column-level PQ encoding (see [[PqEncode]]). */
  def pqEncode(nv: Column, books: Array[Array[Array[Double]]],
               dsub: Int): Column = {
    val halfCC = books.map(_.map(c => c.map(x => x * x).sum / 2.0))
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(nv), books, halfCC, dsub))
  }

  /** Column-level ADC sum (see [[PqAdc]]). */
  def pqAdc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

  /** Column-level top-n centroid ids (see [[CentroidTopN]]). */
  def centroidTopN(v: Column, cents: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(CentroidTopN(
      ColumnBridge.expression(v), cents, n))

  /** Column-level top-n centroids by L2 distance rank (see
    * [[CentroidTopNDist]]). */
  def centroidTopNDist(v: Column, cents: Array[Array[Double]],
                       n: Int): Column = {
    val cc = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    ColumnBridge.column(CentroidTopNDist(
      ColumnBridge.expression(v), cents, cc, n))
  }

  /** Column-level multi-cell fine argmin (see [[CellsArgmin]]). */
  def cellsArgmin(v: Column, cells: Column,
                  cellCents: Array[Array[Array[Double]]],
                  cellIds: Array[Array[Int]]): Column = {
    val cellCc = cellCents.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })
    ColumnBridge.column(CellsArgmin(
      ColumnBridge.expression(v), ColumnBridge.expression(cells),
      cellCents, cellCc, cellIds))
  }

  /** Column-level cell-restricted argmin (see [[CellArgmin]]). */
  def cellArgmin(v: Column, cell: Column,
                 cellCents: Array[Array[Array[Double]]],
                 cellIds: Array[Array[Int]]): Column = {
    val cellCc = cellCents.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })
    ColumnBridge.column(CellArgmin(
      ColumnBridge.expression(v), ColumnBridge.expression(cell),
      cellCents, cellCc, cellIds))
  }

  /** Column-level k-centroid argmin (see [[CentroidArgmin]]). */
  def centroidArgmin(v: Column, cents: Array[Array[Double]]): Column = {
    val cc = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    ColumnBridge.column(CentroidArgmin(
      ColumnBridge.expression(v), cents, cc))
  }
}

/** argmin over k centroids: the cluster id j minimizing
  * `cc(j) − 2·(cⱼ·v)` (squared L2 minus the per-row constant `v·v`),
  * ties to the lowest j — one tight k×dim loop per row, inside
  * whole-stage codegen.
  *
  * Why an expression and not a join: the k-means assignment at
  * corpus-scaled k (SemDeDup's k ≈ n/50) previously ran as a
  * broadcast crossJoin — n×k intermediate ROWS through a struct-min
  * aggregation. The sf10 probe measured the blow-up: 200k vectors ×
  * 4000 centroids = 800M rows per assignment pass, >45 min for one
  * query. The same arithmetic as one in-row loop is n rows of k×dim
  * flops with NO shuffle and no row machinery. A k×dim literal TREE
  * (the small-k path) is plan-bloat-bounded (`KmeansLiteralMax`);
  * here the centroid matrix rides along as a single reference object
  * (one plan node at any k), the standard pattern for trained-model
  * scoring.
  *
  * Arithmetic contract (oracle-portable): dots accumulate
  * index-ordered doubles, exactly [[DotProduct]]'s order; `cc` is
  * precomputed on the driver with the same left-fold, so literal,
  * join and argmin paths agree bit-for-bit. */
/** ALL (table, plane) sign-bit LSH signatures in ONE in-row loop:
  * returns array<long> of length `tables`, element t = the table's
  * bucket id (bit j set ⇔ planes(t·planesPerTable + j) · v ≥ 0).
  *
  * Why one expression and not tables×planes [[DotProduct]] columns:
  * each dot is its own 64-iteration generated loop, and 56 of them
  * (8 tables × 7 planes) inline into a single whole-stage method past
  * the JIT's ~8 KB compile limit — the stage silently runs as
  * INTERPRETED bytecode (measured: 8 dot columns over 50k rows =
  * 0.5 s, 56 dots = 26.8 s — 100× off linear). Here the plane matrix
  * rides along as one reference object and the generated code is a
  * fixed-size nested loop — one plan node and a JIT-compilable method
  * at any (k, L), the same pattern as [[CentroidArgmin]].
  *
  * Bit semantics are exactly the historical per-plane column fold:
  * same plane order, same `≥ 0` test, bit j = 1L << j — gated-sf
  * bucket ids are bit-identical (pinned by EngineSpec's LSH recall
  * numbers). */
case class LshSignatures(child: Expression,
                         planes: Array[Array[Double]],
                         tables: Int, planesPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "lsh_signatures"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (planes.length == tables * planesPerTable)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${planes.length} planes != $tables tables × " +
          s"$planesPerTable planes/table")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val fl = isFloat
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L; var j = 0
      while (j < planesPerTable) {
        val p = planes(t * planesPerTable + j)
        if (p.length != n) throw new IllegalArgumentException(
          s"$prettyName: vector dim $n vs plane dim ${p.length}")
        var d = 0.0; var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) throw new IllegalArgumentException(
            s"$prettyName: null element at index $i")
          d += p(i) * (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i))
          i += 1
        }
        if (d >= 0) sig |= 1L << j
        j += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val get = if (isFloat) "(double)%V%.getFloat(%I%)" else "%V%.getDouble(%I%)"
    nullSafeCodeGen(ctx, ev, v => {
      val ps = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val p = ctx.freshName("p")
      val sig = ctx.freshName("sig"); val sigs = ctx.freshName("sigs")
      val elem = get.replace("%V%", v).replace("%I%", i)
      s"""
        |int $n = $v.numElements();
        |long[] $sigs = new long[$tables];
        |for (int $t = 0; $t < $tables; $t++) {
        |  long $sig = 0L;
        |  for (int $j = 0; $j < $planesPerTable; $j++) {
        |    double[] $p = $ps[$t * $planesPerTable + $j];
        |    if ($p.length != $n) {
        |      throw new IllegalArgumentException("$prettyName: vector dim "
        |        + $n + " vs plane dim " + $p.length);
        |    }
        |    double $d = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      if ($v.isNullAt($i)) {
        |        throw new IllegalArgumentException(
        |          "$prettyName: null element at index " + $i);
        |      }
        |      $d += $p[$i] * ($elem);
        |    }
        |    if ($d >= 0) $sig |= 1L << $j;
        |  }
        |  $sigs[$t] = $sig;
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Matrix × vector in ONE in-row loop: returns array<double> of
  * length `mat.length`, element j = mat(j) · v with [[DotProduct]]'s
  * index-ascending accumulation. Same JIT rationale as
  * [[LshSignatures]]: per-row-of-the-matrix DotProduct COLUMNS each
  * generate their own loop and a 32-row projection (the JL sketch)
  * blows the whole-stage method past the JIT compile limit into
  * interpreted bytecode; here the matrix is one reference object and
  * the generated code is a fixed nested loop at any shape. */
case class MatVec(child: Expression, mat: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "mat_vec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val fl = isFloat
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val r = mat(j)
      if (r.length != n) throw new IllegalArgumentException(
        s"$prettyName: vector dim $n vs matrix row dim ${r.length}")
      var d = 0.0; var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
        d += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) * r(i)
        i += 1
      }
      out(j) = d
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = if (isFloat) "(double)%V%.getFloat(%I%)" else "%V%.getDouble(%I%)"
    nullSafeCodeGen(ctx, ev, v => {
      val ms = ctx.addReferenceObj("mat", mat, "double[][]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val r = ctx.freshName("r"); val out = ctx.freshName("out")
      val elem = get.replace("%V%", v).replace("%I%", i)
      s"""
        |int $n = $v.numElements();
        |double[] $out = new double[$ms.length];
        |for (int $j = 0; $j < $ms.length; $j++) {
        |  double[] $r = $ms[$j];
        |  if ($r.length != $n) {
        |    throw new IllegalArgumentException("$prettyName: vector dim "
        |      + $n + " vs matrix row dim " + $r.length);
        |  }
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($v.isNullAt($i)) {
        |      throw new IllegalArgumentException(
        |        "$prettyName: null element at index " + $i);
        |    }
        |    $d += ($elem) * $r[$i];
        |  }
        |  $out[$j] = $d;
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** PQ sub-codes for all `m` subspaces in ONE in-row loop: code j =
  * argmin over the subspace's codebook of ‖sub − c‖², computed as
  * halfCC(j)(c) − sub·c (halfCC = Σc²/2 precomputed on the driver),
  * strict-less argmin so ties keep the LOWEST code — bit-for-bit the
  * negated-struct-sort column formulation it replaces (whose
  * m×ksub inlined dot loops and struct sorts blew the JIT method
  * limit, the [[LshSignatures]] disease). Subspace j reads elements
  * [j·dsub, (j+1)·dsub) of the normalized vector. */
case class PqEncode(child: Expression,
                    books: Array[Array[Array[Double]]],
                    halfCC: Array[Array[Double]], dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double> (normalized), got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = books.length
    if (arr.numElements() != m * dsub) throw new IllegalArgumentException(
      s"$prettyName: vector dim ${arr.numElements()} vs ${m * dsub} " +
        s"(m=$m x dsub=$dsub) — on UnsafeArrayData an out-of-bounds " +
        "getDouble returns garbage silently, so the dim is checked up " +
        "front like the sibling vector expressions")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j); val hcc = halfCC(j)
      var best = Double.PositiveInfinity; var bestC = -1; var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0; var i = 0
        while (i < dsub) {
          d += arr.getDouble(j * dsub + i) * cent(i); i += 1
        }
        val nd = hcc(c) - d
        if (nd < best) { best = nd; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("books", books, "double[][][]")
      val hs = ctx.addReferenceObj("halfCC", halfCC, "double[][]")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val nd = ctx.freshName("nd")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val out = ctx.freshName("out"); val cent = ctx.freshName("cent")
      s"""
        |int $m = $bs.length;
        |if ($v.numElements() != $m * $dsub) {
        |  throw new IllegalArgumentException("$prettyName: vector dim "
        |    + $v.numElements() + " vs " + ($m * $dsub));
        |}
        |int[] $out = new int[$m];
        |for (int $j = 0; $j < $m; $j++) {
        |  double $best = Double.POSITIVE_INFINITY;
        |  int $bestC = -1;
        |  for (int $c = 0; $c < $bs[$j].length; $c++) {
        |    double[] $cent = $bs[$j][$c];
        |    double $d = 0.0;
        |    for (int $i = 0; $i < $dsub; $i++) {
        |      $d += $v.getDouble($j * $dsub + $i) * $cent[$i];
        |    }
        |    double $nd = $hs[$j][$c] - $d;
        |    if ($nd < $best) { $best = $nd; $bestC = $c; }
        |  }
        |  $out[$j] = $bestC;
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Top-`n` centroids by dot similarity in ONE in-row loop: returns
  * array<int> of the n best centroid ids, dot DESCENDING with ties to
  * the LOWEST id — bit-for-bit the negated-struct `sort_array` ranking
  * it replaces (whose per-centroid literal dot structs stop being
  * codegen-able past ~10 centroids, the [[LshSignatures]] disease —
  * and corpus-adaptive IVF wants hundreds of cells). Insertion sort
  * into an n-slot window: candidates iterate id-ascending and replace
  * only on STRICTLY greater dot, so equal dots keep the earlier id. */
case class CentroidTopN(child: Expression,
                        cents: Array[Array[Double]], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "centroid_topn"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (n >= 1 && n <= cents.length) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n=$n out of range for ${cents.length} centroids")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val fl = isFloat
    val bestD = Array.fill(n)(Double.NegativeInfinity)
    val bestC = Array.fill(n)(-1)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != dim) throw new IllegalArgumentException(
        s"$prettyName: vector dim $dim vs centroid dim ${cent.length}")
      var d = 0.0; var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
        d += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) * cent(i)
        i += 1
      }
      if (d > bestD(n - 1)) {
        var p = n - 1
        while (p > 0 && d > bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d; bestC(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = if (isFloat) "(double)%V%.getFloat(%I%)" else "%V%.getDouble(%I%)"
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val dim = ctx.freshName("dim"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val p = ctx.freshName("p"); val cent = ctx.freshName("cent")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val elem = get.replace("%V%", v).replace("%I%", i)
      s"""
        |int $dim = $v.numElements();
        |double[] $bestD = new double[$n];
        |int[] $bestC = new int[$n];
        |java.util.Arrays.fill($bestD, Double.NEGATIVE_INFINITY);
        |java.util.Arrays.fill($bestC, -1);
        |for (int $c = 0; $c < $cs.length; $c++) {
        |  double[] $cent = $cs[$c];
        |  if ($cent.length != $dim) {
        |    throw new IllegalArgumentException("$prettyName: vector dim "
        |      + $dim + " vs centroid dim " + $cent.length);
        |  }
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $dim; $i++) {
        |    if ($v.isNullAt($i)) {
        |      throw new IllegalArgumentException(
        |        "$prettyName: null element at index " + $i);
        |    }
        |    $d += ($elem) * $cent[$i];
        |  }
        |  if ($d > $bestD[$n - 1]) {
        |    int $p = $n - 1;
        |    while ($p > 0 && $d > $bestD[$p - 1]) {
        |      $bestD[$p] = $bestD[$p - 1]; $bestC[$p] = $bestC[$p - 1]; $p--;
        |    }
        |    $bestD[$p] = $d; $bestC[$p] = $c;
        |  }
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** ADC score: Σⱼ lut(j)(codes(j)) — the PQ scan's per-candidate sum
  * of table lookups, as a tight generated loop over two array COLUMNS
  * (codes from the scan, the query's lookup table from the broadcast
  * row). Replaces an `aggregate(zip_with(...))` pair of higher-order
  * functions that evaluate interpreted per element on every
  * (candidate × query) row. Left-fold order is j ascending, exactly
  * the HOF's. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<int>, array<array<double>>), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    var acc = 0.0; var j = 0
    val m = codes.numElements()
    while (j < m) {
      acc += lut.getArray(j).getDouble(codes.getInt(j)); j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, lut) => {
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      s"""
        |double $acc = 0.0;
        |for (int $j = 0; $j < $cs.numElements(); $j++) {
        |  $acc += $lut.getArray($j).getDouble($cs.getInt($j));
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CentroidArgmin(child: Expression,
                          cents: Array[Array[Double]],
                          cc: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "centroid_argmin"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = Double.PositiveInfinity; var bestC = -1; var j = 0
    while (j < cents.length) {
      val c = cents(j)
      if (c.length != n)
        throw new IllegalArgumentException(
          s"$prettyName: vector dim $n vs centroid dim ${c.length}")
      var d = 0.0; var i = 0
      while (i < n) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"$prettyName: null element at index $i")
        d += c(i) * arr.getDouble(i); i += 1
      }
      val dist = cc(j) - 2.0 * d
      if (dist < best) { best = dist; bestC = j }
      j += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val c = ctx.freshName("c"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      s"""
        |int $n = $v.numElements();
        |double $best = Double.POSITIVE_INFINITY;
        |int $bestC = -1;
        |for (int $j = 0; $j < $cs.length; $j++) {
        |  double[] $c = $cs[$j];
        |  if ($c.length != $n) {
        |    throw new IllegalArgumentException("$prettyName: vector dim "
        |      + $n + " vs centroid dim " + $c.length);
        |  }
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($v.isNullAt($i)) {
        |      throw new IllegalArgumentException(
        |        "$prettyName: null element at index " + $i);
        |    }
        |    $d += $c[$i] * $v.getDouble($i);
        |  }
        |  double $dist = $ccRef[$j] - 2.0 * $d;
        |  if ($dist < $best) { $best = $dist; $bestC = $j; }
        |}
        |${ev.value} = $bestC;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Cell-restricted argmin — the FINE step of a two-level (coarse
  * cell → in-cell argmin) quantizer assignment in ONE in-row loop:
  * given the row's coarse `cell` (an index into `cellCents`), find
  * the in-cell centroid minimizing `cc − 2·(c·v)` (strict-less, so
  * ties keep the LOWEST in-cell position) and return its GLOBAL id
  * from `cellIds`. In-cell centroid lists are id-ascending, so the
  * tie order equals "lowest global fine cluster id" — the exact rank
  * the DuckDB oracle mirrors with (dist ASC, fine id ASC).
  *
  * Why one expression: the two-level SemDeDup assignment needs a
  * DIFFERENT centroid subset per row (its coarse cell's children); a
  * per-cell filter+union plan re-scans the corpus once per cell, and
  * a when-chain of per-cell [[CentroidArgmin]]s re-creates the JIT
  * method-limit disease past ~10 cells. Here the whole nested
  * centroid table rides as one reference object and each row runs a
  * single tight (cellSize × dim) loop — the same cure measured for
  * [[LshSignatures]]. Reference scale story: SURVEY §7.3 step 9
  * (SemDeDup); the flat argmin at k = n/50 is Θ(n²/50) by
  * construction, this two-level form is n·(√k + k/√k). */
case class CellArgmin(left: Expression, right: Expression,
                      cellCents: Array[Array[Array[Double]]],
                      cellCc: Array[Array[Double]],
                      cellIds: Array[Array[Int]])
    extends BinaryExpression {
  override def prettyName: String = "cell_argmin"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        if (cellCents.forall(_.nonEmpty))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: a cell with no centroids can never assign")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<double>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, cellV: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cell = cellV.asInstanceOf[Int]
    if (cell < 0 || cell >= cellCents.length)
      throw new IllegalArgumentException(
        s"$prettyName: cell $cell out of range [0, ${cellCents.length})")
    val cents = cellCents(cell); val ccs = cellCc(cell)
    val n = arr.numElements()
    var best = Double.PositiveInfinity; var bestJ = -1; var j = 0
    while (j < cents.length) {
      val c = cents(j)
      if (c.length != n) throw new IllegalArgumentException(
        s"$prettyName: vector dim $n vs centroid dim ${c.length}")
      var d = 0.0; var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
        d += c(i) * arr.getDouble(i); i += 1
      }
      val dist = ccs(j) - 2.0 * d
      if (dist < best) { best = dist; bestJ = j }
      j += 1
    }
    cellIds(cell)(bestJ)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val cs = ctx.addReferenceObj("cellCents", cellCents, "double[][][]")
      val ccRef = ctx.addReferenceObj("cellCc", cellCc, "double[][]")
      val ids = ctx.addReferenceObj("cellIds", cellIds, "int[][]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val c = ctx.freshName("c"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestJ = ctx.freshName("bestJ")
      val cents = ctx.freshName("cents"); val ccs = ctx.freshName("ccs")
      s"""
        |if ($cell < 0 || $cell >= $cs.length) {
        |  throw new IllegalArgumentException("$prettyName: cell "
        |    + $cell + " out of range [0, " + $cs.length + ")");
        |}
        |double[][] $cents = $cs[$cell];
        |double[] $ccs = $ccRef[$cell];
        |int $n = $v.numElements();
        |double $best = Double.POSITIVE_INFINITY;
        |int $bestJ = -1;
        |for (int $j = 0; $j < $cents.length; $j++) {
        |  double[] $c = $cents[$j];
        |  if ($c.length != $n) {
        |    throw new IllegalArgumentException("$prettyName: vector dim "
        |      + $n + " vs centroid dim " + $c.length);
        |  }
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($v.isNullAt($i)) {
        |      throw new IllegalArgumentException(
        |        "$prettyName: null element at index " + $i);
        |    }
        |    $d += $c[$i] * $v.getDouble($i);
        |  }
        |  double $dist = $ccs[$j] - 2.0 * $d;
        |  if ($dist < $best) { $best = $dist; $bestJ = $j; }
        |}
        |${ev.value} = $ids[$cell][$bestJ];
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`n` centroids by k-means DISTANCE rank (`cc − 2·(c·v)`
  * ASCENDING, ties to the LOWEST id) — the L2-consistent sibling of
  * the dot-ranking [[CentroidTopN]], for COARSE-CELL MULTI-PROBE in
  * the two-level SemDeDup assignment: the r17 loss probe measured
  * top-1 coarse routing at ~20% per-vector misroute on the
  * weakly-clustered corpus, squaring into a 0.81 → 0.52 planted-pair
  * recall drop — probing the P nearest cells recovers the flat
  * ceiling at P·√k extra flops/row. Same insertion-window shape as
  * CentroidTopN with the comparison inverted (strict less), so equal
  * distances keep the earlier centroid id. */
case class CentroidTopNDist(child: Expression,
                            cents: Array[Array[Double]],
                            cc: Array[Double], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "centroid_topn_dist"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (n >= 1 && n <= cents.length) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n=$n out of range for ${cents.length} centroids")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val bestD = Array.fill(n)(Double.PositiveInfinity)
    val bestC = Array.fill(n)(-1)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      if (cent.length != dim) throw new IllegalArgumentException(
        s"$prettyName: vector dim $dim vs centroid dim ${cent.length}")
      var d = 0.0; var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
        d += arr.getDouble(i) * cent(i); i += 1
      }
      val dist = cc(c) - 2.0 * d
      if (dist < bestD(n - 1)) {
        var p = n - 1
        while (p > 0 && dist < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = dist; bestC(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
      val dim = ctx.freshName("dim"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val p = ctx.freshName("p"); val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      s"""
        |int $dim = $v.numElements();
        |double[] $bestD = new double[$n];
        |int[] $bestC = new int[$n];
        |java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
        |java.util.Arrays.fill($bestC, -1);
        |for (int $c = 0; $c < $cs.length; $c++) {
        |  double[] $cent = $cs[$c];
        |  if ($cent.length != $dim) {
        |    throw new IllegalArgumentException("$prettyName: vector dim "
        |      + $dim + " vs centroid dim " + $cent.length);
        |  }
        |  double $d = 0.0;
        |  for (int $i = 0; $i < $dim; $i++) {
        |    if ($v.isNullAt($i)) {
        |      throw new IllegalArgumentException(
        |        "$prettyName: null element at index " + $i);
        |    }
        |    $d += $v.getDouble($i) * $cent[$i];
        |  }
        |  double $dist = $ccRef[$c] - 2.0 * $d;
        |  if ($dist < $bestD[$n - 1]) {
        |    int $p = $n - 1;
        |    while ($p > 0 && $dist < $bestD[$p - 1]) {
        |      $bestD[$p] = $bestD[$p - 1]; $bestC[$p] = $bestC[$p - 1]; $p--;
        |    }
        |    $bestD[$p] = $dist; $bestC[$p] = $c;
        |  }
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Fine argmin over the UNION of several probed cells' children (the
  * multi-probe companion of [[CellArgmin]]): rank is (dist ASC,
  * GLOBAL fine id ASC) across every centroid belonging to any probed
  * cell — exactly the (dist, fid) window rank the DuckDB oracle
  * applies over the top-P cell join, so ties agree even when the
  * probed cells interleave global ids. */
case class CellsArgmin(left: Expression, right: Expression,
                       cellCents: Array[Array[Array[Double]]],
                       cellCc: Array[Array[Double]],
                       cellIds: Array[Array[Int]])
    extends BinaryExpression {
  override def prettyName: String = "cells_argmin"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        if (cellCents.forall(_.nonEmpty))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName: a cell with no centroids can never assign")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<double>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, cellsV: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cells = cellsV.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = Double.PositiveInfinity; var bestFid = Int.MaxValue
    var ci = 0
    while (ci < cells.numElements()) {
      val cell = cells.getInt(ci)
      if (cell < 0 || cell >= cellCents.length)
        throw new IllegalArgumentException(
          s"$prettyName: cell $cell out of range [0, ${cellCents.length})")
      val cents = cellCents(cell); val ccs = cellCc(cell)
      val ids = cellIds(cell)
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        if (c.length != n) throw new IllegalArgumentException(
          s"$prettyName: vector dim $n vs centroid dim ${c.length}")
        var d = 0.0; var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) throw new IllegalArgumentException(
            s"$prettyName: null element at index $i")
          d += c(i) * arr.getDouble(i); i += 1
        }
        val dist = ccs(j) - 2.0 * d
        if (dist < best || (dist == best && ids(j) < bestFid)) {
          best = dist; bestFid = ids(j)
        }
        j += 1
      }
      ci += 1
    }
    if (bestFid == Int.MaxValue) throw new IllegalArgumentException(
      s"$prettyName: empty probe set")
    bestFid
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cells) => {
      val cs = ctx.addReferenceObj("cellCents", cellCents, "double[][][]")
      val ccRef = ctx.addReferenceObj("cellCc", cellCc, "double[][]")
      val idsRef = ctx.addReferenceObj("cellIds", cellIds, "int[][]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val c = ctx.freshName("c"); val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bestFid = ctx.freshName("bestFid")
      val ci = ctx.freshName("ci"); val cell = ctx.freshName("cell")
      val cents = ctx.freshName("cents"); val ccs = ctx.freshName("ccs")
      val ids = ctx.freshName("ids")
      s"""
        |int $n = $v.numElements();
        |double $best = Double.POSITIVE_INFINITY;
        |int $bestFid = Integer.MAX_VALUE;
        |for (int $ci = 0; $ci < $cells.numElements(); $ci++) {
        |  int $cell = $cells.getInt($ci);
        |  if ($cell < 0 || $cell >= $cs.length) {
        |    throw new IllegalArgumentException("$prettyName: cell "
        |      + $cell + " out of range [0, " + $cs.length + ")");
        |  }
        |  double[][] $cents = $cs[$cell];
        |  double[] $ccs = $ccRef[$cell];
        |  int[] $ids = $idsRef[$cell];
        |  for (int $j = 0; $j < $cents.length; $j++) {
        |    double[] $c = $cents[$j];
        |    if ($c.length != $n) {
        |      throw new IllegalArgumentException("$prettyName: vector dim "
        |        + $n + " vs centroid dim " + $c.length);
        |    }
        |    double $d = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      if ($v.isNullAt($i)) {
        |        throw new IllegalArgumentException(
        |          "$prettyName: null element at index " + $i);
        |      }
        |      $d += $c[$i] * $v.getDouble($i);
        |    }
        |    double $dist = $ccs[$j] - 2.0 * $d;
        |    if ($dist < $best || ($dist == $best && $ids[$j] < $bestFid)) {
        |      $best = $dist; $bestFid = $ids[$j];
        |    }
        |  }
        |}
        |if ($bestFid == Integer.MAX_VALUE) {
        |  throw new IllegalArgumentException("$prettyName: empty probe set");
        |}
        |${ev.value} = $bestFid;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
