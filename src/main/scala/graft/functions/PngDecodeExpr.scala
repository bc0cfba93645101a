package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native image decode — binary payload → (width, height, grayscale
  * pixels) struct, one static call per row.
  *
  * Why a custom expression (escalation path (b), the [[GramRunStats]]
  * rationale): the first decode implementation routed through
  * `DataFrame.rdd.mapPartitions`, which exits Tungsten — every row
  * pays InternalRow→Row conversion, the payload bytes copy out of the
  * columnar batch, and the surrounding projection loses whole-stage
  * codegen. As an expression the decode stays inside the generated
  * loop: bytes in, struct out, no deserialization boundary, and
  * column pruning still guarantees metadata-only queries never touch
  * `data`.
  *
  * Decode routing matches [[graft.pipeline.Multimodal.decode]]'s
  * contract: PNG-signature payloads go through the real
  * [[graft.pipeline.Png.decode]] (fail-loud on corrupt/unsupported
  * PNGs); anything else falls back to the marked deterministic
  * stand-in ([[graft.pipeline.Multimodal.fakeDecode]]).
  */
case class PngDecodeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "png_decode"
  override def dataType: DataType = PngDecode.Out

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PngDecode.compute(v.asInstanceOf[Array[Byte]])

  // one static call per row — the codec lives in compiled Scala, the
  // row stays inside the surrounding whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PngDecode.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PngDecode {
  val Out: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Called once per row from generated code. */
  def compute(data: Array[Byte]): InternalRow = {
    val (w, h, px) =
      if (graft.pipeline.Png.isPng(data)) graft.pipeline.Png.decode(data)
      else graft.pipeline.Multimodal.fakeDecode(data)
    new GenericInternalRow(Array[Any](w, h, ArrayData.toArrayData(px)))
  }
}

/** Frame extraction over a concatenated-PNG stream — the "video"
  * payload shape: signature-scan splits the byte stream into frames,
  * each decoded by the same [[PngDecode]] path, returning an ARRAY of
  * (width, height, pixels) structs to `posexplode` into per-frame
  * rows. Fail-loud contract: the payload must START with a PNG
  * signature (a stream that merely contains one somewhere is
  * corrupt), and every frame decodes or throws. */
case class PngFramesExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "png_frames"
  override def dataType: DataType =
    ArrayType(PngDecode.Out, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PngFrames.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PngFrames.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PngFrames {
  private val Sig =
    Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def sigAt(d: Array[Byte], o: Int): Boolean =
    o + 8 <= d.length && (0 until 8).forall(i => (d(o + i) & 0xff) == Sig(i))

  /** Called once per row from generated code. */
  def compute(data: Array[Byte]): ArrayData = {
    require(sigAt(data, 0),
      "not a PNG frame stream (must start with a PNG signature)")
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var o = 8
    while (o + 8 <= data.length) {
      if (sigAt(data, o)) { starts += o; o += 8 } else o += 1
    }
    val ends = starts.drop(1) :+ data.length
    val rows: Array[Any] = starts.zip(ends).map { case (a, b) =>
      PngDecode.compute(java.util.Arrays.copyOfRange(data, a, b)): Any
    }.toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}
