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
