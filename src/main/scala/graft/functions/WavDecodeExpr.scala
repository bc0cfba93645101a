package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native audio decode — WAV payload → (sample_rate, channels, mono
  * samples) struct, one static call per row inside whole-stage
  * codegen (the [[PngDecodeExpr]] rationale). WAV-signature payloads
  * decode for REAL through [[graft.pipeline.Wav]] and fail loud on
  * corrupt/unsupported content; non-WAV payloads are REJECTED (no
  * fake stand-in here — audio features over fabricated samples would
  * be silently meaningless; route only audio mime types through this
  * expression). */
case class WavDecodeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "wav_decode"
  override def dataType: DataType = WavDecode.Out

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs binary, got ${dt.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WavDecode.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WavDecode.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WavDecode {
  val Out: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("samples", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Called once per row from generated code. */
  def compute(data: Array[Byte]): InternalRow = {
    val (rate, ch, samples) = graft.pipeline.Wav.decode(data)
    new GenericInternalRow(Array[Any](rate, ch, ArrayData.toArrayData(samples)))
  }
}
