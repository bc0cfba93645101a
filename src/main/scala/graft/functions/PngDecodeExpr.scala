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

  /** Called once per row from generated code. Routing by payload
    * signature: PNG → the hand-written [[graft.pipeline.Png]] codec;
    * BMP/GIF/JPEG → the JDK's ImageIO ([[graft.pipeline.Images]]);
    * only signature-less payloads fall back to the marked stand-in.
    * Every claimed format decodes or fails loud. */
  def compute(data: Array[Byte]): InternalRow = {
    val (w, h, px) =
      if (graft.pipeline.Png.isPng(data)) graft.pipeline.Png.decode(data)
      else if (graft.pipeline.Images.hasImageIoCodec(data))
        graft.pipeline.Images.decode(data)
      else graft.pipeline.Multimodal.fakeDecode(data)
    new GenericInternalRow(Array[Any](w, h, ArrayData.toArrayData(px)))
  }
}

/** Frame extraction over a concatenated-PNG stream — the "video"
  * payload shape: each frame's extent is determined exactly by walking
  * its chunk structure (signature, then length-prefixed chunks to
  * IEND), so signature-shaped bytes INSIDE an IDAT payload can never
  * cause a false split. Each frame decodes through the same
  * [[PngDecode]] path, returning an ARRAY of (width, height, pixels)
  * structs to `posexplode` into per-frame rows. Fail-loud contract:
  * the payload must START with a PNG signature, every frame's chunk
  * walk must terminate at IEND within bounds, and every subsequent
  * frame must again start with a signature. */
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

  private def be32(d: Array[Byte], o: Int): Int =
    ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) |
      ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)

  /** End offset (exclusive) of the frame starting at `start`: walk the
    * length-prefixed chunks after the signature until IEND. */
  private def frameEnd(data: Array[Byte], start: Int): Int = {
    var pos = start + 8
    while (true) {
      require(pos + 8 <= data.length, "truncated PNG frame (chunk header)")
      val len = be32(data, pos)
      val ctype = new String(data, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= data.length,
        s"truncated PNG frame (chunk $ctype)")
      pos += 12 + len
      if (ctype == "IEND") return pos
    }
    pos // unreachable
  }

  /** Called once per row from generated code. */
  def compute(data: Array[Byte]): ArrayData = {
    require(sigAt(data, 0),
      "not a PNG frame stream (must start with a PNG signature)")
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var o = 0
    while (o < data.length) {
      require(sigAt(data, o),
        s"corrupt frame stream (no PNG signature at offset $o)")
      val end = frameEnd(data, o)
      rows += (PngDecode.compute(java.util.Arrays.copyOfRange(data, o, end)): Any)
      o = end
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
  }
}
