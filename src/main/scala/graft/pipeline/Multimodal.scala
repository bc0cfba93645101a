package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary) columns for training-data pipelines — the
  * FileInfoton surface (reference Infoton.scala:335-439: binary
  * payload + mimeType + length, blobs held in a separate zstore K/V,
  * ZStore.scala:33-95).
  *
  * Mirroring that architecture, payloads live in a CONTENT table
  * `(path, mimeType, dataLength, sha256, data: binary)` separate from
  * the infoton index — at 100 TB the content table is parquet with a
  * large row-group binary column (or pointers into an object store),
  * partitioned by path prefix like everything else, and metadata-only
  * queries never deserialize a single payload byte (column pruning).
  *
  * Decode / feature-extract are structured as streaming per-partition
  * batch transforms (`mapPartitions` over an iterator — one payload in
  * flight per task, the batch shape a real codec needs). The codec
  * itself is a clearly marked deterministic STUB: this container has
  * no image/audio libraries, so `decodeStub` derives fake fixed-shape
  * "pixels" from the payload bytes. Swapping in a real decoder changes
  * ONLY the marked function — schema, partitioning and batch shape
  * stay.
  */
object Multimodal {

  /** Build the content store from the documents table, using the text
    * bytes as the stand-in payload. */
  def contentStore(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("/documents/"), col("doc_id").cast("string")).as("path"),
      lit("application/octet-stream").as("mimeType"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("dataLength"),
      sha2(encode(col("text"), "UTF-8"), 256).as("sha256"),
      encode(col("text"), "UTF-8").as("data"))

  val DecodedSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixels", ArrayType(FloatType))))

  /** ==== STUB ====  Deterministic fake decoder: derives an 8×8
    * single-channel "image" from the payload bytes (xorshift over a
    * seed hash). A real implementation would run an image codec over
    * `data` HERE and nowhere else. */
  private def fakeDecode(data: Array[Byte]): (Int, Int, Array[Float]) = {
    var seed = data.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    val px = Array.ofDim[Float](64)
    var i = 0
    while (i < 64) {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      px(i) = ((seed & 0xFF).toInt) / 255.0f
      i += 1
    }
    (8, 8, px)
  }

  /** Decode payloads partition-by-partition (streaming iterator — the
    * shape a real codec plugs into). */
  def decode(spark: SparkSession, content: DataFrame): DataFrame = {
    val rdd = content.select("path", "data").rdd.mapPartitions(_.map { r =>
      val (w, h, px) = fakeDecode(r.getAs[Array[Byte]]("data"))
      Row(r.getString(0), w, h, px)
    })
    spark.createDataFrame(rdd, DecodedSchema)
  }

  /** Feature extraction over decoded pixels: per-quadrant mean pooling
    * → a 4-dim embedding (pure Column expressions — at scale this is a
    * projection, no shuffle). */
  def features(decoded: DataFrame): DataFrame = {
    val quadrant = (q: Int) => {
      val s = slice(col("pixels"), q * 16 + 1, 16)
      (aggregate(s, lit(0.0f), (a, x) => a + x) / lit(16.0f)).cast("float")
    }
    decoded.select(col("path"),
      array((0 until 4).map(quadrant): _*).as("embedding"))
  }

  /** Frame sampling for "video" payloads: every `stride`-th 64-byte
    * block becomes a frame payload (the batch/explode plumbing of a
    * real frame extractor). */
  def frameSample(content: DataFrame, stride: Int): DataFrame =
    content.select(col("path"), posexplode(
        transform(sequence(lit(0),
          greatest((col("dataLength") / (64 * stride)).cast("int") - 1, lit(0))),
          i => substring(col("data"), (i * 64 * stride + 1).cast("int"),
            lit(64))))
        .as(Seq("frame_no", "frame")))
}
