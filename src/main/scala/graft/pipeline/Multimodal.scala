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
  * Decode runs IN-ROW as a native Catalyst expression
  * ([[graft.functions.PngDecodeExpr]]) so payload bytes never leave
  * the columnar batch: PNG payloads decode for REAL through the
  * JDK-only [[Png]] codec (zlib + the five scanline filters),
  * BMP/GIF/JPEG through the JDK's ImageIO ([[Images]]), and only
  * payloads with no recognizable signature fall back to the clearly
  * marked deterministic stand-in [[fakeDecode]] (this container has
  * no codec libraries beyond the JDK). Feature-extract / resize /
  * frame-sample are pure Column expressions over the decoded frame.
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

  /** Fan the doc ids across the session's cores before payload
    * synthesis: the ids come from a small parquet file (often ONE
    * split), and without this every synthetic encode — ImageIO JPEG
    * writes especially — serializes on a single task (measured: the
    * sf1 JPEG store spent ~25 s on one core). The synthesized
    * payloads are the test fixture; the operator under test is the
    * DECODE, which must not inherit the fixture's partitioning. */
  private def spreadIds(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select("doc_id").repartition(spark.sparkContext.defaultParallelism)

  /** Deterministic synthetic-PNG content store: gradient grayscale
    * images derived from doc_id (w = 4+(id%4)·2 ∈ {4,6,8,10},
    * h = 5+(id%3)·2 ∈ {5,7,9}, pixel(i) = (id·31 + i·7) mod 256),
    * encoded as REAL PNGs with the row filter cycling 0-4 — every
    * decode exercises all five scanline filters. The closed-form pixel
    * content is what makes the decode path ORACLE-checkable: DuckDB
    * recomputes dims + pixel sum from doc_id while Spark round-trips
    * the actual bytes through [[Png.decode]]. */
  def pngContentStore(spark: SparkSession, docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("mimeType", StringType),
      StructField("dataLength", LongType),
      StructField("sha256", StringType),
      StructField("data", BinaryType)))
    val rdd = spreadIds(spark, docs).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val w = 4 + (id % 4).toInt * 2
      val h = 5 + (id % 3).toInt * 2
      val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toInt)
      val data = Png.encodeGray(w, h, px)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(data).map("%02x".format(_)).mkString
      Row(s"/documents/$id", "image/png", data.length.toLong, sha, data)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Synthetic BMP/GIF content store — the SAME closed-form gradient
    * as [[pngContentStore]] (w = 4+(id%4)·2, h = 5+(id%3)·2,
    * pixel(i) = (id·31 + i·7) mod 256) encoded through the JDK
    * ImageIO writer. Both formats round-trip gray losslessly, so the
    * identical DuckDB oracle pins the REAL ImageIO decode path
    * exactly, pixel for pixel. */
  def imageIoContentStore(spark: SparkSession, docs: DataFrame,
                          format: String, mime: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("mimeType", StringType),
      StructField("dataLength", LongType),
      StructField("sha256", StringType),
      StructField("data", BinaryType)))
    val rdd = spreadIds(spark, docs).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val w = 4 + (id % 4).toInt * 2
      val h = 5 + (id % 3).toInt * 2
      val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toInt)
      val data = Images.encodeGray(w, h, px, format)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(data).map("%02x".format(_)).mkString
      Row(s"/documents/$id", mime, data.length.toLong, sha, data)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Synthetic JPEG content store — constant-tone frames (every pixel
    * = (id·37) mod 256, w = 8+(id%3)·8, h = 8+(id%2)·8): JPEG is
    * lossy, but a flat block round-trips within DC-quantization error,
    * so dims are exact and every pixel stays within a small pinned
    * tolerance of the closed-form tone — the lossless-safe assertion
    * surface for a lossy codec. */
  def jpegContentStore(spark: SparkSession, docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("mimeType", StringType),
      StructField("dataLength", LongType),
      StructField("sha256", StringType),
      StructField("data", BinaryType)))
    val rdd = spreadIds(spark, docs).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val w = 8 + (id % 3).toInt * 8
      val h = 8 + (id % 2).toInt * 8
      val tone = ((id * 37) % 256).toInt
      val data = Images.encodeGray(w, h, Array.fill(w * h)(tone), "jpg")
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(data).map("%02x".format(_)).mkString
      Row(s"/documents/$id", "image/jpeg", data.length.toLong, sha, data)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Deterministic synthetic-VIDEO content store: per doc a
    * concatenated-PNG frame stream (3+(id%3) frames, all 6×(4+(id%2)·2),
    * frame f's pixel(i) = (id·13 + f·7 + i·5) mod 256) — the closed
    * form makes per-frame decode oracle-checkable end to end. */
  def videoContentStore(spark: SparkSession, docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("mimeType", StringType),
      StructField("dataLength", LongType),
      StructField("sha256", StringType),
      StructField("data", BinaryType)))
    val rdd = spreadIds(spark, docs).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val (w, h) = (6, 4 + (id % 2).toInt * 2)
      val frames = (0 until 3 + (id % 3).toInt).map { f =>
        Png.encodeGray(w, h, Array.tabulate(w * h)(i =>
          ((id * 13 + f * 7 + i * 5) % 256).toInt))
      }
      val data = frames.reduce(_ ++ _)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(data).map("%02x".format(_)).mkString
      Row(s"/documents/$id", "video/x-png-stream", data.length.toLong, sha, data)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Per-frame decode of a concatenated-PNG "video" payload —
    * [[graft.functions.PngFramesExpr]] splits and decodes IN-ROW, and
    * `posexplode` turns the frame array into (path, frame_no, width,
    * height, pixels) rows. This supersedes [[frameSample]]'s
    * byte-block stand-in wherever the payload really is a frame
    * stream; frameSample remains the generic sampler for opaque
    * container formats. */
  def decodeFrames(spark: SparkSession, content: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.PngFramesExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("data"))))
    content.select(col("path"), posexplode(d).as(Seq("frame_no", "f")))
      .select(col("path"), col("frame_no"),
        col("f.width").as("width"), col("f.height").as("height"),
        col("f.pixels").as("pixels"))
  }

  /** Deterministic synthetic-WAV content store — the audio analog of
    * [[pngContentStore]]: per doc a mono PCM16 clip at 8 kHz,
    * n = 800+(id%5)·160 frames, sample(i) = (id·17 + i·3) mod 2001 −
    * 1000 (closed form ⇒ DuckDB recomputes counts and the exact
    * integer sample sum while Spark round-trips the actual RIFF
    * bytes through [[Wav.decode]]). */
  def wavContentStore(spark: SparkSession, docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("mimeType", StringType),
      StructField("dataLength", LongType),
      StructField("sha256", StringType),
      StructField("data", BinaryType)))
    val rdd = spreadIds(spark, docs).rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      val n = 800 + (id % 5).toInt * 160
      val samples = Array.tabulate(n)(i =>
        (((id * 17 + i * 3) % 2001) - 1000).toShort)
      val data = Wav.encodePcm16(8000, 1, samples)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(data).map("%02x".format(_)).mkString
      Row(s"/documents/$id", "audio/wav", data.length.toLong, sha, data)
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Decode audio payloads IN-ROW via the native
    * [[graft.functions.WavDecodeExpr]] — same columnar discipline as
    * [[decode]]. Non-WAV payloads fail loud (no stand-in: fabricated
    * samples would make every downstream feature silently
    * meaningless). */
  def decodeAudio(spark: SparkSession, content: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.WavDecodeExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("data"))))
    content.select(col("path"), d.as("d"))
      .select(col("path"), col("d.sample_rate").as("sample_rate"),
        col("d.channels").as("channels"), col("d.samples").as("samples"))
  }

  /** Audio features over decoded samples — pure Column expressions
    * (a projection at scale, no shuffle, no UDF): duration, RMS
    * energy, zero-crossing count, peak amplitude. */
  def audioFeatures(decoded: DataFrame): DataFrame = {
    val n = size(col("samples"))
    val rms = sqrt(aggregate(col("samples"), lit(0.0d),
      (a, x) => a + x.cast("double") * x.cast("double")) / n)
    // count sign flips between consecutive samples (zip the array
    // with its tail — an in-row fold, no explode)
    val zc = aggregate(
      zip_with(col("samples"),
        slice(col("samples"), lit(2), greatest(n - 1, lit(0))),
        (a, b) => when(a.cast("double") * b.cast("double") < 0, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    decoded.select(col("path"),
      (n.cast("double") / col("sample_rate")).as("duration_sec"),
      rms.as("rms"), zc.as("zero_crossings"),
      array_max(transform(col("samples"), x => abs(x))).as("peak"))
  }

  /** Integer-factor audio decimation (every `f`-th sample kept, rate
    * divided by `f`) — the resample primitive of an audio
    * normalization pipeline (true band-limited resampling would
    * low-pass first; decimation is the plumbing both share). Pure
    * in-row Column expressions, a projection at scale. The rate must
    * divide evenly (fail-loud per row: a silently fractional rate
    * would corrupt every downstream duration). */
  def audioResample(decoded: DataFrame, f: Int): DataFrame = {
    require(f >= 1, s"decimation factor >= 1: $f")
    val guard = when(col("sample_rate") % f === 0, lit(true))
      .otherwise(raise_error(concat(
        lit(s"audioResample: rate not divisible by $f: "),
        col("sample_rate").cast("string"))))
    val n = size(col("samples"))
    val kept = ((n + f - 1) / f).cast("int") // ceil: indices 0, f, ... < n
    val out = when(kept > 0,
      transform(sequence(lit(0), kept - 1, lit(1)),
        i => element_at(col("samples"), (i * f + 1).cast("int"))))
      .otherwise(array().cast("array<float>"))
    decoded.where(guard)
      .select(col("path"), (col("sample_rate") / f).cast("int")
        .as("sample_rate"), out.as("samples"))
  }

  /** ==== STUB (signature-less payloads only) ====  Deterministic
    * fake decoder: derives an 8×8 single-channel "image" from the
    * payload bytes (xorshift over a seed hash). PNG payloads take the
    * REAL [[Png.decode]] path and BMP/GIF/JPEG the REAL
    * [[Images.decode]] path; this stand-in remains only for payloads
    * whose format genuinely has no codec in this container (no
    * signature match at all). */
  private[graft] def fakeDecode(data: Array[Byte]): (Int, Int, Array[Float]) = {
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

  /** Decode payloads IN-ROW via the native
    * [[graft.functions.PngDecodeExpr]] expression — the decode stays
    * inside whole-stage codegen (the earlier `rdd.mapPartitions`
    * formulation exited Tungsten and paid a row-conversion per
    * payload). PNG payloads decode for REAL ([[Png.decode]]: zlib +
    * the five scanline filters, JDK-only), BMP/GIF/JPEG through
    * ImageIO ([[Images.decode]]); a payload whose signature claims a
    * decodable format but can't be decoded fails LOUD (never a
    * silent fake). Only signature-less payloads fall back to the
    * marked [[fakeDecode]] stand-in. */
  def decode(spark: SparkSession, content: DataFrame): DataFrame = {
    val d = org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.PngDecodeExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(col("data"))))
    content.select(col("path"), d.as("d"))
      .select(col("path"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.pixels").as("pixels"))
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

  /** Resize decoded images by integer-factor average pooling (each
    * output pixel = mean of its `f`×`f` source block) — pure Column
    * expressions over the pixel array, so at scale it is a projection
    * on the decoded frame, no shuffle, no UDF. Width/height must be
    * divisible by `f` (fail-loud per row otherwise: a silent crop
    * would corrupt training data). `keys` names the identity columns
    * to carry through (default just `path`; pass `path, frame_no` to
    * resize a decoded frame stream). */
  def resize(decoded: DataFrame, f: Int,
             keys: Seq[String] = Seq("path")): DataFrame = {
    require(f >= 1, s"pool factor >= 1: $f")
    val w = col("width"); val h = col("height")
    val guard = when(w % f === 0 && h % f === 0, lit(true))
      .otherwise(raise_error(concat(lit(s"resize: dims not divisible by $f: "),
        w.cast("string"), lit("x"), h.cast("string"))))
    val ow = (w / f).cast("int"); val oh = (h / f).cast("int")
    // output pixel (oy, ox) averages source block rows oy*f..oy*f+f-1
    // × cols ox*f..ox*f+f-1 of the row-major pixels array; the f×f
    // inner sum unrolls at plan-build time (f is a Scala constant —
    // no nested lambda, stays one flat codegen'd expression)
    val pooled = transform(sequence(lit(0), oh * ow - 1), o => {
      val oy = (o / ow).cast("int"); val ox = (o % ow).cast("int")
      val sums = (0 until f * f).map { k =>
        val sy = oy * f + lit(k / f)
        val sx = ox * f + lit(k % f)
        element_at(col("pixels"), (sy * w + sx + 1).cast("int"))
      }.reduce(_ + _)
      (sums / lit(f * f)).cast("float")
    })
    // two selects: aliasing the OUTPUT as width/pixels in the same
    // select list would lateral-alias-shadow the input columns the
    // pooling lambda reads (observed: pooled read the resized width)
    decoded.where(guard)
      .select(keys.map(col) ++
        Seq(ow.as("__w"), oh.as("__h"), pooled.as("__px")): _*)
      .select(keys.map(col) ++
        Seq(col("__w").as("width"), col("__h").as("height"),
          col("__px").as("pixels")): _*)
  }

  /** Frame decoded audio into fixed non-overlapping windows of
    * `frameLen` samples and compute per-frame energy (Σ x² over the
    * window) — the VAD/segmentation primitive of an audio curation
    * pipeline. Pure in-row Column expressions (`transform` over the
    * frame index + `aggregate` over a `slice`): at scale this is a
    * projection on the decoded clip, no shuffle, no explode, no UDF.
    * A trailing partial window (n % frameLen ≠ 0) is dropped, the
    * standard hop-framing convention. */
  /** SPECTRAL features per frame — the real audio feature extractor a
    * speech pipeline runs after framing (filterbank energies for VAD /
    * language-id / dedup-by-audio): a naive single-bin DFT per
    * requested bin k — re = Σ xᵢ·cos(2πki/N), im = Σ xᵢ·sin(2πki/N),
    * magnitude² = re² + im² — computed ENTIRELY in-row with
    * zip_with + aggregate over the frame slice (one codegen'd
    * projection; the trig factors are per-element expressions, no UDF,
    * no shuffle, no matrix library). For the handful of bins a
    * bucketer needs, the O(N·|bins|) direct form beats an FFT's
    * orchestration at any corpus size because rows are independent —
    * the 100 TB shape is "per-row arithmetic inside the scan", which
    * this is. Magnitudes round to 6 dp: trig is the one stage an
    * external validator's libm may differ in the last ulp
    * (accumulated ≤1e-13 over a 160-sample frame — far inside the
    * rounding). Output: one row per (path, frame) with a mag2_k
    * column per bin. */
  def audioSpectra(decoded: DataFrame, frameLen: Int,
                   bins: Seq[Int]): DataFrame = {
    require(frameLen >= 1 && bins.nonEmpty, "frameLen >= 1, bins nonEmpty")
    val nf = (size(col("samples")) / frameLen).cast("int")
    val frames = when(nf > 0, sequence(lit(0), nf - 1, lit(1)))
      .otherwise(array().cast("array<int>"))
    val d = decoded.select(col("path"), col("samples"),
      explode(frames).as("frame"))
      .withColumn("__fr",
        slice(col("samples"), col("frame") * frameLen + 1, lit(frameLen)))
    // the trig factors cos(i·w) / sin(i·w) are the SAME vector for
    // every row, so they are precomputed driver-side as literal tables
    // and each bin's re/im is one native [[graft.functions.DotProduct]]
    // pass (tight generated loop) instead of an interpreted zip_with +
    // aggregate evaluating Math.cos/sin PER SAMPLE PER ROW PER BIN.
    // Bit-identical: Spark's cos/sin eval IS java.lang.Math.cos/sin on
    // the same i.toDouble * w products, and DotProduct accumulates in
    // the same index order as the replaced fold (guide §1.2 per-task
    // work; measured 2.3× on the spectra stage at sf0.1).
    val withM = bins.foldLeft(d) { case (df, k) =>
      val w = 2.0 * math.Pi * k / frameLen
      val cosT = typedLit(Array.tabulate(frameLen)(i => math.cos(i * w)))
      val sinT = typedLit(Array.tabulate(frameLen)(i => math.sin(i * w)))
      val re = graft.functions.VectorExprs.dot(col("__fr"), cosT)
      val im = graft.functions.VectorExprs.dot(col("__fr"), sinT)
      df.withColumn(s"mag2_$k", round(re * re + im * im, 6))
    }
    withM.select(Seq(col("path"), col("frame")) ++
      bins.map(k => col(s"mag2_$k")): _*)
  }

  def audioFrames(decoded: DataFrame, frameLen: Int): DataFrame = {
    require(frameLen >= 1, s"frameLen >= 1: $frameLen")
    val n = size(col("samples"))
    val nf = (n / frameLen).cast("int")
    // guard nf=0: sequence(0,-1,step 1) is an error, not an empty array
    // per-frame energy Σx² = dot(frame, frame) through the native
    // [[graft.functions.DotProduct]] loop — the outer transform still
    // evaluates once per FRAME (interpreted), but the per-sample
    // multiply-accumulate runs as one generated loop instead of an
    // interpreted aggregate lambda per sample. Same index-ordered
    // a + x.toDouble * x.toDouble accumulation — bit-identical.
    val energies = when(nf > 0,
      transform(sequence(lit(0), nf - 1, lit(1)), j => {
        val fr = slice(col("samples"), j * frameLen + 1, lit(frameLen))
        graft.functions.VectorExprs.dot(fr, fr)
      }))
      .otherwise(array().cast("array<double>"))
    decoded.select(col("path"), col("sample_rate"),
      nf.as("n_frames"), energies.as("frame_energy"))
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
