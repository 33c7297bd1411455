package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition.
  *
  * The Spark-side mechanics here are real (schemas, partition batching,
  * deterministic outputs); the codec itself is a clearly marked STUB —
  * this container has no image/audio libraries, and in Scala the decode
  * seam is `mapPartitions` (the JVM analog of the Python API's
  * `mapInPandas`: one iterator per partition, batch-amortized setup).
  * Swap `decodeStub` for a real codec (e.g. javacv / TwelveMonkeys)
  * without touching any plumbing.
  */
object Multimodal {

  /** The metadata contract for a multimodal asset column. */
  val metaType: StructType = StructType(Seq(
    StructField("modality", StringType),   // image | audio | video
    StructField("format", StringType),     // png/jpeg/wav/mp4/...
    StructField("n_bytes", LongType)))

  /** Wrap a binary column with its metadata struct (the ingest step). */
  def asAsset(df: DataFrame, binCol: String, modality: String, format: String): DataFrame =
    df.withColumn(s"${binCol}_meta",
      struct(lit(modality).as("modality"), lit(format).as("format"),
        length(col(binCol)).cast("long").as("n_bytes")))

  /** ==== STUB ==== Deterministic fake decode: "decodes" a binary asset
    * to (width, height, channels) + an 8-dim feature vector derived from
    * content bytes. A real implementation replaces ONLY this function
    * with a codec call; signature and determinism contract stay.
    */
  private[ops] def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = graft.runtime.Rng.mix(bytes.length.toLong ^
      (if (bytes.nonEmpty) bytes(0).toLong << 32 else 0L))
    val width = 64 + (Math.floorMod(h, 16L) * 64).toInt
    val height = 64 + (Math.floorMod(h >>> 8, 16L) * 64).toInt
    val features = new Array[Float](8)
    var i = 0
    while (i < 8) {
      features(i) = ((graft.runtime.Rng.mix(h + i) >>> 11) * 1.1102230246251565e-16).toFloat
      i += 1
    }
    (width, height, 3, features)
  }

  private val decodedType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Decode + feature-extract a binary asset column, batched per
    * partition. Output schema = input schema + `<binCol>_decoded`
    * struct. The per-partition loop is where a real codec would be
    * initialized once per task (not per row).
    */
  def decodeFeatures(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(s"${binCol}_decoded", decodedType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // real codec init would happen HERE, once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (w, h, c, f) = decodeStub(if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, c, f.toSeq))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Video frame sampling plumbing: one row per sampled frame index at
    * `fps`-spaced offsets (the decode of each frame is the same stub
    * seam). Fan-out is a codegen'd explode, not a UDF loop.
    */
  def sampleFrames(df: DataFrame, binCol: String, nFrames: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset_bytes",
        (col("frame_idx") * greatest(length(col(binCol)).cast("long") / nFrames, lit(1L)))
          .cast("long"))

  /** Resize plumbing: records the target geometry next to the decoded
    * struct (a real implementation rewrites `features`/pixels in the
    * same mapPartitions seam as decodeFeatures).
    */
  def withResizeTarget(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("resize_target",
      struct(lit(width).as("width"), lit(height).as("height")))
}
