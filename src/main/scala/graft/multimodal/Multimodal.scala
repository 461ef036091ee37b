package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side contract — schema, partitioning,
  * batch iteration shape — is real and tested; the actual codec step is a
  * clearly-marked deterministic STUB because no image/audio libraries exist
  * in this container. Swap `decodeStub` for a real decoder (e.g. javacv)
  * without touching the pipeline shape.
  */
object Multimodal {

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** STUB decode: a real implementation would parse the codec container.
    * Here: deterministic pseudo-features from the payload bytes so the
    * pipeline (partition-wise batch iteration, fixed-length feature output)
    * is fully exercisable. Feature f(i) = (Σ bytes at positions ≡ i mod
    * dim) / 255 / len · dim — integer byte accumulation with a SINGLE
    * float rounding per feature, which keeps the fake exactly
    * SQL-expressible so q39's derived stats can be oracled in DuckDB. */
  def decodeStub(payload: Array[Byte], featureDim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val out = new Array[Float](featureDim)
    if (payload != null && payload.nonEmpty) {
      val sums = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) { sums(i % featureDim) += payload(i) & 0xff; i += 1 }
      var j = 0
      while (j < featureDim) {
        out(j) = (sums(j).toDouble / 255.0 / payload.length * featureDim).toFloat
        j += 1
      }
    }
    out
  }

  /** Partition-wise feature extraction — the mapInPandas shape: the
    * partition iterator is consumed in fixed-size BATCHES (a real decoder
    * amortizes codec/model setup per batch, exactly like an Arrow batch
    * crossing into pandas), one output row per input row.
    * Output: (media_id, kind, n_bytes, features[featureDim]). */
  def extractFeatures(media: DataFrame, featureDim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val rdd = media.select("media_id", "kind", "payload").rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup seam: a real impl opens the codec/model ONCE here
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            if (payload == null) 0 else payload.length,
            decodeStub(payload, featureDim).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize stub: a real implementation rescales decoded pixels; the
    * deterministic stand-in downsamples payload bytes by stride so output
    * size contracts exactly like a resize would. Pure expression. */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    import org.apache.spark.sql.Column
    val payload = col("payload")
    val resized = // every factor-th byte via substr+concat at binary level
      org.apache.spark.sql.functions.expr(
        s"cast(array_join(transform(sequence(1, length(payload), $factor), " +
        s"i -> substring(cast(payload as string), i, 1)), '') as binary)")
    media.withColumn("payload", resized)
      .withColumn("meta", struct(
        (col("meta.width") / factor).cast("int").as("width"),
        (col("meta.height") / factor).cast("int").as("height"),
        col("meta.duration_ms"), col("meta.codec")))
  }

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size
    * window of the payload becomes a "frame" row (explode shape). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    media
      .withColumn("n_frames",
        greatest(floor(length(col("payload")) / lit(frameBytes * stride)).cast("int"), lit(0)))
      .select(col("media_id"), col("kind"),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_payload")
  }

  /** Build a media table from any (id, string) source — lets the synthetic
    * documents table stand in for binary payloads in tests/queries. */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String = "image"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), lit("utf8-stub").as("codec")).as("meta"))
}
