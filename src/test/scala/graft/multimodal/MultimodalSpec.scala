package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Multimodal.fromText(
      Seq((1L, "hello multimodal world"), (2L, "x"), (3L, "")).toDF("id", "text"),
      "id", "text", kind = "image")
  }

  test("media schema: binary payload + typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.select(col("meta.codec")).head().getString(0) == "utf8-stub")
  }

  test("feature extraction: fixed dim, deterministic, empty-safe") {
    val f1 = Multimodal.extractFeatures(media, featureDim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    val f2 = Multimodal.extractFeatures(media, featureDim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(f1(1L).length == 8)
    assert(f1(1L) == f2(1L)) // deterministic stub
    assert(f1(3L).forall(_ == 0.0f)) // empty payload → zero features
  }

  test("batched iteration: batch boundaries don't change results") {
    val big = Multimodal.fromText(
      {
        import spark.implicits._
        (1L to 100L).map(i => (i, s"document number $i with some payload text")).toDF("id", "text")
      }, "id", "text")
    val b1 = Multimodal.extractFeatures(big, featureDim = 4, batchSize = 7).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    val b2 = Multimodal.extractFeatures(big, featureDim = 4, batchSize = 100).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(b1 == b2)
    assert(b1.size == 100)
  }

  test("resize stub contracts payload and metadata by the factor") {
    val resized = Multimodal.resizeStub(media.filter(col("media_id") === 1L), factor = 2)
    val r = resized.head()
    // "hello multimodal world" = 22 bytes → every 2nd byte = 11
    assert(r.getAs[Array[Byte]]("payload").length == 11)
  }

  test("frame sampling: stride windows over payload bytes") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L),
      frameBytes = 4, stride = 2)
    // payload "hello multimodal world" = 22 bytes; 22/(4*2)=2 frames
    assert(frames.count() == 2)
    assert(frames.select(max(length(col("frame_payload")))).head().getInt(0) <= 4)
  }
}
