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

  test("frame sampling: stride windows over payload bytes") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L),
      frameBytes = 4, stride = 2)
    // payload "hello multimodal world" = 22 bytes; 22/(4*2)=2 frames
    assert(frames.count() == 2)
    assert(frames.select(max(length(col("frame_payload")))).head().getInt(0) <= 4)
  }
}
