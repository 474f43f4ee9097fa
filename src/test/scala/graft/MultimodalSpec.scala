package graft

import org.apache.spark.sql.Row

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  private def media = {
    val s = initSpark()
    val rows = java.util.Arrays.asList(
      Row("a1", "image", Array[Byte](1, 2, 3, 2, 1), 2, 2, null),
      Row("a2", "audio", Array[Byte](9, 9, 9, 9), null, null, 1000L),
      Row("a3", "video", null, null, null, null)
    )
    s.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("feature extraction preserves schema and handles null payloads") {
    val out = Multimodal.extractFeatures(media, dim = 8)
    assert(out.schema === Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getInt(2), r.getSeq[Float](3))).toMap
    assert(rows("a1")._1 === 5)
    assert(rows("a3")._1 === 0)
    assert(rows.values.forall(_._2.length === 8))
    // null payload gets the deterministic unit vector
    assert(rows("a3")._2.head === 1.0f)
  }

  test("features are deterministic and balanced path matches map path") {
    val a = Multimodal.extractFeatures(media, 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    val b = Multimodal.extractFeaturesBalanced(media, partitions = 3, 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    assert(a === b)
  }
}
