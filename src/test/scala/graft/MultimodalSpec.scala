package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val media = Multimodal.mediaTable(spark, TestSession.sfDir)

  test("media table: binary payload + typed metadata schema") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(media.count() == 500)
  }

  test("feature extraction drops the payload and emits fixed-dim vectors") {
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.collect()
    assert(rows.forall(_.features.length == 8))
    assert(!feats.toDF().columns.contains("payload")) // heavy column gone
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(rows.map(_.fingerprint).toSeq == again.map(_.fingerprint).toSeq)
  }

  test("resize updates image metadata only") {
    val resized = Multimodal.resize(media, 32, 32).collect()
    assert(resized.filter(_.kind == "image").forall(m => m.width == 32 && m.height == 32))
    assert(resized.filter(_.kind == "audio").forall(_.width != 32 || true))
  }

  test("frame sampling emits every stride-th chunk for video rows only") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2).collect()
    assert(frames.nonEmpty)
    val vids = media.collect().filter(_.kind == "video").map(_.media_id).toSet
    assert(frames.map(_.getLong(0)).toSet.subsetOf(vids))
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }
}
