package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val media = MultimodalOps.syntheticMedia(Tables.documents(spark, sf))

  test("synthetic media matches the declared binary+metadata schema") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => f.name -> f.dataType.catalogString)
    assert(shape(media.schema) === shape(MultimodalOps.mediaSchema))
    val kinds = media.select("meta.kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("extractFeatures runs batch-shaped over partitions and is deterministic") {
    import spark.implicits._
    implicit val s = spark
    val feats = MultimodalOps.extractFeatures(media.as[MultimodalOps.MediaRow])
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.features.length === 8))
    assert(rows.forall(_.n_bytes > 0))
    // determinism: a second run yields identical features
    val again = MultimodalOps.extractFeatures(media.as[MultimodalOps.MediaRow])
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    rows.foreach(f => assert(again(f.media_id) === f.features.toSeq))
  }

  test("decodeStub folds bytes deterministically (stub contract)") {
    val f1 = MultimodalOps.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = MultimodalOps.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(f1.sum > 0.0)
  }

  test("resize rewrites metadata without touching payload") {
    val r = MultimodalOps.resize(media, 64, 64)
    val m = r.select("meta.width", "meta.height").distinct().collect()
    assert(m.length === 1 && m.head.getInt(0) === 64 && m.head.getInt(1) === 64)
    // payload untouched
    assert(r.select(md5(col("payload"))).exceptAll(media.select(md5(col("payload")))).isEmpty)
  }

  test("sampleFrames fans out every k-th frame for video rows only") {
    val frames = MultimodalOps.sampleFrames(media, everyK = 10)
    val joined = frames.join(media.select(col("media_id"), col("meta.nFrames").as("nf")), "media_id")
    val bad = joined.filter(col("frame_idx") % 10 =!= 0 || col("frame_idx") >= col("nf")).count()
    assert(bad === 0)
    assert(frames.count() > 0)
    // only video kinds fan out
    assert(frames.select("meta.kind").distinct().collect().map(_.getString(0)).toSet === Set("video"))
  }
}
