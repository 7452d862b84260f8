package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("manifest emits typed metadata for every doc, deterministically") {
    val a = Multimodal.manifest(spark, Sf).collect()
    val b = Multimodal.manifest(spark, Sf).collect()
    assert(a.length == Tables.documents(spark, Sf).count())
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // stub decode is deterministic
    a.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
      assert(r.getAs[Int]("channels") == 3)
    }
  }

  test("decode runs batched per partition") {
    // payload bytes equal the utf-8 text length (ascii corpus)
    val ds = Multimodal.decodeBatched(spark, Sf)
    val withLen = ds.toDF().join(
      Tables.documents(spark, Sf).selectExpr("doc_id", "length(text) AS tl"), "doc_id")
    assert(withLen.filter("n_bytes != tl").count() == 0)
  }

  test("resize emits fixed-size binary thumbnails") {
    val t = Multimodal.thumbnails(spark, Sf, w = 16, h = 16)
    assert(t.count() == Tables.documents(spark, Sf).count())
    t.collect().foreach(r => assert(r.getAs[Array[Byte]]("thumb").length == 256))
  }

  test("frame sampling fans one doc into k indexed frames") {
    val f = Multimodal.sampledFrames(spark, Sf, frames = 4)
    val docs = Tables.documents(spark, Sf).count()
    assert(f.count() == docs * 4)
    import spark.implicits._
    val idx = f.groupBy("doc_id").count().select("count").distinct().as[Long].collect()
    assert(idx.toSeq == Seq(4L))
  }

  test("feature extraction composes with the ANN operators' schema") {
    val e = Multimodal.extractFeatures(spark, Sf, dim = 64)
    val row = e.head()
    val v1 = row.getSeq[Float](row.fieldIndex("embedding")).toList
    assert(v1.length == 64)
    // deterministic: same payload -> same vector
    val again = Multimodal.extractFeatures(spark, Sf, dim = 64).head()
    assert(v1 == again.getSeq[Float](again.fieldIndex("embedding")).toList)
  }
}
