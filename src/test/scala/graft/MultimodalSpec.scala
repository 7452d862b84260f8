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
}
