package graft

import org.apache.spark.sql.functions._
import graft.syntax._

/** The fluent facade must route to the same operators as the direct
  * calls (spot-checked by value).
  */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoinBackward / pointInIntervalJoin / fetchPayloads / saltedJoinOn compose") {
    val ev = Seq((1L, 1L, 100L), (2L, 1L, 40L)).toDF("ev_id", "k", "tl")
      .select(col("ev_id"), col("k"), timestamp_seconds(col("tl")).as("t"))
    val ord = Seq((1L, 50L, 7L)).toDF("k", "tl", "payload")
      .select(col("k"), timestamp_seconds(col("tl")).as("t"), col("payload"))
    val asof = ev.asofJoinBackward(ord, ev("k"), ord("k"), ev("t"), ord("t"))
      .select(col("ev_id"), col("payload")).as[(Long, Option[Long])].collect().toMap
    assert(asof == Map(1L -> Some(7L), 2L -> None))

    val points = Seq((1L, 5.0), (2L, 99.0)).toDF("id", "p")
    val iv = Seq(("a", 0.0, 10.0)).toDF("name", "lo", "hi")
    val rj = points.pointInIntervalJoin(iv, col("p"), col("lo"), col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(rj == Set((1L, "a")))

    val fetched = Seq("x", "y").toDF("key")
      .fetchPayloads("key", maxConcurrent = 2)(k => k.toUpperCase.getBytes("UTF-8"))
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(fetched == Map("x" -> "X", "y" -> "Y"))

    val big = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "d")
    val salted = big.saltedJoinOn(small, "k", salt = 4)
      .select("v", "d").as[(String, String)].collect().toSet
    val plain = big.join(small, "k").select("v", "d").as[(String, String)].collect().toSet
    assert(salted == plain)
  }
}
