package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategies for the shapes AQE alone doesn't fix (SURVEY.md §6). */
object Joins {

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * per-row salt in [0, salt), the small side is replicated once per
    * salt value, and the join key becomes (key, salt) — a hot key's
    * rows spread over `salt` reducers instead of one. Result is
    * row-identical to the plain equi-join (asserted in JoinsSpec).
    * Use when a known hot key defeats AQE's skew split (e.g. the
    * null-like default key of a fact table).
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketed co-located join setup: write both sides bucketed by the
    * join key into the session catalog; joining the returned tables
    * on that key needs NO shuffle (both sides' bucketing satisfies
    * the join's distribution requirement — asserted on the plan in
    * JoinsSpec). This is the 100 TB fact-fact join layout: pay the
    * shuffle once at write time, never per query.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$table")
      .saveAsTable(table)
}
