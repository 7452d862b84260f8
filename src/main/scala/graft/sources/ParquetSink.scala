package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side parquet layout options for SELECTIVE reads at scale.
  *
  * At 100 TB a point lookup ("this orderkey", "this doc_id") touches
  * every row group its min/max stats cannot exclude; high-cardinality
  * keys are effectively uniform per row group, so min/max excludes
  * nothing and the scan reads everything. A parquet BLOOM FILTER on
  * the lookup column lets the reader skip row groups that definitely
  * lack the key — the standard write-side complement to partition
  * pruning (g11) and runtime filters (the DPP/Bloom plan assertions
  * in PlanSpec): partitioning prunes coarse prefixes, the row-group
  * bloom prunes within files, and nothing changes on the read path
  * (Spark's parquet reader consults the filter automatically when a
  * point predicate reaches the scan).
  *
  * The writer options are per-column (`parquet.bloom.filter.enabled#
  * <col>`), so only the designated lookup keys pay the filter's
  * space; `expected.ndv` sizes the filter for the target false-
  * positive rate. ParquetSinkSpec proves the contract on the written
  * bytes: the filter exists for the enabled column only, has NO false
  * negatives (every written key hits), and keeps absent-key false
  * positives under the design bound.
  */
object ParquetSink {

  /** Write `df` with a bloom filter on each of `bloomCols`. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
      ndv: Long = 100000L): Unit =
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }.parquet(path)
}
