package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus ingest sources — JSONL and CSV, the two formats LLM
  * corpora actually arrive in before they become parquet. Both
  * readers follow the 100-TB ingest discipline:
  *
  *   - EXPLICIT schema, never inference: `inferSchema`/sampled JSON
  *     schema discovery is a second full scan of the input (and a
  *     correctness hazard — a sampled schema flips types between
  *     batches). The schema is a constant of the pipeline.
  *   - Corrupt lines become countable quarantine rows, never a failed
  *     1000-executor job: a torn line in shard 48,211 of a web crawl
  *     is data, not an exception.
  *   - No repartition on read: parallelism comes from the source
  *     layout (line-splittable text for JSONL, file count for
  *     multiLine CSV).
  *
  * JSONL deliberately reads through `text` + `from_json` rather than
  * the JSON file source: the malformed-line text lands in a COMPUTED
  * `_corrupt_record` column, so splitting on it is an ordinary
  * filter. (The file source's internal corrupt column cannot be
  * queried alone — Spark raises QUERY_ONLY_CORRUPT_RECORD_COLUMN on
  * exactly the quarantine shape; parse-computed columns have no such
  * restriction, and the scan stays one pass and line-splittable.)
  */
object TextSources {

  /** The documents-table schema as it leaves JSONL/CSV ingest. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains("_corrupt_record")) schema
    else schema.add(StructField("_corrupt_record", StringType))

  /** Read JSONL with an explicit schema; malformed lines surface in
    * `_corrupt_record` (see object doc for why this parses via
    * `from_json` over a text scan). Blank lines are dropped — they
    * are shard padding, not corrupt records.
    */
  private def parseLine(schema: StructType) =
    from_json(col("value"), withCorrupt(schema),
      Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("rec")

  def readJsonl(s: SparkSession, path: String, schema: StructType = DocSchema): DataFrame =
    s.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(parseLine(schema))
      .select(col("rec.*"))

  /** [[readJsonl]] carrying the source shard beside each row (the
    * hidden `_metadata.file_path`, surfaced as `_file`) — the j6
    * audit pins its shard layout with it.
    */
  def readJsonlWithFile(s: SparkSession, path: String,
      schema: StructType = DocSchema): DataFrame =
    s.read.text(path)
      .select(col("value"), col("_metadata.file_path").as("_file"))
      .where(length(trim(col("value"))) > 0)
      .select(parseLine(schema), col("_file"))
      .select(col("rec.*"), col("_file"))

  /** Whole-file JSON-ARRAY read (`multiLine` — each file is ONE JSON
    * document, an array of records: the API-dump/export shape) with
    * the PERMISSIVE corrupt column. Parallelism comes from FILE
    * COUNT: an array has no line boundary to resync on, so the scan
    * is not line-splittable (the j5 rowTag reality, stated).
    */
  def readJsonArray(s: SparkSession, path: String,
      schema: StructType = DocSchema): DataFrame =
    s.read
      .schema(withCorrupt(schema))
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Write a DataFrame as JSONL (one JSON object per line). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read row-tagged XML with an explicit schema (Spark 4's built-in
    * XML source — the spark-xml package merged into core): each
    * `<doc>` element is one row; type-mismatched rows land in
    * `_corrupt_record` under PERMISSIVE mode like the CSV path. The
    * same 100-TB discipline applies — explicit schema (XSD-free
    * inference would be a second scan), quarantine not failure; XML's
    * one structural concession is that rowTag scanning is not
    * line-splittable, so parallelism comes from FILE COUNT (shard the
    * corpus into many files, as web-crawl XML dumps already are).
    */
  def readXml(s: SparkSession, path: String, schema: StructType = DocSchema): DataFrame =
    s.read
      .option("rowTag", "doc")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt(schema))
      .xml(path)

  /** Read CSV with an explicit schema, header, and RFC-4180 quoting;
    * malformed lines land in `_corrupt_record`. `multiLine` is on so
    * quoted newlines inside `text` parse correctly — the cost is that
    * a multiLine file is not byte-range-splittable (parallelism comes
    * from file count, the normal case for sharded corpora). NOTE:
    * unlike [[readJsonl]], this is the raw file source's internal
    * corrupt column — Spark disallows querying it alone off the raw
    * scan, so run [[quarantine]] only after the parse is materialized
    * (the bronze-parquet write every ingest pipeline does anyway;
    * TextSourcesSpec shows the flow).
    */
  def readCsv(s: SparkSession, path: String, schema: StructType = DocSchema): DataFrame =
    s.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** Write a DataFrame as headered, quoted CSV. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  /** Split an ingest result into (clean rows in the declared schema,
    * quarantined rows). The clean side drops the accounting column;
    * the quarantine side keeps the (mostly-null) parsed columns
    * beside the raw line for triage.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .withColumnRenamed("_corrupt_record", "raw_line")
    val good = df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    (good, bad)
  }
}
