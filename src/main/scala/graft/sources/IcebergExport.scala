package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Write-side interop, second format: publish a [[SnapshotTable]]
  * version as a MINIMAL APACHE ICEBERG v1 Hadoop table
  * (iceberg.apache.org/spec) — the inverse of the j11 read path, and
  * [[DeltaExport]]'s twin: one snapshot whose manifest list points at
  * one manifest whose entries are the version's live files, all
  * ADDED.
  *
  * Iceberg differences that shape the export:
  *
  *  - `file_path` is ALWAYS a full location (the spec's rule — there
  *    is no relative-path mode), so `copy = false` (reference the
  *    snapshot table's immutable files in place — metadata-only,
  *    O(files) at any data size) and `copy = true` (copy into the
  *    export's `data/` dir first — a self-contained tree) differ only
  *    in where the absolute paths POINT.
  *  - The schema carries FIELD IDS: assigned 1..n by position from
  *    the files' parquet schema (a fresh table's canonical
  *    assignment). Only primitive long/int/double/string/boolean
  *    columns export; anything else refuses loudly rather than
  *    guessing a type mapping.
  *  - Per-file `lower_bounds`/`upper_bounds` ride each manifest entry
  *    (the spec's array-of-{key: field id, value: single-value
  *    little-endian bytes} encoding) whenever the snapshot version
  *    recorded stats sidecars — handing the j19 skipping lever to any
  *    downstream Iceberg reader; `record_count` comes from parquet
  *    FOOTERS (O(files) metadata reads).
  *  - Commit pointer: `metadata/v1.metadata.json` + the Hadoop
  *    catalog's `version-hint.text`, written tmp-then-ATOMIC_MOVE
  *    (the hint is the commit point). A non-empty target refuses —
  *    committing INTO an existing Iceberg table needs the catalog's
  *    optimistic version race, a catalog's job (same scope rule as
  *    [[DeltaExport]]).
  */
object IcebergExport {

  private def jesc(x: String): String = {
    val b = new StringBuilder(x.length + 8)
    x.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private val ManifestListSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin

  private val BoundsType =
    """["null",{"type":"array","items":{"type":"record","name":"bkv","fields":[
      |{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}]"""
      .stripMargin.replace("\n", "")

  private val ManifestSchema =
    s"""{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"lower_bounds","type":$BoundsType,"default":null},
      |{"name":"upper_bounds","type":${BoundsType.replace("bkv", "bkv2")},"default":null}]}}]}"""
      .stripMargin

  private def icebergType(dt: org.apache.spark.sql.types.DataType): String =
    dt.typeName match {
      case "long" => "long"
      case "integer" => "int"
      case "double" => "double"
      case "string" => "string"
      case "boolean" => "boolean"
      case other => throw new IllegalArgumentException(
        s"iceberg export: no type mapping for $other — refusing rather " +
          "than guessing (add the mapping deliberately)")
    }

  private def longBytes(v: Long): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v); bb.flip(); bb
  }

  /** Export `version` (latest when -1) of the snapshot table at
    * `table` as an Iceberg v1 Hadoop table at `out`; returns the
    * number of data files published. */
  def export(s: SparkSession, table: String, out: String,
      version: Long = -1L, copy: Boolean = true): Int = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(table)
    require(v >= 0, s"empty snapshot table $table")
    val files = SnapshotTable.manifest(table, v)
    require(files.nonEmpty, s"version $v of $table lists no files")
    val outDir = Paths.get(out)
    Files.createDirectories(outDir)
    require(Option(outDir.toFile.list()).forall(_.isEmpty),
      s"export target $out is not empty — refusing to write metadata " +
        "beside existing content (catalog-grade commit arbitration is " +
        "out of scope, the DeltaExport rule)")
    val meta = outDir.resolve("metadata")
    Files.createDirectories(meta)
    val schema = s.read.parquet(files: _*).schema
    val fieldIds = schema.fields.zipWithIndex
      .map { case (f, i) => f.name -> (i + 1) }.toMap
    val colStats = SnapshotTable.fileStats(table)
    val published: Seq[String] = files.zipWithIndex.map { case (f, i) =>
      if (!copy) f
      else {
        val dataDir = outDir.resolve("data")
        Files.createDirectories(dataDir)
        val dest = dataDir.resolve(f"part-$i%05d-${Paths.get(f).getFileName}")
        Files.copy(Paths.get(f), dest, StandardCopyOption.COPY_ATTRIBUTES)
        dest.toString
      }
    }
    val entries = files.zip(published).map { case (src, pub) =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(src),
          s.sparkContext.hadoopConfiguration))
      val n = try footer.getRecordCount finally footer.close()
      val base = Map[String, Any]("file_path" -> pub,
        "file_format" -> "PARQUET", "record_count" -> n,
        "file_size_in_bytes" -> Files.size(Paths.get(src)))
      val mm = colStats.getOrElse(src, Map.empty)
        .flatMap { case (c, b) => fieldIds.get(c).map(_ -> b) }.toSeq.sortBy(_._1)
      val df =
        if (mm.isEmpty) base
        else base ++ Map[String, Any](
          "lower_bounds" -> mm.map { case (id, (mn, _)) =>
            Map[String, Any]("key" -> id, "value" -> longBytes(mn)) },
          "upper_bounds" -> mm.map { case (id, (_, mx)) =>
            Map[String, Any]("key" -> id, "value" -> longBytes(mx)) })
      Map[String, Any]("status" -> 1, "snapshot_id" -> 1L, "data_file" -> df)
    }
    val mf = meta.resolve("manifest-1.avro").toFile
    AvroContainer.writeGeneric(mf, ManifestSchema, entries)
    AvroContainer.writeGeneric(meta.resolve("snap-1.avro").toFile,
      ManifestListSchema, Seq(Map[String, Any](
        "manifest_path" -> s"$out/metadata/manifest-1.avro",
        "manifest_length" -> mf.length(), "partition_spec_id" -> 0,
        "added_snapshot_id" -> 1L)))
    val schemaJson = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":"${jesc(f.name)}","required":${!f.nullable},"type":"${icebergType(f.dataType)}"}"""
    }.mkString("""{"schema-id":0,"type":"struct","fields":[""", ",", "]}")
    val mdJson =
      s"""{"format-version":1,"table-uuid":"${java.util.UUID.nameUUIDFromBytes(
        s"graft-iceberg-export:$table:$v".getBytes(StandardCharsets.UTF_8))}",
         |"location":"${jesc(out)}","last-updated-ms":${System.currentTimeMillis()},
         |"schema":$schemaJson,
         |"current-snapshot-id":1,
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":${System.currentTimeMillis()},
         |"manifest-list":"${jesc(s"$out/metadata/snap-1.avro")}",
         |"summary":{"operation":"append","graft-source-table":"${jesc(table)}","graft-source-version":"$v"}}]}
         |""".stripMargin
    Files.write(meta.resolve("v1.metadata.json"),
      mdJson.getBytes(StandardCharsets.UTF_8))
    // the hint is the commit point: tmp-then-ATOMIC_MOVE, so a reader
    // sees a complete table or no table
    val tmp = meta.resolve(".version-hint.tmp")
    Files.write(tmp, "1\n".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE)
    entries.size
  }
}
