package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal APACHE ICEBERG **reader** (format-version 1, Hadoop-table
  * layout) — the second half of open-table-format interop beside
  * [[DeltaTable]], from the public spec (iceberg.apache.org/spec).
  * Where Delta's log is INCREMENTAL (snapshot = replay of every
  * commit since a checkpoint), Iceberg's is SELF-CONTAINED: each
  * snapshot owns a MANIFEST LIST (Avro) enumerating manifest files
  * (Avro), and the manifests enumerate data files with a status —
  * resolving any snapshot never touches another snapshot's metadata,
  * which is why Iceberg time travel is O(snapshot), not O(history).
  * Resolution chain, each link from the spec:
  *
  *  1. `metadata/version-hint.text` → N → `metadata/vN.metadata.json`
  *     (the Hadoop-catalog commit pointer; a real catalog stores the
  *     same pointer in a database row).
  *  2. metadata JSON: `format-version` gate, `snapshots` array,
  *     `current-snapshot-id`; each snapshot carries its
  *     `manifest-list` path.
  *  3. manifest list (Avro, [[AvroContainer.readGeneric]]):
  *     `manifest_path` per manifest.
  *  4. manifest (Avro): entries with `status` ∈ {0 EXISTING, 1 ADDED,
  *     2 DELETED} and a nested `data_file.file_path` — readers take
  *     0/1 and SKIP 2 (a DELETED entry records the removal inside the
  *     snapshot that removed it).
  *
  * Format-version discipline: `format-version` 2 adds DELETE FILES
  * (merge-on-read row deletes) — a v1 reader that ignored them would
  * resurrect deleted rows, so the gate throws loudly, exactly like
  * DeltaTable's minReaderVersion gate. Generic-record field access by
  * NAME means real-world manifests (which carry many more fields:
  * partitions, column stats, split offsets) read through the same
  * code — the subset consumed here is the spec's required core.
  *
  * Scale posture: metadata files are manifest-grade (the spec sizes
  * manifests to ~8 MB targets); the per-snapshot file list is the
  * same driver-side bound as DeltaTable's and SnapshotTable's, stated
  * there. Write-side interop is out of scope for the same reason as
  * Delta's (the commit protocol against foreign writers is half a
  * database); the engine's own sink is parquet + SnapshotTable.
  */
object IcebergTable {

  /** `files` = live data files; `deleteFiles` = v2 POSITION-delete
    * files ((file_path, pos) parquet rows) the read must subtract. */
  final case class Snapshot(snapshotId: Long, files: Seq[String],
    deleteFiles: Seq[String] = Nil)

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Resolve the current metadata JSON through version-hint.text. */
  private def metadataFile(table: String): File = {
    val hint = Paths.get(table, "metadata", "version-hint.text")
    require(Files.exists(hint), s"not an iceberg hadoop table (no version-hint.text): $table")
    val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
    val f = new File(new File(table, "metadata"), s"v$v.metadata.json")
    require(f.exists(), s"version-hint points at missing metadata v$v at $table")
    f
  }

  def snapshot(table: String, snapshotId: Long = -1L): Snapshot = {
    val md = om.readTree(Files.readAllBytes(metadataFile(table).toPath))
    val fv = md.get("format-version").asInt()
    require(fv == 1 || fv == 2,
      s"table $table is format-version $fv; this reader implements v1 and " +
        "v2 (position deletes) — a later version's delete semantics " +
        "would silently resurrect deleted rows if ignored")
    val wanted =
      if (snapshotId >= 0) snapshotId else md.get("current-snapshot-id").asLong()
    val snaps = md.get("snapshots")
    var manifestList: String = null
    snaps.forEach { s =>
      if (s.get("snapshot-id").asLong() == wanted)
        manifestList = s.get("manifest-list").asText()
    }
    require(manifestList != null,
      s"snapshot $wanted not in metadata at $table (expired or never existed)")
    val manifests = AvroContainer.readGeneric(new File(manifestList))
      .map(_.get("manifest_path").toString)
    val entries = manifests.flatMap { mp =>
      AvroContainer.readGeneric(new File(mp)).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED: recorded, not live
        else {
          val df = e.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          // v2 entries carry data_file.content (0 data / 1 position
          // deletes / 2 equality deletes); v1 manifests lack the
          // field entirely → data (the spec's default)
          val content =
            if (df.getSchema.getField("content") == null) 0
            else df.get("content").asInstanceOf[Int]
          require(content != 2,
            s"equality-delete file in $mp: equality deletes match rows by " +
              "column VALUES and this reader implements position deletes " +
              "only — ignoring them would resurrect deleted rows")
          Some((content, df.get("file_path").toString))
        }
      }
    }
    Snapshot(wanted, entries.collect { case (0, f) => f },
      entries.collect { case (1, f) => f })
  }

  /** Read the snapshot. V2 POSITION DELETES apply MERGE-ON-READ, the
    * spec's semantics: delete files carry (file_path, pos) rows, and
    * the scan subtracts them by joining the hidden per-file row
    * ordinal (`_metadata.row_index` — Spark's native row-position
    * column, which is exactly Iceberg's `pos` ordinal) anti against
    * the delete set. Paths normalize on both sides (the metadata
    * column is a `file:` URI, the delete file stores the plain
    * location). The anti-join is the merge-on-read cost model: the
    * delete side is usually tiny and AQE broadcasts it; at a 100 TB
    * table the subtraction stays one broadcast anti-join per scan,
    * which is why engines compact position deletes back into data
    * files periodically (the g34 compaction story, stated not built).
    * Scope honesty: deletes apply to every data file in the snapshot
    * (sequence-number scoping is not modeled) — a position row names
    * its target file explicitly, so over-application is impossible.
    */
  def read(s: SparkSession, table: String, snapshotId: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = snapshot(table, snapshotId)
    require(snap.files.nonEmpty, s"empty snapshot ${snap.snapshotId} at $table")
    val data = s.read.parquet(snap.files: _*)
    if (snap.deleteFiles.isEmpty) data
    else {
      def norm(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(c, "^file:", ""), "^/+", "/")
      val dels = s.read.parquet(snap.deleteFiles: _*)
        .select(norm(col("file_path")).as("__del_fp"), col("pos").as("__del_pos"))
      data
        .withColumn("__fp", norm(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
        .join(dels, col("__fp") === col("__del_fp") &&
          col("__pos") === col("__del_pos"), "left_anti")
        .drop("__fp", "__pos")
    }
  }
}
