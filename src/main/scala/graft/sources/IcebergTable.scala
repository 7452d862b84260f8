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

  /** One v2 EQUALITY-delete file: rows whose listed columns (by
    * field id) match are deleted from data files with a STRICTLY
    * SMALLER data sequence number. */
  final case class EqDelete(path: String, equalityIds: Seq[Int], seq: Long)

  /** `files` = live data files; `deleteFiles` = v2 POSITION-delete
    * files ((file_path, pos) parquet rows) the read must subtract;
    * `eqDeletes` = v2 equality-delete files; `dataSeqs` = each data
    * file's data sequence number (inherited from its manifest — the
    * scoping that makes equality deletes correct); `fieldNames` =
    * the current schema's field-id → name map (equality_ids resolve
    * through it). */
  final case class Snapshot(snapshotId: Long, files: Seq[String],
    deleteFiles: Seq[String] = Nil,
    eqDeletes: Seq[EqDelete] = Nil,
    dataSeqs: Map[String, Long] = Map.empty,
    fieldNames: Map[Int, String] = Map.empty,
    /** file → (field id → single-value-serialized lower bound,
      * field id → upper bound) from the manifest entries'
      * `lower_bounds`/`upper_bounds` — the format's primary pruning
      * lever (spec "Manifests": column bounds are kept per data file
      * so scan planning can skip files). Files whose entries carry no
      * bounds are ABSENT — the conservative-keep witnesses. */
    colBounds: Map[String, (Map[Int, Array[Byte]], Map[Int, Array[Byte]])] =
      Map.empty)

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Resolve the current metadata JSON: through `version-hint.text`
    * when present, else by LISTING `vN.metadata.json` and taking the
    * highest N — the same fallback Iceberg's own Hadoop table
    * operations apply, because the hint file is an optimization a
    * writer may crash before refreshing (a stale hint pointing at a
    * missing file is still corruption and fails loudly — falling
    * back PAST an explicit pointer would silently time-travel). */
  private def metadataFile(table: String): File = {
    val meta = new File(table, "metadata")
    val hint = Paths.get(table, "metadata", "version-hint.text")
    if (Files.exists(hint)) {
      val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
      val f = new File(meta, s"v$v.metadata.json")
      require(f.exists(), s"version-hint points at missing metadata v$v at $table")
      f
    } else {
      val re = """v(\d+)\.metadata\.json""".r
      val vs = Option(meta.list()).toSeq.flatten
        .collect { case re(n) => n.toInt }
      require(vs.nonEmpty,
        s"not an iceberg hadoop table (no version-hint.text and no " +
          s"vN.metadata.json under metadata/): $table")
      new File(meta, s"v${vs.max}.metadata.json")
    }
  }

  def snapshot(table: String, snapshotId: Long = -1L): Snapshot = {
    val md = om.readTree(Files.readAllBytes(metadataFile(table).toPath))
    val fv = md.get("format-version").asInt()
    require(fv == 1 || fv == 2,
      s"table $table is format-version $fv; this reader implements v1 and " +
        "v2 (position + equality deletes) — a later version's delete " +
        "semantics would silently resurrect deleted rows if ignored")
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
    // field-id → name from the CURRENT schema ("schemas" +
    // "current-schema-id", or the legacy single "schema") — equality
    // deletes name their columns by field id, never by name
    val fieldNames: Map[Int, String] = {
      val schemaNode =
        if (md.has("schemas") && md.has("current-schema-id")) {
          val cur = md.get("current-schema-id").asInt()
          var found: com.fasterxml.jackson.databind.JsonNode = null
          md.get("schemas").forEach { sc =>
            if (sc.get("schema-id").asInt() == cur) found = sc
          }
          Option(found)
        } else Option(md.get("schema"))
      schemaNode.map { sc =>
        val b = Map.newBuilder[Int, String]
        sc.get("fields").forEach(f =>
          b += f.get("id").asInt() -> f.get("name").asText())
        b.result()
      }.getOrElse(Map.empty)
    }
    // per-manifest data sequence number, inherited by its entries
    // when they carry none (the spec's inheritance rule; the list
    // field is absent on v1 tables → seq 0)
    val manifests = AvroContainer.readGeneric(new File(manifestList)).map { m =>
      val seq =
        if (m.getSchema.getField("sequence_number") == null) 0L
        else Option(m.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
      (m.get("manifest_path").toString, seq)
    }
    val dataFiles = Vector.newBuilder[(String, Long)]
    val posDeletes = Vector.newBuilder[String]
    val eqDeletes = Vector.newBuilder[EqDelete]
    val bounds = Map.newBuilder[String, (Map[Int, Array[Byte]], Map[Int, Array[Byte]])]
    // bounds "maps" are spec-encoded as arrays of {key: field id,
    // value: bytes} records (Avro maps only key by string); values
    // are single-value serializations (little-endian for numerics)
    def boundMap(df: org.apache.avro.generic.GenericRecord,
        name: String): Map[Int, Array[Byte]] =
      if (df.getSchema.getField(name) == null || df.get(name) == null) Map.empty
      else df.get(name) match {
        case l: java.util.List[_] =>
          val b = Map.newBuilder[Int, Array[Byte]]
          l.forEach { kv =>
            val r = kv.asInstanceOf[org.apache.avro.generic.GenericRecord]
            val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining())
            bb.duplicate().get(arr)
            b += r.get("key").asInstanceOf[Int] -> arr
          }
          b.result()
        case _ => Map.empty // unknown encoding → no stats → no pruning
      }
    manifests.foreach { case (mp, mseq) =>
      AvroContainer.readGeneric(new File(mp)).foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status != 2) { // 2 = DELETED: recorded, not live
          val df = e.get("data_file")
            .asInstanceOf[org.apache.avro.generic.GenericRecord]
          // v2 entries carry data_file.content (0 data / 1 position
          // deletes / 2 equality deletes); v1 manifests lack the
          // field entirely → data (the spec's default)
          val content =
            if (df.getSchema.getField("content") == null) 0
            else df.get("content").asInstanceOf[Int]
          val eseq =
            if (e.getSchema.getField("sequence_number") == null) mseq
            else Option(e.get("sequence_number"))
              .map(_.asInstanceOf[Long]).getOrElse(mseq)
          val path = df.get("file_path").toString
          content match {
            case 0 =>
              dataFiles += ((path, eseq))
              val lo = boundMap(df, "lower_bounds")
              val hi = boundMap(df, "upper_bounds")
              if (lo.nonEmpty || hi.nonEmpty) bounds += path -> ((lo, hi))
            case 1 => posDeletes += path
            case 2 =>
              val idsField = df.getSchema.getField("equality_ids")
              require(idsField != null && df.get("equality_ids") != null,
                s"equality-delete file $path in $mp carries no equality_ids")
              val ids = Vector.newBuilder[Int]
              df.get("equality_ids").asInstanceOf[java.util.List[_]]
                .forEach(v => ids += v.asInstanceOf[Int])
              eqDeletes += EqDelete(path, ids.result(), eseq)
            case other => throw new IllegalStateException(
              s"unknown data_file.content $other in $mp")
          }
        }
      }
    }
    val data = dataFiles.result()
    Snapshot(wanted, data.map(_._1), posDeletes.result(), eqDeletes.result(),
      data.toMap, fieldNames, bounds.result())
  }

  /** Decode a single-value-serialized numeric bound (spec Appendix D:
    * int = 4 and long = 8 little-endian bytes). Anything else —
    * another type's encoding, a torn value — is None and the caller
    * stays conservative. */
  private def boundLong(b: Array[Byte]): Option[Long] = b.length match {
    case 8 => Some(java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
    case 4 => Some(java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong)
    case _ => None
  }

  /** The data files a `[lo, hi]` probe on `column` must open, by the
    * manifests' per-file `lower_bounds`/`upper_bounds` — Iceberg's
    * primary pruning lever, and the j17 Delta-stats twin with the
    * same CONSERVATIVE contract: a file skips only when decodable
    * bounds prove disjointness; missing bounds, an uncovered field
    * id, or an undecodable value all KEEP the file (a wrong skip
    * loses rows; an over-keep only costs IO). */
  def prunedFiles(snap: Snapshot, column: String, lo: Long, hi: Long): Seq[String] = {
    val fid = snap.fieldNames.collectFirst { case (id, n) if n == column => id }
    snap.files.filter { f =>
      (fid, snap.colBounds.get(f)) match {
        case (Some(id), Some((los, his))) =>
          val mn = los.get(id).flatMap(boundLong)
          val mx = his.get(id).flatMap(boundLong)
          mn.forall(_ <= hi) && mx.forall(_ >= lo) // overlap or unknown side
        case _ => true // no bounds for the file / unknown column → keep
      }
    }
  }

  /** Stats-pruned read: open only [[prunedFiles]], with every delete
    * discipline still applied. Callers re-apply their own predicate —
    * pruning yields a SUPERSET scan, never a filter. */
  def readPruned(s: SparkSession, table: String, column: String,
      lo: Long, hi: Long, snapshotId: Long = -1L): DataFrame = {
    val snap = snapshot(table, snapshotId)
    val keep = prunedFiles(snap, column, lo, hi)
    if (keep.isEmpty) read(s, table, snapshotId).limit(0)
    else readFiles(s, table, snap, keep)
  }

  /** Read the snapshot. V2 deletes apply MERGE-ON-READ, the spec's
    * semantics, in the spec's order:
    *
    *  - POSITION deletes: (file_path, pos) parquet rows anti-join the
    *    hidden per-file row ordinal (`_metadata.row_index` — Spark's
    *    native row-position column, which is exactly Iceberg's `pos`
    *    ordinal). A position row names its target file explicitly, so
    *    over-application is impossible.
    *  - EQUALITY deletes: value-matched on the `equality_ids` columns
    *    (field ids resolved through the schema's id → name map),
    *    null-safe (`<=>` — the spec matches null to null), and
    *    SEQUENCE-SCOPED: a delete at sequence s applies only to data
    *    files whose data sequence number is STRICTLY SMALLER, so a
    *    later re-insert of the same key — or one in the very commit
    *    that wrote the delete — survives. The scoping is load-bearing
    *    here in a way it is not for position deletes (j13 deferred
    *    it): without it, a Flink-CDC upsert stream would delete its
    *    own re-inserts. Each data file's sequence number rides in a
    *    broadcast (file → seq) lookup joined on the scan's file path.
    *
    * Paths normalize on both sides (the metadata column is a `file:`
    * URI, delete files store the plain location). The anti-joins are
    * the merge-on-read cost model: delete sides are usually tiny and
    * AQE broadcasts them; at a 100 TB table the subtraction stays a
    * broadcast anti-join per delete shape, which is why engines
    * compact deletes back into data files periodically (the g34
    * compaction story, stated not built).
    */
  def read(s: SparkSession, table: String, snapshotId: Long = -1L): DataFrame = {
    val snap = snapshot(table, snapshotId)
    readFiles(s, table, snap, snap.files)
  }

  /** Read a SUBSET of the snapshot's data files with both delete
    * disciplines applied — the kernel behind [[read]] (all files) and
    * [[readPruned]] (the stats-kept set). Extra delete rows naming
    * pruned-away files are harmless (anti-joins match nothing). */
  private def readFiles(s: SparkSession, table: String, snap: Snapshot,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(files.nonEmpty, s"empty snapshot ${snap.snapshotId} at $table")
    val data = s.read.parquet(files: _*)
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "^file:", ""), "^/+", "/")
    if (snap.deleteFiles.isEmpty && snap.eqDeletes.isEmpty) data
    else {
      var df = data.withColumn("__fp", norm(col("_metadata.file_path")))
      if (snap.deleteFiles.nonEmpty) {
        val dels = s.read.parquet(snap.deleteFiles: _*)
          .select(norm(col("file_path")).as("__del_fp"),
            col("pos").as("__del_pos"))
        df = df
          .withColumn("__pos", col("_metadata.row_index"))
          .join(dels, col("__fp") === col("__del_fp") &&
            col("__pos") === col("__del_pos"), "left_anti")
          .drop("__pos")
      }
      if (snap.eqDeletes.nonEmpty) {
        // the SAME normalization norm() applies to the metadata column
        // (strip the `file:` scheme, collapse leading slashes): a
        // manifest path of the `file:///x` form must land on the same
        // key as the scan's `file:/x` URI — an asymmetric plain
        // stripPrefix made the scope join miss and, inner-joined,
        // silently DROPPED every row of the affected data file
        def plain(p: String) =
          p.replaceFirst("^file:", "").replaceFirst("^/+", "/")
        // file → data sequence number, file-count-sized: explicit
        // broadcast so attaching the scope never shuffles the scan
        // (built from the SCANNED subset — the null guard below
        // requires exactly the scanned files to resolve)
        val seqDf = broadcast(s.createDataFrame(
          files.map(f => (plain(f), snap.dataSeqs.getOrElse(f, 0L))))
          .toDF("__sfp", "__data_seq"))
        // LEFT join + loud null guard, not inner: a path-normalization
        // mismatch must refuse the read, never lose rows silently
        df = df.join(seqDf, col("__fp") === col("__sfp"), "left")
          .withColumn("__data_seq",
            when(col("__data_seq").isNull, raise_error(concat(
              lit("iceberg eq-delete scope: no sequence number for data file "),
              col("__fp")))).otherwise(col("__data_seq")))
          .drop("__sfp")
        // one anti-join per distinct equality-id set (usually one);
        // within a set, delete files union with their own sequence
        // numbers as a literal column
        snap.eqDeletes.groupBy(_.equalityIds).toSeq
          .sortBy(_._1.mkString(",")).foreach { case (ids, dels) =>
            val names = ids.map(id => snap.fieldNames.getOrElse(id,
              throw new IllegalStateException(
                s"equality field id $id not in schema at $table " +
                  s"(known: ${snap.fieldNames.keys.toSeq.sorted.mkString(",")})")))
            val delRows = dels.map { d =>
              s.read.parquet(d.path)
                .select(names.map(n => col(n).as(s"__eq_$n")) :+
                  lit(d.seq).as("__del_seq"): _*)
            }.reduce(_ unionByName _)
            val cond = names.map(n => col(n) <=> col(s"__eq_$n"))
              .reduce(_ && _) && col("__del_seq") > col("__data_seq")
            df = df.join(delRows, cond, "left_anti")
          }
        df = df.drop("__data_seq")
      }
      df.drop("__fp")
    }
  }
}
