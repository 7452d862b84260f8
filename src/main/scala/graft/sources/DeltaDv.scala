package graft.sources

/** DELETION VECTORS for the Delta reader — the merge-on-read row
  * deletes modern writers enable BY DEFAULT, built from the public
  * format description (delta.io PROTOCOL.md, "Deletion Vectors" and
  * "Deletion Vector Descriptor Schema"): without this, the most
  * common real-world Delta table simply refuses to read (the r13
  * `minReaderVersion > 1` gate). The moving parts, each from the
  * spec:
  *
  *  - An `add` action may carry a `deletionVector` descriptor:
  *    `storageType` ("u" = UUID-named sidecar file relative to the
  *    table root, "i" = inline in the descriptor, "p" = absolute
  *    path), `pathOrInlineDv`, `offset` (sidecar only), `sizeInBytes`
  *    (the serialized bitmap's length), `cardinality` (rows deleted).
  *  - "u"/"i" payloads are Z85-encoded (the ZeroMQ base85 variant —
  *    RFC 32/Z85: 4 bytes → 5 chars over an alphabet that is safe
  *    inside JSON): for "u" the LAST 20 chars encode the 16-byte
  *    UUID naming the sidecar `deletion_vector_<uuid>.bin`, any
  *    prefix is a directory; for "i" the whole string encodes the
  *    serialized bitmap itself.
  *  - A sidecar FILE holds one format-version byte (1) then stored
  *    DVs, each framed `[int32 dataSize][data][int32 CRC-32 of
  *    data]` with BIG-endian framing ints; `offset` points at the
  *    frame, and several DVs share one file (writers pack a commit's
  *    DVs together — the fixture does too).
  *  - The bitmap `data` is a 64-bit "RoaringBitmapArray" in the
  *    portable format: int32 magic 1681511377, int64 bitmap count,
  *    then each 32-bit RoaringBitmap's standard portable
  *    serialization in key order (bitmap k holds the row ordinals
  *    whose high 32 bits equal k) — all LITTLE-endian, per the
  *    RoaringBitmap portable spec.
  *
  * A deleted row is identified by its ORDINAL within its data file —
  * exactly Spark's native `_metadata.row_index`, so subtraction is
  * the same anti-join the Iceberg v2 reader uses for position
  * deletes (j13). Scale posture: descriptors are manifest-grade (a
  * few dozen bytes per file); the bitmap DECODE runs executor-side
  * ([[DeltaTable.read]] ships [[Entry]] rows through a typed flatMap),
  * so a 100 TB table's DVs never pass through the driver — the
  * expanded (file, ordinal) set is partitioned like any other frame
  * and usually broadcast by AQE into the anti-join.
  *
  * The WRITER half ([[writeDvFile]], [[serializeBitmap]], [[z85Encode]])
  * exists for the fixture only — this engine never writes Delta
  * (DeltaTable's write-side scope note) — but round-tripping through
  * our own writer is also what makes the spec's framing/CRC checks
  * testable.
  */
object DeltaDv extends Serializable {

  /** One decodable unit shipped to executors: the data file's
    * normalized absolute path, the table root sidecars resolve
    * against, and the descriptor fields (offset −1 = absent). */
  final case class Entry(path: String, tableRoot: String,
    storageType: String, pathOrInlineDv: String, offset: Int,
    sizeInBytes: Int, cardinality: Long)

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private lazy val z85Dec: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 52200625L // 85^4
      while (div >= 1) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** z85 with zero-padding to 4-byte alignment — the INLINE
    * descriptor's encoding: the codec needs aligned input, and the
    * descriptor's `sizeInBytes` carries the true length, so the
    * decoder trims the pad (which is why sizeInBytes is load-bearing
    * for inline DVs, not a hint). */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    z85Encode(bytes ++ Array.fill(pad)(0.toByte))
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Dec(c) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xFF).toByte
      out(o + 1) = ((v >>> 16) & 0xFF).toByte
      out(o + 2) = ((v >>> 8) & 0xFF).toByte
      out(o + 3) = (v & 0xFF).toByte
      i += 5
      o += 4
    }
    out
  }

  /** RoaringBitmapArray portable-format magic (PROTOCOL.md). */
  val Magic = 1681511377

  /** Serialize row ordinals as a portable 64-bit RoaringBitmapArray:
    * one 32-bit bitmap per high word, dense from 0 (empty bitmaps
    * included — the reader indexes by position). */
  def serializeBitmap(positions: Seq[Long]): Array[Byte] = {
    import org.roaringbitmap.RoaringBitmap
    require(positions.forall(_ >= 0), "negative row ordinal")
    val byHigh = positions.groupBy(p => (p >>> 32).toInt)
    val n = if (positions.isEmpty) 0 else byHigh.keys.max + 1
    val bitmaps = (0 until n).map { k =>
      val rb = new RoaringBitmap()
      byHigh.getOrElse(k, Nil).foreach(p => rb.add((p & 0xFFFFFFFFL).toInt))
      rb.runOptimize()
      rb
    }
    val size = 12 + bitmaps.map(_.serializedSizeInBytes()).sum
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(n.toLong)
    bitmaps.foreach(_.serialize(buf))
    buf.array()
  }

  def deserializeBitmap(data: Array[Byte]): Array[Long] = {
    import org.roaringbitmap.RoaringBitmap
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = buf.getLong
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var k = 0L
    while (k < n) {
      val start = buf.position()
      val rb = new RoaringBitmap()
      rb.deserialize(buf)
      // position explicitly past this bitmap — deserialize(ByteBuffer)
      // does not contract to advance the buffer
      buf.position(start + rb.serializedSizeInBytes())
      val high = k << 32
      rb.forEach((i: Int) => { out += (high | (i & 0xFFFFFFFFL)); () })
      k += 1
    }
    out.toArray
  }

  /** Write one sidecar FILE holding several DVs (fixture writer);
    * returns (offset, sizeInBytes, cardinality) per input, in order —
    * exactly the descriptor fields the matching `add` actions need. */
  def writeDvFile(f: java.io.File, dvs: Seq[Seq[Long]]): Seq[(Int, Int, Long)] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(1) // file format version
    val dos = new java.io.DataOutputStream(bos)
    val metas = dvs.map { positions =>
      val data = serializeBitmap(positions)
      val off = bos.size()
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      dos.writeInt(data.length) // big-endian framing, per the file format
      dos.write(data)
      dos.writeInt(crc.getValue.toInt)
      dos.flush()
      (off, data.length, positions.length.toLong)
    }
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    metas
  }

  /** Resolve a "u" descriptor's sidecar: the last 20 chars of
    * `pathOrInlineDv` z85-encode the 16-byte UUID naming
    * `deletion_vector_<uuid>.bin`; any prefix is a directory under
    * the table root. */
  def sidecarPath(tableRoot: String, pathOrInlineDv: String): java.io.File = {
    require(pathOrInlineDv.length >= 20,
      s"'u' descriptor too short for a z85 UUID: $pathOrInlineDv")
    val (prefix, enc) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val bb = java.nio.ByteBuffer.wrap(z85Decode(enc))
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new java.io.File(tableRoot, name)
    else new java.io.File(new java.io.File(tableRoot, prefix), name)
  }

  /** Decode an [[Entry]] to its deleted row ordinals. Runs
    * EXECUTOR-side (the flatMap in DeltaTable.read); every integrity
    * check the format offers fires here — size vs descriptor, CRC-32,
    * file format version — because a torn DV read as empty would
    * silently RESURRECT deleted rows. */
  def positions(e: Entry): Array[Long] = e.storageType match {
    case "i" =>
      val raw = z85Decode(e.pathOrInlineDv)
      require(raw.length >= e.sizeInBytes,
        s"inline DV shorter than descriptor sizeInBytes for ${e.path}")
      deserializeBitmap(raw.take(e.sizeInBytes))
    case "u" | "p" =>
      val f = if (e.storageType == "p") new java.io.File(e.pathOrInlineDv)
              else sidecarPath(e.tableRoot, e.pathOrInlineDv)
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      require(bytes.nonEmpty && bytes(0) == 1,
        s"unsupported DV file format version in $f")
      // the descriptor's offset field is OPTIONAL per PROTOCOL.md: a
      // writer that packs one DV right after the format-version byte
      // may omit it (our reader carries absence as -1) — default to 1,
      // the first post-version position, rather than refuse a
      // spec-valid table
      val off = if (e.offset >= 0) e.offset else 1
      require(off > 0 && off + 8 + e.sizeInBytes <= bytes.length,
        s"DV frame [$off, +${e.sizeInBytes}] outside $f (${bytes.length} bytes)")
      val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian framing
      buf.position(off)
      val len = buf.getInt
      require(len == e.sizeInBytes,
        s"DV size mismatch in $f: descriptor ${e.sizeInBytes}, stored $len")
      val data = new Array[Byte](len)
      buf.get(data)
      val crcStored = buf.getInt
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      require(crc.getValue.toInt == crcStored,
        s"DV checksum mismatch in $f at offset $off")
      deserializeBitmap(data)
    case other =>
      throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }
}
