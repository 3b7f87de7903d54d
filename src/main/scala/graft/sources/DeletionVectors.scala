package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.CRC32

/** Delta deletion vectors — protocol v3 `deletionVectors` reader feature
  * (reference reads these through delta-kernel in
  * /root/reference/extension/delta/src/functions/delta_scan.cpp; this is
  * a from-scratch implementation of the PUBLIC formats).
  *
  * A DV marks row positions of a data file as deleted without rewriting
  * the file. Three layers, all published specs:
  *
  *  1. descriptor (in the `add` action): `storageType` `u` (UUID-named
  *     sidecar file), `i` (inline), or `p` (absolute path);
  *     `pathOrInlineDv`; byte `offset` into the sidecar; `sizeInBytes`
  *     of the serialized bitmap; `cardinality`.
  *  2. sidecar file layout: 1-byte format version (1), then per stored
  *     DV at its descriptor offset: int32 big-endian length, the DV
  *     bytes, int32 big-endian CRC-32 of those bytes.
  *  3. DV bytes: int32 LITTLE-endian magic 1681511377, then a 64-bit
  *     RoaringBitmapArray in "portable" form — int64 LE count of 32-bit
  *     roaring bitmaps, each in the standard RoaringFormatSpec
  *     little-endian serialization (array / bitmap / run containers).
  *     Bitmap i holds the low 32 bits of row indexes with high bits = i.
  *
  * Scale posture: one DV is O(deleted rows in one file) — bounded by
  * file row count (~1M for 128 MB files), decoded once per task on the
  * executor that scans the file's group, never collected globally.
  */
object DeletionVectors {

  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Long],
      sizeInBytes: Long,
      cardinality: Long) {
    /** The spec's DV identity: file actions reconcile on the key
      * (path, deletionVector.uniqueId) — delta-spark's
      * DeletionVectorDescriptor.uniqueId and delta-kernel's FileActionKey
      * use exactly this storageType+path+offset concatenation. A remove
      * must carry the SAME uniqueId as the add it tombstones.
      */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.map("@" + _).getOrElse("")
  }

  // ---------------------------------------------------------------- Z85
  // ZeroMQ base85 alphabet — the encoding Delta uses for DV UUIDs and
  // inline DV payloads (4 bytes <-> 5 chars, big-endian group value).
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 encodes 4-byte groups, got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(Z85(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups, got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  // ------------------------------------------------- roaring (de)serde
  private val MagicNumber = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Decode the DV payload (magic + portable RoaringBitmapArray) into
    * sorted row indexes. Container types per RoaringFormatSpec: array
    * (sorted uint16s), bitmap (1024 uint64 words), run (uint16 pairs).
    */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == MagicNumber,
      s"deletion vector magic mismatch: $magic != $MagicNumber")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"implausible bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var b = 0L
    while (b < nBitmaps) {
      val high = b << 32
      val cookieWord = buf.getInt
      val cookie = cookieWord & 0xffff
      val (nContainers, runBitset) = cookie match {
        case SerialCookieNoRun =>
          (buf.getInt, Array.empty[Byte])
        case SerialCookie =>
          val n = (cookieWord >>> 16) + 1
          val bs = new Array[Byte]((n + 7) / 8)
          buf.get(bs)
          (n, bs)
        case other =>
          throw new IllegalArgumentException(s"unknown roaring cookie $other")
      }
      def isRun(c: Int): Boolean =
        runBitset.nonEmpty && (runBitset(c / 8) & (1 << (c % 8))) != 0
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var c = 0
      while (c < nContainers) {
        keys(c) = buf.getShort & 0xffff
        cards(c) = (buf.getShort & 0xffff) + 1
        c += 1
      }
      // offset section present for the no-run cookie, or run cookie with
      // >= NoOffsetThreshold containers; values are redundant for a
      // sequential reader — skip
      if (cookie == SerialCookieNoRun || nContainers >= NoOffsetThreshold)
        buf.position(buf.position() + 4 * nContainers)
      c = 0
      while (c < nContainers) {
        val base = high | (keys(c).toLong << 16)
        if (isRun(c)) {
          val nRuns = buf.getShort & 0xffff
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort & 0xffff
            val len = buf.getShort & 0xffff
            var v = 0
            while (v <= len) { out += base | (start + v); v += 1 }
            r += 1
          }
        } else if (cards(c) > 4096) { // bitmap container: 1024 words
          var w = 0
          while (w < 1024) {
            var word = buf.getLong
            val wordBase = base | (w << 6)
            while (word != 0) {
              out += wordBase | java.lang.Long.numberOfTrailingZeros(word)
              word &= word - 1
            }
            w += 1
          }
        } else { // array container
          var v = 0
          while (v < cards(c)) { out += base | (buf.getShort & 0xffff); v += 1 }
        }
        c += 1
      }
      b += 1
    }
    out.result()
  }

  /** Serialize sorted row indexes as the DV payload (magic + portable
    * array). Array containers only — a WRITER may always choose them
    * (they are valid at any cardinality ≤ 4096 per chunk; we split
    * chunks by the 16-bit key, each ≤ 65536 values, emitting bitmap
    * containers past 4096) — readers must accept every container type.
    */
  def serialize(rowIndexes: Array[Long]): Array[Byte] = {
    require(rowIndexes.sameElements(rowIndexes.sorted.distinct),
      "row indexes must be sorted and distinct")
    val byBitmap = rowIndexes.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val nBitmaps = if (byBitmap.isEmpty) 0L else byBitmap.last._1 + 1
    val bitmaps = (0L until nBitmaps).map { i =>
      byBitmap.find(_._1 == i).map(_._2.map(v => (v & 0xffffffffL).toInt))
        .getOrElse(Array.empty[Int])
    }
    val serialized = bitmaps.map(serializeBitmap32)
    val size = 4 + 8 + serialized.map(_.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(MagicNumber)
    buf.putLong(nBitmaps)
    serialized.foreach(buf.put)
    buf.array()
  }

  private def serializeBitmap32(values: Array[Int]): Array[Byte] = {
    val byKey = values.map(_.toLong & 0xffffffffL).groupBy(v => (v >>> 16).toInt)
      .toSeq.sortBy(_._1)
    val containers = byKey.map { case (k, vs) =>
      (k, vs.map(v => (v & 0xffff).toInt).sorted)
    }
    val n = containers.size
    val bodies = containers.map { case (_, vs) =>
      if (vs.length > 4096) { // bitmap container
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >>> 6) |= 1L << (v & 63))
        val bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(bb.putLong)
        bb.array()
      } else {
        val bb = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(v => bb.putShort(v.toShort))
        bb.array()
      }
    }
    val size = 8 + 4 * n + 4 * n + bodies.map(_.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(n)
    containers.foreach { case (k, vs) =>
      bb.putShort(k.toShort); bb.putShort((vs.length - 1).toShort)
    }
    var off = 8 + 4 * n + 4 * n
    bodies.foreach { body => bb.putInt(off); off += body.length }
    bodies.foreach(bb.put)
    bb.array()
  }

  // ------------------------------------------------------- file layout

  /** Write one DV into a sidecar file, returning the descriptor for the
    * add action. storageType `u`: file named
    * `deletion_vector_<uuid>.bin` under the table root, referenced by
    * the z85 of the uuid bytes.
    */
  def writeSidecar(tablePath: String, rowIndexes: Array[Long],
                   uuid: java.util.UUID): Descriptor = {
    val data = serialize(rowIndexes)
    val file = Paths.get(tablePath, s"deletion_vector_${uuid.toString}.bin")
    val crc = new CRC32
    crc.update(data)
    val buf = ByteBuffer.allocate(1 + 4 + data.length + 4) // big-endian framing
    buf.put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
    Files.write(file, buf.array())
    val uuidBytes = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    Descriptor("u", z85Encode(uuidBytes), Some(1L), data.length, rowIndexes.length)
  }

  /** Inline descriptor (storageType `i`): payload z85 in the action
    * itself, zero-padded to the 4-byte z85 group (sizeInBytes recovers
    * the true length on read).
    */
  def inlineDescriptor(rowIndexes: Array[Long]): Descriptor = {
    val data = serialize(rowIndexes)
    val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
    Descriptor("i", z85Encode(padded), None, data.length, rowIndexes.length)
  }

  /** Resolve a descriptor to its deleted row indexes. */
  /** On-disk sidecar file a descriptor references, if any (None for
    * inline DVs) — the resolution half of [[read]]'s `u`/`p` cases,
    * shared with vacuum's live-file accounting.
    */
  def sidecarFile(tablePath: String, d: Descriptor): Option[java.nio.file.Path] =
    d.storageType match {
      case "u" =>
        val s = d.pathOrInlineDv
        require(s.length >= 20, s"malformed DV uuid reference '$s'")
        val (prefix, z) = (s.dropRight(20), s.takeRight(20))
        val b = ByteBuffer.wrap(z85Decode(z))
        val uuid = new java.util.UUID(b.getLong, b.getLong)
        val dir = if (prefix.isEmpty) Paths.get(tablePath)
          else Paths.get(tablePath, prefix)
        Some(dir.resolve(s"deletion_vector_$uuid.bin"))
      case "p" => Some(Paths.get(d.pathOrInlineDv))
      case _ => None
    }

  def read(tablePath: String, d: Descriptor): Array[Long] = d.storageType match {
    case "i" =>
      val raw = z85Decode(d.pathOrInlineDv)
      require(raw.length >= d.sizeInBytes,
        s"inline DV shorter (${raw.length}) than sizeInBytes=${d.sizeInBytes}")
      deserialize(java.util.Arrays.copyOf(raw, d.sizeInBytes.toInt))
    case "u" | "p" =>
      // "u": pathOrInlineDv = [<random prefix>]<20-char z85 uuid>
      readFromFile(sidecarFile(tablePath, d).get, d)
    case other =>
      throw new UnsupportedOperationException(s"DV storageType '$other'")
  }

  private def readFromFile(file: Path, d: Descriptor): Array[Long] = {
    val all = Files.readAllBytes(file)
    require(all.nonEmpty && all(0) == 1,
      s"unsupported DV file format version ${if (all.isEmpty) "<empty>" else all(0)} at $file")
    val off = d.offset.getOrElse(1L).toInt
    val buf = ByteBuffer.wrap(all) // framing ints are big-endian
    buf.position(off)
    val len = buf.getInt
    require(len == d.sizeInBytes,
      s"DV length $len at offset $off != descriptor sizeInBytes ${d.sizeInBytes}")
    val data = new Array[Byte](len)
    buf.get(data)
    val storedCrc = buf.getInt
    val crc = new CRC32
    crc.update(data)
    require(crc.getValue.toInt == storedCrc,
      s"DV checksum mismatch at $file offset $off")
    deserialize(data)
  }
}
