package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9: HDF5 scan — a minimal pure-JVM reader/writer for the HDF5 classic
  * file format, the dialect of the reference's per-zone biomass databases
  * (`BiomassAggregate.py:313-365` writes one rank-2 float64 dataset per
  * zone with `compression='lzf'` + a `Column_Names` string attribute;
  * `BiomassForecast.py:93-95` / `BiomassHindcasts.py:101` open them
  * back). Like the NetCDF/GeoTIFF/Xlsx readers this parses the at-rest
  * bytes directly — no library, no native code — so decode runs INSIDE
  * executors over Spark's `binaryFile` source: one task per database file,
  * the scale-out ingest shape ([[scanZoneSeries]]).
  *
  * Supported subset (= what the reference's h5py calls produce):
  * superblock version 0, v1 object headers, symbol-table root group
  * (v1 B-tree + local heap + SNOD), IEEE float32/float64 little-endian
  * datasets in contiguous or chunked layout, LZF filter (the only codec
  * the reference uses), fixed-size string attributes. Anything outside
  * that profile — later superblock versions, other datatype classes,
  * other filters — is rejected loudly rather than misread.
  *
  * Format reference: the public "HDF5 File Format Specification Version
  * 1.0" (classic superblock, symbol tables, v1 B-trees) and the liblzf
  * stream format used by h5py's LZF filter plugin.
  */
object Hdf5 {

  private val Magic = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF — the spec's undefined address

  final case class Dataset(name: String, dims: Seq[Long], data: Array[Double],
                           attrs: Map[String, Seq[String]])

  // ------------------------------------------------------------------ LZF
  // liblzf stream: ctrl < 0x20 → literal run of ctrl+1 bytes; else a
  // back-reference of length (ctrl>>5)+2 (+ extra byte when the 3-bit
  // length field saturates at 7) at distance ((ctrl&0x1f)<<8 | next)+1.
  object Lzf {

    def decompress(in: Array[Byte], outLen: Int): Array[Byte] = {
      val out = new Array[Byte](outLen)
      var ip = 0
      var op = 0
      while (ip < in.length && op < outLen) {
        val ctrl = in(ip) & 0xff
        ip += 1
        if (ctrl < 0x20) {
          val run = ctrl + 1
          require(ip + run <= in.length && op + run <= outLen, "corrupt LZF literal run")
          System.arraycopy(in, ip, out, op, run)
          ip += run; op += run
        } else {
          var len = ctrl >> 5
          if (len == 7) { len += in(ip) & 0xff; ip += 1 }
          len += 2
          val dist = ((ctrl & 0x1f) << 8 | (in(ip) & 0xff)) + 1
          ip += 1
          var ref = op - dist
          require(ref >= 0 && op + len <= outLen, "corrupt LZF back-reference")
          var i = 0
          while (i < len) { out(op) = out(ref); op += 1; ref += 1; i += 1 } // may overlap
        }
      }
      require(op == outLen, s"LZF stream ended at $op of $outLen bytes")
      out
    }

    /** Greedy hash-chain compressor (same format): emits back-references
      * for 3+-byte repeats within the 8 KiB window, literal runs otherwise.
      * Output may exceed input for incompressible data — callers fall back
      * to storing raw (the filter's "optional" contract). */
    def compress(in: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(in.length)
      val lit = new java.io.ByteArrayOutputStream(32)
      def flushLit(): Unit = if (lit.size > 0) {
        val b = lit.toByteArray
        var off = 0
        while (off < b.length) {
          val run = math.min(32, b.length - off)
          out.write(run - 1)
          out.write(b, off, run)
          off += run
        }
        lit.reset()
      }
      val tab = new Array[Int](1 << 13)
      java.util.Arrays.fill(tab, -1)
      def h3(p: Int): Int = {
        val v = (in(p) & 0xff) << 16 | (in(p + 1) & 0xff) << 8 | (in(p + 2) & 0xff)
        (v * 0x9e3779b1) >>> 19 // top 13 bits
      }
      var p = 0
      while (p < in.length) {
        var emitted = false
        if (p + 2 < in.length) {
          val h = h3(p)
          val cand = tab(h)
          tab(h) = p
          val dist = p - cand - 1
          if (cand >= 0 && dist < 8192 &&
              in(cand) == in(p) && in(cand + 1) == in(p + 1) && in(cand + 2) == in(p + 2)) {
            var len = 3
            val maxLen = math.min(264, in.length - p)
            while (len < maxLen && in(cand + len) == in(p + len)) len += 1
            flushLit()
            val l = len - 2
            if (l < 7) out.write((l << 5) | (dist >> 8))
            else { out.write((7 << 5) | (dist >> 8)); out.write(l - 7) }
            out.write(dist & 0xff)
            p += len
            emitted = true
          }
        }
        if (!emitted) { lit.write(in(p)); p += 1 }
      }
      flushLit()
      out.toByteArray
    }
  }

  // --------------------------------------------------------------- reader

  private final class In(val bytes: Array[Byte]) {
    val bb: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bytes(p) & 0xff
    def u16(p: Int): Int = bb.getShort(p) & 0xffff
    def u32(p: Int): Long = bb.getInt(p) & 0xffffffffL
    def u64(p: Int): Long = bb.getLong(p)
    def ascii(p: Int, n: Int): String = new String(bytes, p, n, "US-ASCII")
    def cstr(p: Int): String = {
      var e = p
      while (e < bytes.length && bytes(e) != 0) e += 1
      new String(bytes, p, e - p, "UTF-8")
    }
  }

  /** One header message: (type, body offset into the file). */
  private final case class Msg(typ: Int, off: Int, size: Int)

  private def readObjectHeader(in: In, at: Long): Seq[Msg] = {
    val p = at.toInt
    require(in.u8(p) == 1, s"only v1 object headers supported, got ${in.u8(p)} at $at")
    val nMsgs = in.u16(p + 2)
    // v1 prefix is 12 bytes; messages start on the next 8-byte boundary
    var cur = p + 16
    var remaining = nMsgs
    val out = Seq.newBuilder[Msg]
    var blockEnd = p + 16 + in.u32(p + 8).toInt
    var continuation: Option[(Long, Long)] = None
    while (remaining > 0) {
      if (cur >= blockEnd) {
        val (addr, len) = continuation.getOrElse(
          throw new IllegalArgumentException("object header overruns its block"))
        cur = addr.toInt; blockEnd = (addr + len).toInt; continuation = None
      }
      val typ = in.u16(cur)
      val size = in.u16(cur + 2)
      if (typ == 0x0010) continuation = Some((in.u64(cur + 8), in.u64(cur + 16)))
      else out += Msg(typ, cur + 8, size)
      cur += 8 + size
      remaining -= 1
    }
    out.result()
  }

  /** Datatype message → (elemSize, isFloat, isString). Floats must be the
    * two IEEE little-endian layouts the writer emits. */
  private def readDatatype(in: In, off: Int): (Int, Boolean, Boolean) = {
    val classV = in.u8(off)
    require((classV >> 4) == 1, s"only v1 datatype messages supported (got ${classV >> 4})")
    val cls = classV & 0x0f
    val size = in.u32(off + 4).toInt
    cls match {
      case 1 =>
        require((in.u8(off + 1) & 1) == 0, "only little-endian floats supported")
        require(size == 4 || size == 8, s"only float32/float64 supported, got $size bytes")
        (size, true, false)
      case 3 => (size, false, true)
      case c => throw new IllegalArgumentException(s"unsupported datatype class $c")
    }
  }

  /** Dataspace message → dims. */
  private def readDataspace(in: In, off: Int): Seq[Long] = {
    require(in.u8(off) == 1, s"only v1 dataspace messages supported, got ${in.u8(off)}")
    val rank = in.u8(off + 1)
    (0 until rank).map(i => in.u64(off + 8 + 8 * i))
  }

  /** Walk a v1 chunk B-tree (node type 1), yielding
    * (chunkOffsets, storedSize, filterMask, dataAddr). */
  private def chunkEntries(in: In, at: Long, rank: Int)
      : Seq[(Seq[Long], Int, Int, Long)] = {
    val p = at.toInt
    require(in.ascii(p, 4) == "TREE", s"expected TREE node at $at")
    require(in.u8(p + 4) == 1, "expected a chunk (type 1) B-tree node")
    val level = in.u8(p + 5)
    val n = in.u16(p + 6)
    val keySize = 8 + 8 * (rank + 1)
    var cur = p + 24
    val out = Seq.newBuilder[(Seq[Long], Int, Int, Long)]
    var i = 0
    while (i < n) {
      val size = in.u32(cur).toInt
      val mask = in.u32(cur + 4).toInt
      val offs = (0 until rank).map(d => in.u64(cur + 8 + 8 * d))
      val child = in.u64(cur + keySize)
      if (level == 0) out += ((offs, size, mask, child))
      else out ++= chunkEntries(in, child, rank)
      cur += keySize + 8
      i += 1
    }
    out.result()
  }

  private def decodeValues(raw: Array[Byte], elemSize: Int, n: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(n)(i => if (elemSize == 8) bb.getDouble(8 * i) else bb.getFloat(4 * i).toDouble)
  }

  /** Attribute message → (name, values-as-strings) for fixed-size string
    * array attributes (the reference's `Column_Names`); others → None. */
  private def readAttr(in: In, off: Int): Option[(String, Seq[String])] = {
    require(in.u8(off) == 1, s"only v1 attribute messages supported, got ${in.u8(off)}")
    val nameSize = in.u16(off + 2)
    val dtSize = in.u16(off + 4)
    val dsSize = in.u16(off + 6)
    def pad8(n: Int): Int = (n + 7) & ~7
    val nameOff = off + 8
    val name = in.cstr(nameOff)
    val dtOff = nameOff + pad8(nameSize)
    val dsOff = dtOff + pad8(dtSize)
    val dataOff = dsOff + pad8(dsSize)
    val (elemSize, _, isStr) = readDatatype(in, dtOff)
    if (!isStr) None
    else {
      val dims = readDataspace(in, dsOff)
      val n = dims.product.toInt max 1
      Some(name -> (0 until n).map { i =>
        val s = in.ascii(dataOff + i * elemSize, elemSize)
        s.takeWhile(_ != 0)
      })
    }
  }

  private def readDataset(in: In, name: String, headerAddr: Long): Dataset = {
    val msgs = readObjectHeader(in, headerAddr)
    val dims = readDataspace(in, msgs.find(_.typ == 0x0001)
      .getOrElse(throw new IllegalArgumentException(s"dataset $name: no dataspace")).off)
    val (elemSize, isFloat, _) = readDatatype(in, msgs.find(_.typ == 0x0003)
      .getOrElse(throw new IllegalArgumentException(s"dataset $name: no datatype")).off)
    require(isFloat, s"dataset $name: only float datasets supported")
    val n = dims.product.toInt
    val filters: Seq[Int] = msgs.find(_.typ == 0x000B).toSeq.flatMap { m =>
      val nf = in.u8(m.off + 1)
      var cur = m.off + 8
      (0 until nf).map { _ =>
        val id = in.u16(cur)
        val nameLen = in.u16(cur + 2)
        val nCd = in.u16(cur + 6)
        cur += 8 + nameLen + 4 * nCd + (if (nCd % 2 == 1) 4 else 0)
        id
      }
    }
    require(filters.forall(_ == 32000), s"dataset $name: only the LZF filter (32000) supported, got $filters")
    val attrs = msgs.filter(_.typ == 0x000C).flatMap(m => readAttr(in, m.off)).toMap

    val lay = msgs.find(_.typ == 0x0008)
      .getOrElse(throw new IllegalArgumentException(s"dataset $name: no layout"))
    require(in.u8(lay.off) == 3, s"dataset $name: only v3 layout messages supported")
    val data = in.u8(lay.off + 1) match {
      case 1 => // contiguous
        val addr = in.u64(lay.off + 2)
        val size = in.u64(lay.off + 10)
        require(size >= n.toLong * elemSize, s"dataset $name: contiguous region too small")
        decodeValues(java.util.Arrays.copyOfRange(in.bytes, addr.toInt, (addr + n.toLong * elemSize).toInt),
                     elemSize, n)
      case 2 => // chunked: dimensionality is rank+1 (trailing element dim)
        val rank = in.u8(lay.off + 2) - 1
        require(rank == dims.length, s"dataset $name: chunk rank ${rank} != dataspace rank ${dims.length}")
        val btree = in.u64(lay.off + 3)
        val chunkDims = (0 until rank).map(d => in.u32(lay.off + 11 + 4 * d).toInt)
        val out = new Array[Double](n)
        val rowStride = dims.drop(1).product // row-major strides for the copy below
        chunkEntries(in, btree, rank).foreach { case (offs, stored, mask, addr) =>
          val chunkN = chunkDims.product
          val raw0 = java.util.Arrays.copyOfRange(in.bytes, addr.toInt, addr.toInt + stored)
          val raw = if (filters.nonEmpty && (mask & 1) == 0)
                      Lzf.decompress(raw0, chunkN * elemSize)
                    else raw0
          val vals = decodeValues(raw, elemSize, chunkN)
          // copy the in-bounds region of this (zero-padded) chunk; all the
          // reference's datasets are rank 2, which this loop hand-rolls
          require(rank <= 2, s"dataset $name: rank-$rank chunked data not supported")
          if (rank == 1) {
            val r0 = offs(0).toInt
            var i = 0
            while (i < chunkDims(0) && r0 + i < n) { out(r0 + i) = vals(i); i += 1 }
          } else {
            val (r0, c0) = (offs(0).toInt, offs(1).toInt)
            var r = 0
            while (r < chunkDims(0) && r0 + r < dims(0)) {
              var c = 0
              while (c < chunkDims(1) && c0 + c < dims(1)) {
                out(((r0 + r) * rowStride + (c0 + c)).toInt) = vals(r * chunkDims(1) + c)
                c += 1
              }
              r += 1
            }
          }
        }
        out
      case c => throw new IllegalArgumentException(s"dataset $name: unsupported layout class $c")
    }
    Dataset(name, dims, data, attrs)
  }

  /** Parse a whole classic HDF5 file: every dataset under the root group. */
  def parse(bytes: Array[Byte]): Seq[Dataset] = {
    val in = new In(bytes)
    require(bytes.length >= 96 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Magic), "not an HDF5 file (missing signature)")
    require(in.u8(8) == 0, s"only superblock version 0 supported, got ${in.u8(8)}")
    require(in.u8(13) == 8 && in.u8(14) == 8, "only 8-byte offsets/lengths supported")
    // root group symbol table entry at offset 56: its scratch space caches
    // the B-tree and local-heap addresses
    val btreeAddr = in.u64(56 + 24)
    val heapAddr = in.u64(56 + 32)
    require(in.ascii(heapAddr.toInt, 4) == "HEAP", s"expected HEAP at $heapAddr")
    val heapData = in.u64(heapAddr.toInt + 24)

    def walkGroupBtree(at: Long): Seq[(String, Long)] = {
      val p = at.toInt
      require(in.ascii(p, 4) == "TREE", s"expected TREE node at $at")
      require(in.u8(p + 4) == 0, "expected a group (type 0) B-tree node")
      val level = in.u8(p + 5)
      val n = in.u16(p + 6)
      (0 until n).flatMap { i =>
        val child = in.u64(p + 24 + 8 + i * 16) // key0, child0, key1, child1…
        if (level > 0) walkGroupBtree(child)
        else {
          require(in.ascii(child.toInt, 4) == "SNOD", s"expected SNOD at $child")
          val nSyms = in.u16(child.toInt + 6)
          (0 until nSyms).map { s =>
            val e = child.toInt + 8 + s * 40
            (in.cstr((heapData + in.u64(e)).toInt), in.u64(e + 8))
          }
        }
      }
    }
    walkGroupBtree(btreeAddr).map { case (name, hdr) => readDataset(in, name, hdr) }
  }

  def read(path: String): Seq[Dataset] = parse(Files.readAllBytes(Paths.get(path)))

  /** One database file → long zone-series rows (zone, row index, one value
    * per column) for the reference's rank-2 (n × 2) [Date, Biomass]
    * datasets. Pure bytes-in, rows-out — callable on executors. */
  def zoneSeries(bytes: Array[Byte]): Seq[(String, Int, Double, Double)] =
    parse(bytes).flatMap { ds =>
      require(ds.dims.length == 2 && ds.dims(1) == 2,
        s"dataset ${ds.name}: expected an (n × 2) zone series, got ${ds.dims.mkString("×")}")
      (0 until ds.dims(0).toInt).map { i =>
        (ds.name, i, ds.data(2 * i), ds.data(2 * i + 1))
      }
    }

  /** Distributed S9 scan: every `.h5` under `pathGlob` decoded where its
    * bytes land (Spark `binaryFile` source → per-file decode in the task),
    * unioned into one long zone-series table. No driver-side file loop —
    * adding database files adds tasks, not driver work. */
  def scanZoneSeries(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("content").as[Array[Byte]]
      .flatMap(zoneSeries(_))
      .toDF("zone", "idx", "date_num", "value")
  }

  // --------------------------------------------------------------- writer

  /** One dataset to write: row-major doubles with the given dims. When
    * `chunkRows` > 0 the dataset is stored chunked (chunkRows × ncols per
    * chunk) behind the LZF filter — the reference's storage profile;
    * otherwise contiguous. */
  final case class DatasetSpec(name: String, dims: Seq[Long], data: Array[Double],
                               attrs: Map[String, Seq[String]] = Map.empty,
                               chunkRows: Int = 0)

  private def pad8(n: Int): Int = (n + 7) & ~7

  private def f64TypeMsg: Array[Byte] = {
    val bb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x11.toByte)              // v1, class 1 (float)
    bb.put(0x20.toByte)              // LE, implied-msb mantissa normalization
    bb.put(0x3f.toByte).put(0.toByte) // sign bit 63
    bb.putInt(8)                      // size
    bb.putShort(0).putShort(64)       // bit offset, precision
    bb.put(52.toByte).put(11.toByte)  // exponent location, size
    bb.put(0.toByte).put(52.toByte)   // mantissa location, size
    bb.putInt(1023)                   // exponent bias
    bb.array()
  }

  private def strTypeMsg(size: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x13.toByte)   // v1, class 3 (string)
    bb.put(1.toByte)      // null-padded
    bb.put(0.toByte).put(0.toByte)
    bb.putInt(size)
    bb.array()
  }

  private def dataspaceMsg(dims: Seq[Long], unlimitedMax: Boolean): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * dims.length * (if (unlimitedMax) 2 else 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).put(dims.length.toByte)
    bb.put((if (unlimitedMax) 1 else 0).toByte) // flags bit 0: max dims present
    bb.put(new Array[Byte](5))
    dims.foreach(bb.putLong)
    if (unlimitedMax) dims.foreach(_ => bb.putLong(Undef)) // h5py maxshape=(None, None)
    bb.array()
  }

  def write(path: String, datasets: Seq[DatasetSpec]): Unit = {
    require(datasets.nonEmpty && datasets.size <= 8,
      "writer emits a single SNOD: 1..8 datasets per file")
    val sorted = datasets.sortBy(_.name) // symbol tables are name-ordered
    val out = new java.io.ByteArrayOutputStream()
    def at(): Long = out.size.toLong
    def w(b: Array[Byte]): Unit = out.write(b)
    def align8(): Unit = while (out.size % 8 != 0) out.write(0)
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

    // ---- local heap: dataset names (offset 0 is the spec's empty string)
    val heapEntries = collection.mutable.LinkedHashMap[String, Long]()
    val heapBytes = {
      val hb = new java.io.ByteArrayOutputStream()
      hb.write(new Array[Byte](8)) // null string at offset 0
      sorted.foreach { d =>
        heapEntries(d.name) = hb.size.toLong
        val nb = d.name.getBytes("UTF-8")
        hb.write(nb); hb.write(0)
        while (hb.size % 8 != 0) hb.write(0)
      }
      hb.toByteArray
    }

    // ---- placeholder-then-patch assembly: lay out fixed-size structures
    // first, record the file offsets, and patch addresses at the end
    w(new Array[Byte](96))                      // superblock, patched below
    val rootHdrAddr = at()
    w(new Array[Byte](16 + 24))                 // root header: 1 symbol-table msg
    val btreeAddr = at()
    w(new Array[Byte](24 + 8 + 8 + 8))          // 1-entry group B-tree
    val heapHdrAddr = at()
    w(new Array[Byte](32))
    val heapDataAddr = at()
    w(heapBytes)
    val snodAddr = at()
    w(new Array[Byte](8 + 8 * 40))              // SNOD sized for 2k = 8 symbols

    // ---- per dataset: object header (+ chunk B-tree + chunks | raw data)
    val hdrAddrs = sorted.map { d =>
      require(d.dims.product == d.data.length,
        s"dataset ${d.name}: dims ${d.dims.mkString("×")} != ${d.data.length} values")
      val rank = d.dims.length
      val nRows = d.dims(0).toInt
      val rowLen = d.dims.drop(1).product.toInt max 1

      // data region first so the header can point at it
      var layoutBody: Array[Byte] = null
      var filterMsg: Option[Array[Byte]] = None
      if (d.chunkRows <= 0) {
        align8()
        val dataAddr = at()
        val bb = le(8 * d.data.length)
        d.data.foreach(bb.putDouble)
        w(bb.array())
        val lb = le(24)
        lb.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(8L * d.data.length)
        layoutBody = lb.array()
      } else {
        require(rank == 2, s"dataset ${d.name}: chunked writes are rank-2 only")
        val chunkDims = Seq(d.chunkRows, rowLen)
        val chunkN = d.chunkRows * rowLen
        // chunks padded to full size (the format stores whole chunks)
        val chunks = (0 until nRows by d.chunkRows).map { r0 =>
          val buf = le(8 * chunkN)
          var r = 0
          while (r < d.chunkRows) {
            var c = 0
            while (c < rowLen) {
              val v = if (r0 + r < nRows) d.data((r0 + r) * rowLen + c) else 0.0
              buf.putDouble(v)
              c += 1
            }
            r += 1
          }
          val raw = buf.array()
          val comp = Lzf.compress(raw)
          // optional-filter contract: keep raw (mask bit 0 set) if no gain
          val (stored, mask) = if (comp.length < raw.length) (comp, 0) else (raw, 1)
          align8()
          val addr = at()
          w(stored)
          (Seq(r0.toLong, 0L), stored.length, mask, addr)
        }
        align8()
        val chunkBtreeAddr = at()
        val keySize = 8 + 8 * (rank + 1)
        val bt = le(24 + chunks.length * (keySize + 8) + keySize)
        bt.put("TREE".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
          .putShort(chunks.length.toShort).putLong(Undef).putLong(Undef)
        def key(offs: Seq[Long], size: Int, mask: Int): Unit = {
          bt.putInt(size).putInt(mask)
          offs.foreach(bt.putLong)
          bt.putLong(0L) // trailing element-dim offset
        }
        chunks.foreach { case (offs, size, mask, addr) =>
          key(offs, size, mask); bt.putLong(addr)
        }
        key(Seq(d.dims(0), d.dims(1)), 0, 0) // past-the-end key
        w(bt.array())
        val lb = le(24)
        lb.put(3.toByte).put(2.toByte).put((rank + 1).toByte).putLong(chunkBtreeAddr)
        chunkDims.foreach(cd => lb.putInt(cd))
        lb.putInt(8) // element size
        layoutBody = java.util.Arrays.copyOf(lb.array(), 24)
        val fm = le(40) // 8 hdr + 8 filter desc + 8 name + 12 client data + 4 pad
        fm.put(1.toByte).put(1.toByte).put(new Array[Byte](6))
        // h5py's LZF filter: id 32000, name "lzf", optional flag, client
        // data {version, LZF_VERSION, chunk bytes}
        fm.putShort(32000.toShort).putShort(8).putShort(1).putShort(3)
        fm.put("lzf".getBytes("US-ASCII")).put(new Array[Byte](5))
        fm.putInt(4).putInt(261).putInt(8 * chunkN)
        filterMsg = Some(java.util.Arrays.copyOf(fm.array(), fm.position() + 4))
      }

      // attribute messages (fixed-size string arrays, e.g. Column_Names)
      val attrMsgs = d.attrs.toSeq.sortBy(_._1).map { case (name, values) =>
        val strSize = values.map(_.getBytes("UTF-8").length).max max 1
        val nb = name.getBytes("UTF-8") :+ 0.toByte
        val dt = strTypeMsg(strSize)
        val ds = dataspaceMsg(Seq(values.length.toLong), unlimitedMax = false)
        val body = le(8 + pad8(nb.length) + pad8(dt.length) + pad8(ds.length) + values.length * strSize)
        body.put(1.toByte).put(0.toByte)
          .putShort(nb.length.toShort).putShort(dt.length.toShort).putShort(ds.length.toShort)
        body.put(nb).put(new Array[Byte](pad8(nb.length) - nb.length))
        body.put(dt).put(new Array[Byte](pad8(dt.length) - dt.length))
        body.put(ds).put(new Array[Byte](pad8(ds.length) - ds.length))
        values.foreach { v =>
          val vb = v.getBytes("UTF-8")
          body.put(vb).put(new Array[Byte](strSize - vb.length))
        }
        body.array()
      }

      val msgs: Seq[(Int, Array[Byte])] =
        Seq(0x0001 -> dataspaceMsg(d.dims, unlimitedMax = d.chunkRows > 0),
            0x0003 -> f64TypeMsg) ++
        filterMsg.map(0x000B -> _) ++
        Seq(0x0008 -> layoutBody) ++
        attrMsgs.map(0x000C -> _)

      align8()
      val hdrAddr = at()
      val msgBytes = msgs.map { case (t, b) =>
        val padded = pad8(b.length)
        val mb = le(8 + padded)
        mb.putShort(t.toShort).putShort(padded.toShort).put(0.toByte).put(new Array[Byte](3))
        mb.put(b).put(new Array[Byte](padded - b.length))
        mb.array()
      }
      val hdr = le(16 + msgBytes.map(_.length).sum)
      hdr.put(1.toByte).put(0.toByte).putShort(msgs.length.toShort)
      hdr.putInt(1).putInt(msgBytes.map(_.length).sum)
      hdr.putInt(0) // pad to the 8-byte message boundary
      msgBytes.foreach(hdr.put)
      w(hdr.array())
      d.name -> hdrAddr
    }.toMap

    // ---- patch the fixed structures now that every address is known
    val all = out.toByteArray
    val bb = ByteBuffer.wrap(all).order(ByteOrder.LITTLE_ENDIAN)
    // superblock
    bb.position(0)
    bb.put(Magic)
    bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.put(8.toByte).put(8.toByte).put(0.toByte)
    bb.putShort(4).putShort(16)   // group leaf k, internal k
    bb.putInt(0)                  // consistency flags
    bb.putLong(0L).putLong(Undef).putLong(all.length.toLong).putLong(Undef)
    bb.putLong(0L)                // root entry: link name offset
    bb.putLong(rootHdrAddr)
    bb.putInt(1).putInt(0)        // cache type 1 (group) + reserved
    bb.putLong(btreeAddr).putLong(heapHdrAddr)
    // root object header: one symbol-table message
    bb.position(rootHdrAddr.toInt)
    bb.put(1.toByte).put(0.toByte).putShort(1).putInt(1).putInt(24).putInt(0)
    bb.putShort(0x0011).putShort(16).put(0.toByte).put(new Array[Byte](3))
    bb.putLong(btreeAddr).putLong(heapHdrAddr)
    // group B-tree: one SNOD child
    bb.position(btreeAddr.toInt)
    bb.put("TREE".getBytes("US-ASCII")).put(0.toByte).put(0.toByte).putShort(1)
    bb.putLong(Undef).putLong(Undef)
    bb.putLong(0L)                            // key0: the empty string
    bb.putLong(snodAddr)
    bb.putLong(heapEntries(sorted.last.name)) // key1: largest name in child
    // local heap header
    bb.position(heapHdrAddr.toInt)
    bb.put("HEAP".getBytes("US-ASCII")).put(0.toByte).put(new Array[Byte](3))
    bb.putLong(heapBytes.length.toLong)
    bb.putLong(1L)                // free-list head: 1 = empty (libhdf5 convention)
    bb.putLong(heapDataAddr)
    // SNOD
    bb.position(snodAddr.toInt)
    bb.put("SNOD".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
    bb.putShort(sorted.length.toShort)
    sorted.foreach { d =>
      bb.putLong(heapEntries(d.name)).putLong(hdrAddrs(d.name))
      bb.putInt(0).putInt(0).put(new Array[Byte](16))
    }
    Files.write(Paths.get(path), all)
    ()
  }
}
