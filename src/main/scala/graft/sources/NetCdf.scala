package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4: NetCDF scan — a minimal pure-JVM reader/writer for the classic
  * NetCDF-3 format (magic `CDF\x01`), the dialect of the reference's daily
  * TAMSAT rainfall files (`data_extraction_v2.py:244-247`,
  * `read_and_aggregate_tamsat_data`: `rfe(time, lat, lon)` + coordinate
  * vars, CF `scale_factor`/`add_offset`/`_FillValue` decode, time as
  * "days since ..."). Like the Xlsx/Shapefile/GeoTiff readers this parses
  * the at-rest format directly from bytes — no library, no native code —
  * so the decode can run INSIDE executors over Spark's `binaryFile` source:
  * one task per file, the 100-TB ingest shape ([[scanCells]]). Anything
  * outside the classic profile (64-bit offset, HDF5-backed NetCDF-4,
  * nested record padding beyond the spec) is rejected loudly.
  *
  * Format reference: Unidata's public "NetCDF Classic Format Specification"
  * (big-endian throughout; names and attribute values padded to 4 bytes;
  * record variables interleave one record slab per variable per record).
  */
object NetCdf {

  final case class Dim(name: String, length: Int, unlimited: Boolean)

  /** Attribute value: char attrs become String, numeric attrs doubles. */
  type AttrVal = Either[String, Array[Double]]

  final case class Variable(name: String, dimIds: Seq[Int], ncType: Int,
                            vsize: Int, begin: Long,
                            attrs: Map[String, AttrVal]) {
    def isRecord(dims: Seq[Dim]): Boolean =
      dimIds.headOption.exists(dims(_).unlimited)
  }

  final case class Nc(dims: Seq[Dim], gattrs: Map[String, AttrVal],
                      vars: Seq[Variable], numRecs: Int,
                      bytes: Array[Byte]) {
    def variable(name: String): Variable =
      vars.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no variable '$name' (have: ${vars.map(_.name).mkString(", ")})"))
  }

  private val TypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 4, 6 -> 8)

  private def pad4(n: Int): Int = (n + 3) & ~3

  // ---------------------------------------------------------------- reader

  def parse(bytes: Array[Byte]): Nc = {
    val bb = ByteBuffer.wrap(bytes) // big-endian by default
    require(bytes.length >= 4 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      "not a NetCDF classic file (missing CDF magic)")
    require(bytes(3) == 1,
      s"only classic NetCDF-3 (version 1) supported, got version byte ${bytes(3)}")
    bb.position(4)
    val numRecs = bb.getInt

    def name(): String = {
      val n = bb.getInt
      val s = new String(bytes, bb.position(), n, "UTF-8")
      bb.position(bb.position() + pad4(n))
      s
    }
    def attrValues(ncType: Int, nelems: Int): AttrVal = {
      val start = bb.position()
      val v: AttrVal = ncType match {
        case 2 => Left(new String(bytes, start, nelems, "UTF-8"))
        case 1 => Right(Array.tabulate(nelems)(i => bytes(start + i).toDouble))
        case 3 => Right(Array.tabulate(nelems)(i => bb.getShort(start + 2 * i).toDouble))
        case 4 => Right(Array.tabulate(nelems)(i => bb.getInt(start + 4 * i).toDouble))
        case 5 => Right(Array.tabulate(nelems)(i => bb.getFloat(start + 4 * i).toDouble))
        case 6 => Right(Array.tabulate(nelems)(i => bb.getDouble(start + 8 * i)))
        case t => throw new IllegalArgumentException(s"unsupported attr type $t")
      }
      bb.position(start + pad4(nelems * TypeSize(ncType)))
      v
    }
    def attrList(): Map[String, AttrVal] = {
      val tag = bb.getInt
      val n = bb.getInt
      require(tag == 0x0C || (tag == 0 && n == 0), s"bad attr list tag $tag")
      (0 until n).map { _ =>
        val nm = name()
        val t = bb.getInt
        val ne = bb.getInt
        nm -> attrValues(t, ne)
      }.toMap
    }

    val dimTag = bb.getInt
    val nDims = bb.getInt
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"bad dim list tag $dimTag")
    val dims = (0 until nDims).map { _ =>
      val nm = name()
      val len = bb.getInt
      Dim(nm, len, unlimited = len == 0)
    }

    val gattrs = attrList()

    val varTag = bb.getInt
    val nVars = bb.getInt
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"bad var list tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val nm = name()
      val nd = bb.getInt
      val dimIds = (0 until nd).map(_ => bb.getInt)
      val attrs = attrList()
      val t = bb.getInt
      val vsize = bb.getInt
      val begin = bb.getInt.toLong & 0xffffffffL // v1: 32-bit offset
      Variable(nm, dimIds, t, vsize, begin, attrs)
    }
    Nc(dims, gattrs, vars, numRecs, bytes)
  }

  def read(path: String): Nc = parse(Files.readAllBytes(Paths.get(path)))

  /** Decode a variable's full data to doubles, row-major in its dims (the
    * record dim, if any, outermost with `numRecs` entries). */
  def readVar(nc: Nc, varName: String): (Array[Double], Seq[Int]) = {
    val v = nc.variable(varName)
    val bb = ByteBuffer.wrap(nc.bytes)
    val isRec = v.isRecord(nc.dims)
    val fixedShape = (if (isRec) v.dimIds.tail else v.dimIds).map(nc.dims(_).length)
    val perRec = fixedShape.product max 1
    val shape = if (isRec) nc.numRecs +: fixedShape else v.dimIds.map(nc.dims(_).length)
    val n = shape.product max (if (v.dimIds.isEmpty) 1 else 0)
    val out = new Array[Double](n)
    val ts = TypeSize(v.ncType)
    // record vars interleave: record r's slab for this var starts at
    // begin + r * recSize, where recSize sums every record var's vsize
    // (vsize is already padded to 4; the single-record-var no-padding
    // special case only changes sub-4-byte types, which recSize below
    // reproduces by using the unpadded size when there is one record var)
    val recVars = nc.vars.filter(_.isRecord(nc.dims))
    val recSize =
      if (recVars.length == 1) {
        val rv = recVars.head
        val fs = rv.dimIds.tail.map(nc.dims(_).length).product max 1
        fs.toLong * TypeSize(rv.ncType)
      } else recVars.map(_.vsize.toLong).sum
    def get(off: Long, i: Int): Double = {
      val p = (off + i.toLong * ts).toInt
      v.ncType match {
        case 1 => nc.bytes(p).toDouble
        case 3 => bb.getShort(p).toDouble
        case 4 => bb.getInt(p).toDouble
        case 5 => bb.getFloat(p).toDouble
        case 6 => bb.getDouble(p)
        case t => throw new IllegalArgumentException(s"unsupported data type $t for '$varName'")
      }
    }
    if (isRec) {
      var r = 0
      while (r < nc.numRecs) {
        val base = v.begin + r.toLong * recSize
        var i = 0
        while (i < perRec) { out(r * perRec + i) = get(base, i); i += 1 }
        r += 1
      }
    } else {
      var i = 0
      while (i < n) { out(i) = get(v.begin, i); i += 1 }
    }
    (out, shape)
  }

  /** CF decode params from a variable's attrs: (scale, offset, fill). */
  def cfDecode(v: Variable): (Double, Double, Option[Double]) = {
    def num(k: String): Option[Double] =
      v.attrs.get(k).collect { case Right(a) if a.nonEmpty => a(0) }
    (num("scale_factor").getOrElse(1.0), num("add_offset").getOrElse(0.0),
     num("_FillValue").orElse(num("missing_value")))
  }

  /** Parse a CF "days since YYYY-MM-DD[ ...]" units string → epoch date. */
  def daysSinceEpoch(units: String): java.time.LocalDate = {
    val m = "days since (\\d{4}-\\d{2}-\\d{2})".r.findFirstMatchIn(units).getOrElse(
      throw new IllegalArgumentException(s"unsupported time units '$units'"))
    java.time.LocalDate.parse(m.group(1))
  }

  /** One file → the long cell table (date, lat, lon, value): the engine's
    * relational face of S4 (SURVEY §2.1), CF-decoded (scale/offset, fill →
    * null), dates resolved from the time var's units. Pure bytes-in,
    * rows-out — callable on executors. */
  def cells(bytes: Array[Byte], dataVar: String = "rfe", timeVar: String = "time",
            latVar: String = "lat", lonVar: String = "lon")
      : Seq[(java.sql.Date, Double, Double, Option[Double])] = {
    val nc = parse(bytes)
    val (data, shape) = readVar(nc, dataVar)
    val (times, _) = readVar(nc, timeVar)
    val (lats, _) = readVar(nc, latVar)
    val (lons, _) = readVar(nc, lonVar)
    require(shape == Seq(times.length, lats.length, lons.length),
      s"$dataVar shape $shape != (time=${times.length}, lat=${lats.length}, lon=${lons.length})")
    val (scale, offset, fill) = cfDecode(nc.variable(dataVar))
    val epoch = nc.variable(timeVar).attrs.get("units") match {
      case Some(Left(u)) => daysSinceEpoch(u)
      case _ => java.time.LocalDate.of(1970, 1, 1)
    }
    for {
      t <- times.indices
      la <- lats.indices
      lo <- lons.indices
    } yield {
      val raw = data((t * lats.length + la) * lons.length + lo)
      val value = if (fill.contains(raw) || raw.isNaN) None else Some(raw * scale + offset)
      (java.sql.Date.valueOf(epoch.plusDays(times(t).toLong)), lats(la), lons(lo), value)
    }
  }

  /** Distributed S4 scan: every `.nc` under `pathGlob` decoded where its
    * bytes land (Spark `binaryFile` source → per-file decode in the task),
    * unioned into one long cell table. No driver-side file loop — adding
    * files adds tasks, not driver work. */
  def scanCells(spark: SparkSession, pathGlob: String, dataVar: String = "rfe")
      : DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select("content").as[Array[Byte]]
      .flatMap(cells(_, dataVar))
      .toDF("date", "lat", "lon", "value")
  }

  // ---------------------------------------------------------------- writer

  /** One variable to write: data always supplied as doubles, stored as
    * `ncType` (5=float, 6=double, 4=int, 3=short). */
  final case class VarSpec(name: String, dimNames: Seq[String], ncType: Int,
                           attrs: Seq[(String, AttrVal)], data: Array[Double])

  /** K-side counterpart for round-trip tests and fixtures: write a classic
    * NetCDF-3 file. `dims` in definition order; at most one may be the
    * unlimited/record dim (length = -1), which must be every record var's
    * FIRST dim. */
  def write(path: String, dims: Seq[(String, Int)], vars: Seq[VarSpec]): Unit = {
    val dimIdx = dims.map(_._1).zipWithIndex.toMap
    val unlimited = dims.indexWhere(_._2 < 0)
    def isRec(v: VarSpec) = v.dimNames.headOption.exists(d => dimIdx(d) == unlimited)
    val recVars = vars.filter(isRec)
    val numRecs =
      if (recVars.isEmpty) 0
      else {
        val v = recVars.head
        val per = v.dimNames.tail.map(d => dims(dimIdx(d))._2).product max 1
        v.data.length / per
      }

    def nameBytes(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      ByteBuffer.allocate(4 + pad4(b.length)).putInt(b.length).put(b).array()
    }
    def attrFull(name: String, v: AttrVal, ncType: Int): Array[Byte] = {
      val nb = nameBytes(name)
      v match {
        case Left(s) =>
          val b = s.getBytes("UTF-8")
          val bb = ByteBuffer.allocate(nb.length + 8 + pad4(b.length))
          bb.put(nb).putInt(2).putInt(b.length).put(b)
          bb.array()
        case Right(a) =>
          val ts = TypeSize(ncType)
          val bb = ByteBuffer.allocate(nb.length + 8 + pad4(a.length * ts))
          bb.put(nb).putInt(ncType).putInt(a.length)
          a.foreach { d =>
            ncType match {
              case 3 => bb.putShort(d.toShort)
              case 4 => bb.putInt(d.toInt)
              case 5 => bb.putFloat(d.toFloat)
              case 6 => bb.putDouble(d)
              case t => throw new IllegalArgumentException(s"unsupported attr type $t")
            }
          }
          bb.array()
      }
    }
    def attrListBytes(attrs: Seq[(String, AttrVal)], numTypeOf: String => Int): Array[Byte] = {
      if (attrs.isEmpty) Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
      else {
        val body = attrs.flatMap { case (n, v) =>
          attrFull(n, v, v.fold(_ => 2, _ => numTypeOf(n)))
        }.toArray
        ByteBuffer.allocate(8 + body.length).putInt(0x0C).putInt(attrs.length).put(body).array()
      }
    }

    // numeric attr storage types: _FillValue etc. stored as the var's own
    // type is the CF norm, but doubles are always safe for the reader —
    // store numeric attrs as double for simplicity
    def vsizeOf(v: VarSpec): Int = {
      val fixed = (if (isRec(v)) v.dimNames.tail else v.dimNames)
        .map(d => dims(dimIdx(d))._2).product max 1
      pad4(fixed * TypeSize(v.ncType))
    }

    // header assembly with a two-pass begin computation
    def headerBytes(begins: Map[String, Long]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(b: Array[Byte]): Unit = out.write(b)
      w(Array('C'.toByte, 'D'.toByte, 'F'.toByte, 1.toByte))
      w(ByteBuffer.allocate(4).putInt(numRecs).array())
      // dims
      w(ByteBuffer.allocate(8).putInt(0x0A).putInt(dims.length).array())
      dims.foreach { case (n, len) =>
        w(nameBytes(n))
        w(ByteBuffer.allocate(4).putInt(if (len < 0) 0 else len).array())
      }
      w(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // no global attrs
      w(ByteBuffer.allocate(8).putInt(0x0B).putInt(vars.length).array())
      vars.foreach { v =>
        w(nameBytes(v.name))
        val db = ByteBuffer.allocate(4 + 4 * v.dimNames.length)
        db.putInt(v.dimNames.length)
        v.dimNames.foreach(d => db.putInt(dimIdx(d)))
        w(db.array())
        w(attrListBytes(v.attrs, _ => 6))
        w(ByteBuffer.allocate(12).putInt(v.ncType).putInt(vsizeOf(v))
          .putInt(begins(v.name).toInt).array())
      }
      out.toByteArray
    }

    val headerLen = headerBytes(vars.map(_.name -> 0L).toMap).length
    var off = headerLen.toLong
    val begins = collection.mutable.Map[String, Long]()
    vars.filterNot(isRec).foreach { v => begins(v.name) = off; off += vsizeOf(v) }
    val recStart = off
    vars.filter(isRec).foreach { v => begins(v.name) = off; off += vsizeOf(v) }
    // spec special case: a single record var packs records without padding
    val recSize =
      if (recVars.length == 1) {
        val v = recVars.head
        val fixed = v.dimNames.tail.map(d => dims(dimIdx(d))._2).product max 1
        fixed.toLong * TypeSize(v.ncType)
      } else recVars.map(vsizeOf(_).toLong).sum
    val total = recStart + (if (numRecs > 0) recSize * numRecs else 0L)

    val bb = ByteBuffer.allocate(total.toInt)
    bb.put(headerBytes(begins.toMap))
    def putVals(v: VarSpec, from: Int, count: Int, at: Long): Unit = {
      bb.position(at.toInt)
      var i = 0
      while (i < count) {
        v.ncType match {
          case 3 => bb.putShort(v.data(from + i).toShort)
          case 4 => bb.putInt(v.data(from + i).toInt)
          case 5 => bb.putFloat(v.data(from + i).toFloat)
          case 6 => bb.putDouble(v.data(from + i))
          case t => throw new IllegalArgumentException(s"unsupported data type $t")
        }
        i += 1
      }
    }
    vars.filterNot(isRec).foreach { v => putVals(v, 0, v.data.length, begins(v.name)) }
    if (numRecs > 0) {
      val perRec = recVars.map(v =>
        v.name -> (v.dimNames.tail.map(d => dims(dimIdx(d))._2).product max 1)).toMap
      var r = 0
      while (r < numRecs) {
        recVars.foreach { v =>
          putVals(v, r * perRec(v.name), perRec(v.name),
                  begins(v.name) + r.toLong * recSize)
        }
        r += 1
      }
    }
    Files.write(Paths.get(path), bb.array())
    ()
  }
}
