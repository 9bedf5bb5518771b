package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** S6 — NetCDF/HDF5 array-file metadata scan without native libs
  * (the SURVEY §7.4 plan executed in the [[GeoTiff]] style: parse the
  * container headers directly, partition-parallel, fall back to
  * `Left(reason)` on anything unrecognized).
  *
  * The reference opens every file with the netCDF4 library to read a
  * configured variable's shape and `_FillValue` and the x/y coordinate
  * variables' min/max extent (`cogify/handler.py:96-120`). Both
  * on-disk formats behind that API are parsed here:
  *
  *  - '''NetCDF classic''' (CDF-1/CDF-2, big-endian): the full header
  *    — dimensions, global/variable attributes, variable shapes and
  *    data offsets — plus the DATA of 1-D fixed coordinate variables,
  *    so x/y extents are exact (the header stores `begin`/`vsize` per
  *    variable; coordinate vectors are tiny).
  *  - '''HDF5''' (= NetCDF-4 container, little-endian metadata):
  *    superblock v0/v1, symbol-table group walk (B-tree v1 → SNOD →
  *    local heap names), and per-object header messages — dataspace
  *    (shape), datatype (class/size), fill value. Chunked data is NOT
  *    decoded, so coordinate extents fall back to the reference's
  *    global default `[-180, -90, 180, 90]` (`handler.py:119-120`) —
  *    the same thing the reference does when x/y variables are not
  *    configured.
  */
object NetCdf {

  /** One attribute: numeric values or a string (NC_CHAR / HDF5 string). */
  case class Attr(name: String, str: Option[String], nums: Seq[Double])

  /** One variable/dataset: `path` is "var" or "group/var". `begin` is
    * the file offset of the raw data (classic always; HDF5 only for
    * contiguous layout — chunked data is not decoded). */
  case class VarMeta(path: String, shape: Seq[Long], typeName: String,
                     fillValue: Option[Double], attrs: Seq[Attr],
                     begin: Option[Long] = None,
                     /** data byte order: classic is big-endian; HDF5
                       * reports it in the datatype bit field */
                     littleEndian: Boolean = false)

  case class FileMeta(format: String, dims: Seq[(String, Long)],
                      vars: Seq[VarMeta], globalAttrs: Seq[Attr])

  def parse(bytes: Array[Byte]): Either[String, FileMeta] =
    if (bytes.length >= 4 && bytes(0) == 'C' && bytes(1) == 'D' &&
        bytes(2) == 'F' && (bytes(3) == 1 || bytes(3) == 2))
      parseClassic(bytes)
    else if (findHdf5Superblock(bytes).isDefined) parseHdf5(bytes)
    else Left("not recognized as NetCDF classic or HDF5")

  // ---------------------------------------------------------------
  // NetCDF classic (CDF-1 / CDF-2) — spec: "NetCDF Classic Format"
  // ---------------------------------------------------------------

  private val NcTypeNames = Map(1 -> "byte", 2 -> "char", 3 -> "short",
    4 -> "int", 5 -> "float", 6 -> "double")
  private val NcTypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 4, 6 -> 8)

  private class ClassicReader(bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 0
    def u32(): Long = { val v = buf.getInt(pos) & 0xFFFFFFFFL; pos += 4; v }
    def i64(): Long = { val v = buf.getLong(pos); pos += 8; v }
    def name(): String = {
      val n = u32().toInt
      val s = new String(bytes, pos, n, java.nio.charset.StandardCharsets.UTF_8)
      pos += (n + 3) / 4 * 4 // names pad to a 4-byte boundary
      s
    }
    def attrValues(ncType: Int, nelems: Int): Attr = {
      val width = NcTypeSizes(ncType)
      val total = (nelems * width + 3) / 4 * 4
      val out =
        if (ncType == 2) {
          Attr("", Some(new String(bytes, pos, nelems,
            java.nio.charset.StandardCharsets.UTF_8)), Nil)
        } else {
          val vs = (0 until nelems).map { i =>
            val o = pos + i * width
            ncType match {
              case 1 => bytes(o).toDouble
              case 3 => buf.getShort(o).toDouble
              case 4 => buf.getInt(o).toDouble
              case 5 => buf.getFloat(o).toDouble
              case 6 => buf.getDouble(o)
            }
          }
          Attr("", None, vs)
        }
      pos += total
      out
    }
    def attrList(): Seq[Attr] = {
      val tag = u32(); val n = u32().toInt
      if (tag == 0 && n == 0) Nil // ABSENT
      else {
        require(tag == 0x0C, s"bad NC_ATTRIBUTE tag $tag")
        (0 until n).map { _ =>
          val nm = name()
          val t = u32().toInt
          val ne = u32().toInt
          attrValues(t, ne).copy(name = nm)
        }
      }
    }
  }

  private def parseClassic(bytes: Array[Byte]): Either[String, FileMeta] = try {
    val version = bytes(3)
    val r = new ClassicReader(bytes)
    r.pos = 4
    r.u32() // numrecs (or STREAMING)
    // dim_list
    val dimTag = r.u32(); val nDims = r.u32().toInt
    val dims: Seq[(String, Long)] =
      if (dimTag == 0 && nDims == 0) Nil
      else {
        require(dimTag == 0x0A, s"bad NC_DIMENSION tag $dimTag")
        (0 until nDims).map(_ => (r.name(), r.u32()))
      }
    val gatts = r.attrList()
    // var_list
    val varTag = r.u32(); val nVars = r.u32().toInt
    val vars: Seq[VarMeta] =
      if (varTag == 0 && nVars == 0) Nil
      else {
        require(varTag == 0x0B, s"bad NC_VARIABLE tag $varTag")
        (0 until nVars).map { _ =>
          val nm = r.name()
          val nd = r.u32().toInt
          val dimIds = (0 until nd).map(_ => r.u32().toInt)
          val vatts = r.attrList()
          val t = r.u32().toInt
          r.u32() // vsize
          val begin = if (version == 2) r.i64() else r.u32()
          val fill = vatts.find(_.name == "_FillValue")
            .flatMap(_.nums.headOption)
          VarMeta(nm, dimIds.map(i => dims(i)._2), NcTypeNames(t), fill,
            vatts, Some(begin))
        }
      }
    Right(FileMeta(s"netcdf-classic CDF-$version", dims, vars, gatts))
  } catch {
    case e: Exception => Left(s"netcdf parse failed: ${e.getMessage}")
  }

  private def dataOrder(v: VarMeta): ByteOrder =
    if (v.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN

  private def readValue(bytes: Array[Byte], buf: ByteBuffer, v: VarMeta,
                        base: Long, i: Int): Double = v.typeName match {
    case "float" => buf.getFloat(base.toInt + i * 4).toDouble
    case "double" => buf.getDouble(base.toInt + i * 8)
    case "int" => buf.getInt(base.toInt + i * 4).toDouble
    case "short" => buf.getShort(base.toInt + i * 2).toDouble
    case "byte" => bytes(base.toInt + i).toDouble
    case "long" => buf.getLong(base.toInt + i * 8).toDouble
    case other =>
      throw new IllegalArgumentException(s"unreadable type $other")
  }

  /** min/max of a 1-D fixed-size coordinate variable, read from the
    * data at the header's offset (exactly the values
    * `src[x_variable][:].min()/.max()` sees, `handler.py:114-117`) —
    * classic data sections and contiguous HDF5 datasets alike. None
    * for record/multi-dim/absent/chunked variables. */
  def coordExtent(bytes: Array[Byte], meta: FileMeta, varName: String)
  : Option[(Double, Double)] =
    meta.vars.find(_.path == varName).flatMap { v =>
      if (v.shape.size != 1 || v.shape.head == 0) None
      else v.begin.flatMap { b =>
        val n = v.shape.head.toInt
        val buf = ByteBuffer.wrap(bytes).order(dataOrder(v))
        val vals =
          try (0 until n).map(i => readValue(bytes, buf, v, b, i))
          catch { case _: IllegalArgumentException => return None }
        if (vals.isEmpty) None else Some((vals.min, vals.max))
      }
    }

  /** Row-major data of a fixed-size variable of any rank — the array
    * `hdf5_to_cog` reads into memory (`handler.py:100-105`). Classic
    * data sections and contiguous HDF5 datasets; None for chunked. */
  def readGridRaw(bytes: Array[Byte], meta: FileMeta, varPath: String)
  : Option[Array[Float]] =
    meta.vars.find(_.path == varPath).flatMap { v =>
      if (v.shape.isEmpty || v.shape.exists(_ == 0)) None
      else v.begin.map { b =>
        val n = v.shape.product.toInt
        val buf = ByteBuffer.wrap(bytes).order(dataOrder(v))
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          out(i) = readValue(bytes, buf, v, b, i).toFloat
          i += 1
        }
        out
      }
    }

  /** 2-D restriction of [[readGridRaw]]. */
  def readGrid2D(bytes: Array[Byte], meta: FileMeta, varPath: String)
  : Option[Array[Float]] =
    meta.vars.find(_.path == varPath)
      .filter(_.shape.size == 2)
      .flatMap(_ => readGridRaw(bytes, meta, varPath))

  // ---------------------------------------------------------------
  // HDF5 — superblock v0/v1 + symbol-table groups (the layout the
  // netCDF-4/HDF5 1.8 line writes by default)
  // ---------------------------------------------------------------

  private val Hdf5Magic =
    Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')

  private def findHdf5Superblock(bytes: Array[Byte]): Option[Int] = {
    var off = 0
    while (off + 8 <= bytes.length && off <= (1 << 16)) {
      if ((0 until 8).forall(i => bytes(off + i) == Hdf5Magic(i)))
        return Some(off)
      off = if (off == 0) 512 else off * 2
    }
    None
  }

  private def parseHdf5(bytes: Array[Byte]): Either[String, FileMeta] = try {
    val sb = findHdf5Superblock(bytes).get
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sbVersion = bytes(sb + 8) & 0xFF
    if (sbVersion > 1)
      return Left(s"unsupported HDF5 superblock version $sbVersion")
    val offSize = bytes(sb + 13) & 0xFF
    val lenSize = bytes(sb + 14) & 0xFF
    if (offSize != 8 || lenSize != 8)
      return Left(s"unsupported HDF5 offset/length size $offSize/$lenSize")
    // v1 inserts 4 bytes (indexed-storage k + reserved) before the
    // file-consistency flags
    val rootEntry = sb + (if (sbVersion == 0) 56 else 60)
    // symbol table entry: nameOff(8) objHdr(8) cacheType(4) rsvd(4)
    // scratch(16) = B-tree address + heap address for cache type 1
    val rootBtree = buf.getLong(rootEntry + 24)
    val rootHeap = buf.getLong(rootEntry + 32)

    val out = ArrayBuffer.empty[VarMeta]
    walkGroup(bytes, buf, rootBtree, rootHeap, prefix = "", depth = 0, out)
    Right(FileMeta(s"hdf5 superblock-v$sbVersion", Nil, out.toSeq, Nil))
  } catch {
    case e: Exception => Left(s"hdf5 parse failed: ${e.getMessage}")
  }

  private def heapName(bytes: Array[Byte], buf: ByteBuffer, heapAddr: Long,
                       nameOff: Long): String = {
    require(bytes(heapAddr.toInt) == 'H' && bytes(heapAddr.toInt + 1) == 'E',
      "bad local heap signature")
    val dataAddr = buf.getLong(heapAddr.toInt + 24)
    var p = (dataAddr + nameOff).toInt
    val start = p
    while (bytes(p) != 0) p += 1
    new String(bytes, start, p - start,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private def walkGroup(bytes: Array[Byte], buf: ByteBuffer, btreeAddr: Long,
                        heapAddr: Long, prefix: String, depth: Int,
                        out: ArrayBuffer[VarMeta]): Unit = {
    require(depth <= 6, "group nesting too deep")
    walkBtree(bytes, buf, btreeAddr, heapAddr, prefix, depth, out)
  }

  private def walkBtree(bytes: Array[Byte], buf: ByteBuffer, addr: Long,
                        heapAddr: Long, prefix: String, depth: Int,
                        out: ArrayBuffer[VarMeta]): Unit = {
    val a = addr.toInt
    val sig = new String(bytes, a, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(sig == "TREE", s"bad B-tree signature '$sig'")
    val level = bytes(a + 5) & 0xFF
    val entries = buf.getShort(a + 6) & 0xFFFF
    // keys and children alternate after the 24-byte node header:
    // key0(len) child0(off) key1 ... key_n — children at +24+len+ i*(len+off)
    (0 until entries).foreach { i =>
      val child = buf.getLong(a + 24 + 8 + i * 16)
      if (level > 0) walkBtree(bytes, buf, child, heapAddr, prefix, depth, out)
      else walkSnod(bytes, buf, child, heapAddr, prefix, depth, out)
    }
  }

  private def walkSnod(bytes: Array[Byte], buf: ByteBuffer, addr: Long,
                       heapAddr: Long, prefix: String, depth: Int,
                       out: ArrayBuffer[VarMeta]): Unit = {
    val a = addr.toInt
    val sig = new String(bytes, a, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(sig == "SNOD", s"bad symbol node signature '$sig'")
    val n = buf.getShort(a + 6) & 0xFFFF
    (0 until n).foreach { i =>
      val e = a + 8 + i * 40
      val nameOff = buf.getLong(e)
      val objHdr = buf.getLong(e + 8)
      val name = heapName(bytes, buf, heapAddr, nameOff)
      parseObjectHeader(bytes, buf, objHdr, prefix + name, depth, out)
    }
  }

  private def parseObjectHeader(bytes: Array[Byte], buf: ByteBuffer,
                                addr: Long, path: String, depth: Int,
                                out: ArrayBuffer[VarMeta]): Unit = {
    val a = addr.toInt
    require((bytes(a) & 0xFF) == 1, s"unsupported object header version")
    val nMsgs = buf.getShort(a + 2) & 0xFFFF
    var shape: Option[Seq[Long]] = None
    var typeClass = -1
    var typeSize = 0
    var typeLittleEndian = true
    var fillBytes: Option[Array[Byte]] = None
    var group: Option[(Long, Long)] = None
    var contiguousAddr: Option[Long] = None

    // messages start after prefix(12) + alignment padding(4); a
    // continuation message (0x0010) moves the cursor elsewhere
    var p = a + 16
    var remaining = nMsgs
    while (remaining > 0) {
      val typ = buf.getShort(p) & 0xFFFF
      val size = buf.getShort(p + 2) & 0xFFFF
      val body = p + 8
      typ match {
        case 0x0001 => // dataspace
          val ver = bytes(body) & 0xFF
          val rank = bytes(body + 1) & 0xFF
          val dimsStart = if (ver == 1) body + 8 else body + 4
          shape = Some((0 until rank).map(i =>
            buf.getLong(dimsStart + i * 8)))
        case 0x0003 => // datatype
          typeClass = bytes(body) & 0x0F
          // class bit field byte 0, bit 0: data byte order (0 = LE)
          typeLittleEndian = (bytes(body + 1) & 0x01) == 0
          typeSize = buf.getInt(body + 4)
        case 0x0004 => // fill value (old): just size(4) + data, no
          // version/flags — only used when the new message is absent
          val sz = buf.getInt(body)
          if (sz > 0 && fillBytes.isEmpty)
            fillBytes = Some(bytes.slice(body + 4, body + 4 + sz))
        case 0x0005 => // fill value (new)
          val ver = bytes(body) & 0xFF
          if (ver <= 2) {
            val defined = bytes(body + 3) & 0xFF
            if (defined == 1) {
              val sz = buf.getInt(body + 4)
              if (sz > 0)
                fillBytes = Some(bytes.slice(body + 8, body + 8 + sz))
            }
          } else { // v3: flags bit 5 = fill value defined
            val flags = bytes(body + 1) & 0xFF
            if ((flags & 0x20) != 0) {
              val sz = buf.getInt(body + 2)
              if (sz > 0)
                fillBytes = Some(bytes.slice(body + 6, body + 6 + sz))
            }
          }
        case 0x0008 => // data layout: contiguous (v3 class 1) is
          // directly readable; chunked (class 2) is not decoded
          val ver = bytes(body) & 0xFF
          if (ver == 3 && (bytes(body + 1) & 0xFF) == 1) {
            val addr = buf.getLong(body + 2)
            if (addr != -1L) contiguousAddr = Some(addr)
          }
        case 0x0011 => // symbol table: this object is a group
          group = Some((buf.getLong(body), buf.getLong(body + 8)))
        case 0x0010 => // continuation: jump to the linked block
          p = buf.getLong(body).toInt - 8 // -8: loop advance below
        case _ => ()
      }
      if (typ != 0x0010) p += 8 + size else p += 8
      remaining -= 1
    }

    group match {
      case Some((bt, hp)) =>
        walkGroup(bytes, buf, bt, hp, path + "/", depth + 1, out)
      case None =>
        val typeName = (typeClass, typeSize) match {
          case (0, 1) => "byte"
          case (0, 2) => "short"
          case (0, 4) => "int"
          case (0, 8) => "long"
          case (1, 4) => "float"
          case (1, 8) => "double"
          case _ => s"class$typeClass/$typeSize"
        }
        val fill = fillBytes.map { fb =>
          val b = ByteBuffer.wrap(fb).order(ByteOrder.LITTLE_ENDIAN)
          (typeClass, fb.length) match {
            case (1, 4) => b.getFloat.toDouble
            case (1, 8) => b.getDouble
            case (0, 1) => fb(0).toDouble
            case (0, 2) => b.getShort.toDouble
            case (0, 4) => b.getInt.toDouble
            case (0, 8) => b.getLong.toDouble
            case _ => Double.NaN
          }
        }
        out += VarMeta(path, shape.getOrElse(Nil), typeName, fill, Nil,
          begin = contiguousAddr, littleEndian = typeLittleEndian)
    }
  }

  // ---------------------------------------------------------------
  // The S6 contract: what the cogify stage needs per file
  // ---------------------------------------------------------------

  /** Grid envelope for a configured variable — the exact inputs
    * `hdf5_to_cog` derives before reprojection (`handler.py:96-120`):
    * shape[0]/shape[1] as height/width, `_FillValue`, and x/y extents
    * (read from classic coordinate data; the reference's global
    * default `[-180, -90, 180, 90]` otherwise). */
  case class GridInfo(height: Long, width: Long, fillValue: Option[Double],
                      xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  def gridInfo(bytes: Array[Byte], variableName: String,
               group: Option[String] = None,
               xVariable: Option[String] = None,
               yVariable: Option[String] = None,
               shapeOp: Seq[Long] => Seq[Long] = identity)
  : Either[String, GridInfo] =
    parse(bytes).flatMap { meta =>
      val path = group.map(g => s"$g/$variableName").getOrElse(variableName)
      meta.vars.find(_.path == path).toRight(s"no variable $path").flatMap { v =>
        // dims come from the shape AFTER the configured grid ops, like
        // the reference reading variable.shape after its transpose/
        // flipud branches (handler.py:106-112)
        scala.util.Try(shapeOp(v.shape)).toEither
          .left.map(e => s"grid ops reject $path: ${e.getMessage}")
          .flatMap { shape =>
            if (shape.size < 2)
              Left(s"variable $path is not 2-D " +
                s"(shape ${shape.mkString("x")})")
            else {
              val xe = xVariable.flatMap(x => coordExtent(bytes, meta, x))
              val ye = yVariable.flatMap(y => coordExtent(bytes, meta, y))
              val (xmin, xmax) = xe.getOrElse((-180.0, 180.0))
              val (ymin, ymax) = ye.getOrElse((-90.0, 90.0))
              Right(GridInfo(shape(0), shape(1), v.fillValue,
                xmin, ymin, xmax, ymax))
            }
          }
      }
    }

  /** One scanned row (the [[GeoTiff.scanMetadata]] shape): path +
    * either per-variable metadata or the fallback reason. */
  case class ScanResult(path: String, ok: Boolean, error: String,
                        format: String, varPath: String, shape: Seq[Long],
                        typeName: String, fillValue: Option[Double])

  /** Scan a `binaryFile` DataFrame (path, content) partition-parallel;
    * one output row per variable, or one error row per unparseable
    * file (the reference's quarantine path). */
  def scanMetadata(media: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.Dataset[ScanResult] = {
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        parse(bytes) match {
          case Right(m) if m.vars.nonEmpty => m.vars.map(v =>
            ScanResult(path, ok = true, null, m.format, v.path, v.shape,
              v.typeName, v.fillValue))
          case Right(m) => Seq(ScanResult(path, ok = true, null, m.format,
            null, Nil, null, None))
          case Left(err) => Seq(ScanResult(path, ok = false, err, null,
            null, Nil, null, None))
        }
      })
  }
}
