package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic in-memory NetCDF/HDF5 file builders.
  *
  * [[classic]] is a real (minimal) CDF-1 writer — the inverse of
  * [[NetCdf.parseClassic]] — used both as test fixture source and as
  * the byte-level oracle for the S6 scan queries: no native NetCDF
  * library exists in this environment, so the fixtures are built from
  * the published on-disk spec and parsed back.
  *
  * [[hdf5]] hand-assembles a fixed superblock-v0 HDF5 file (heap,
  * B-tree, SNOD, object headers) with a root dataset, a subgroup and
  * a grouped dataset — the symbol-table layout the HDF5 1.8/netCDF-4
  * line writes.
  */
object NetCdfFixtures {

  // ---------------- NetCDF classic (CDF-1) writer ----------------

  /** Variable spec: `typ` is the NC type id (3 short, 4 int, 5 float,
    * 6 double), `values` row-major. */
  case class CVar(name: String, dims: Seq[String], typ: Int,
                  values: Seq[Double],
                  attrs: Seq[(String, Either[String, Seq[Double]])] = Nil)

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 => 1; case 3 => 2; case 4 | 5 => 4; case 6 => 8
  }

  def classic(dims: Seq[(String, Int)], vars: Seq[CVar]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bo.write(((v >> 24) & 0xFF).toInt); bo.write(((v >> 16) & 0xFF).toInt)
      bo.write(((v >> 8) & 0xFF).toInt); bo.write((v & 0xFF).toInt)
    }
    def name(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u32(b.length); bo.write(b)
      (0 until ((4 - b.length % 4) % 4)).foreach(_ => bo.write(0))
    }
    def attrs(as: Seq[(String, Either[String, Seq[Double]])]): Unit =
      if (as.isEmpty) { u32(0); u32(0) }
      else {
        u32(0x0C); u32(as.size)
        as.foreach { case (n, v) =>
          name(n)
          v match {
            case Left(s) =>
              val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              u32(2); u32(b.length); bo.write(b)
              (0 until ((4 - b.length % 4) % 4)).foreach(_ => bo.write(0))
            case Right(ds) =>
              u32(6); u32(ds.size)
              val bb = ByteBuffer.allocate(ds.size * 8)
                .order(ByteOrder.BIG_ENDIAN)
              ds.foreach(bb.putDouble)
              bo.write(bb.array())
          }
        }
      }

    val dimIdx = dims.map(_._1).zipWithIndex.toMap
    // pass 1: header with placeholder begins; remember patch offsets
    bo.write('C'); bo.write('D'); bo.write('F'); bo.write(1)
    u32(0) // numrecs
    if (dims.isEmpty) { u32(0); u32(0) }
    else { u32(0x0A); u32(dims.size); dims.foreach { case (n, l) => name(n); u32(l) } }
    attrs(Nil) // no global attributes in fixtures
    val beginPatches = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (vars.isEmpty) { u32(0); u32(0) }
    else {
      u32(0x0B); u32(vars.size)
      vars.foreach { v =>
        name(v.name)
        u32(v.dims.size)
        v.dims.foreach(d => u32(dimIdx(d)))
        attrs(v.attrs)
        u32(v.typ)
        val n = v.dims.map(d => dims(dimIdx(d))._2).product
        u32((n * typeSize(v.typ) + 3) / 4 * 4) // vsize
        beginPatches += bo.size()
        u32(0) // begin placeholder
      }
    }
    val header = bo.toByteArray
    // pass 2: assign data offsets and write values
    val data = new ByteArrayOutputStream()
    val begins = vars.map { v =>
      val begin = header.length + data.size()
      val n = v.dims.map(d => dims(dimIdx(d))._2).product
      require(v.values.size == n,
        s"${v.name}: ${v.values.size} values for $n cells")
      val bb = ByteBuffer.allocate((n * typeSize(v.typ) + 3) / 4 * 4)
        .order(ByteOrder.BIG_ENDIAN)
      v.values.foreach { d =>
        v.typ match {
          case 3 => bb.putShort(d.toShort)
          case 4 => bb.putInt(d.toInt)
          case 5 => bb.putFloat(d.toFloat)
          case 6 => bb.putDouble(d)
        }
      }
      data.write(bb.array())
      begin
    }
    val full = ByteBuffer.wrap(header ++ data.toByteArray)
      .order(ByteOrder.BIG_ENDIAN)
    beginPatches.zip(begins).foreach { case (at, b) => full.putInt(at, b) }
    full.array()
  }

  /** The standard S6 fixture: lat/lon coordinate vectors + a 2-D
    * `precip` grid with a `_FillValue`, exactly the shape
    * `hdf5_to_cog` reads (`cogify/handler.py:96-120`). */
  def classicGrid(): Array[Byte] = classic(
    dims = Seq("lat" -> 4, "lon" -> 6),
    vars = Seq(
      CVar("lat", Seq("lat"), 6, Seq(-30.0, -10.0, 10.0, 30.0)),
      CVar("lon", Seq("lon"), 6, Seq(-120.0, -72.0, -24.0, 24.0, 72.0, 120.0)),
      CVar("precip", Seq("lat", "lon"), 5,
        (1 to 24).map(_.toDouble * 0.5),
        attrs = Seq("_FillValue" -> Right(Seq(-9999.0)),
          "units" -> Left("mm/hr")))))

  // ---------------- HDF5 superblock-v0 fixture ----------------

  /** A fixed HDF5 file: root {lat: float64[3] contiguous data
    * (-10, 0, 10), precip: float32[10][20] fill=-9999,
    * science/ {temp: float64[5][7]}}. Every address below is chosen by
    * this builder; the parser must navigate them via the superblock,
    * heap, B-tree and SNOD structures only. */
  def hdf5(): Array[Byte] = {
    val buf = ByteBuffer.allocate(2048).order(ByteOrder.LITTLE_ENDIAN)

    // layout
    val heapAddr = 96L; val heapData = 128L
    val btreeAddr = 256L; val snodAddr = 320L
    val precipHdr = 512L; val scienceHdr = 640L
    val subHeap = 704L; val subHeapData = 736L
    val subBtree = 832L; val subSnod = 896L
    val tempHdr = 1024L // carries attribute messages: needs ~170 bytes
    val latHdr = 1280L; val latData = 1440L

    def putMagic(at: Int): Unit = {
      buf.position(at)
      buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    }
    // superblock v0
    putMagic(0)
    buf.put(8, 0.toByte) // superblock version
    buf.put(13, 8.toByte); buf.put(14, 8.toByte) // offset/length sizes
    buf.putShort(16, 4); buf.putShort(18, 16) // leaf/internal K
    buf.putLong(24, 0L) // base address
    buf.putLong(40, 2048L) // EOF
    // root symbol table entry @56: nameOff, objHdr, cacheType=1, scratch
    buf.putLong(56, 0L); buf.putLong(64, 0L); buf.putInt(72, 1)
    buf.putLong(80, btreeAddr); buf.putLong(88, heapAddr)

    def localHeap(at: Long, dataAt: Long, names: Seq[(Long, String)]): Unit = {
      buf.position(at.toInt)
      buf.put('H'.toByte); buf.put('E'.toByte); buf.put('A'.toByte)
      buf.put('P'.toByte)
      buf.putLong(at.toInt + 8, 96L) // data segment size
      buf.putLong(at.toInt + 16, 0L) // free list
      buf.putLong(at.toInt + 24, dataAt) // data segment address
      names.foreach { case (off, s) =>
        buf.position((dataAt + off).toInt)
        buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        buf.put(0.toByte)
      }
    }
    def btree(at: Long, snod: Long): Unit = {
      buf.position(at.toInt)
      buf.put("TREE".getBytes); buf.put(0.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 6, 1) // one entry
      buf.putLong(at.toInt + 8, -1L); buf.putLong(at.toInt + 16, -1L)
      buf.putLong(at.toInt + 24, 0L) // key 0
      buf.putLong(at.toInt + 32, snod) // child 0
      buf.putLong(at.toInt + 40, 8L) // key 1
    }
    def snod(at: Long, entries: Seq[(Long, Long)]): Unit = {
      buf.position(at.toInt)
      buf.put("SNOD".getBytes); buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 6, entries.size.toShort)
      entries.zipWithIndex.foreach { case ((nameOff, hdr), i) =>
        val e = at.toInt + 8 + i * 40
        buf.putLong(e, nameOff); buf.putLong(e + 8, hdr)
        buf.putInt(e + 16, 0)
      }
    }
    /** v1 object header with pre-padded (8-multiple) message bodies. */
    def objHeader(at: Long, msgs: Seq[(Int, Array[Byte])]): Unit = {
      buf.position(at.toInt)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 2, msgs.size.toShort)
      buf.putInt(at.toInt + 4, 1) // refcount
      buf.putInt(at.toInt + 8, msgs.map(_._2.length + 8).sum)
      var p = at.toInt + 16
      msgs.foreach { case (typ, body) =>
        require(body.length % 8 == 0, "message body must be 8-aligned")
        buf.putShort(p, typ.toShort)
        buf.putShort(p + 2, body.length.toShort)
        buf.put(p + 4, 0.toByte)
        buf.position(p + 8); buf.put(body)
        p += 8 + body.length
      }
    }
    def dataspace(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + dims.size * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(dims.size.toByte); b.put(0.toByte)
      b.position(8); dims.foreach(b.putLong)
      b.array()
    }
    def datatype(clazz: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | clazz).toByte)
      b.position(4); b.putInt(size)
      b.array()
    }
    def fillValue(f: Float): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(1.toByte); b.put(2.toByte); b.put(1.toByte)
      b.putInt(4, 4); b.putFloat(8, f)
      b.array()
    }
    def symtab(bt: Long, hp: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(bt); b.putLong(hp)
      b.array()
    }
    /** v3 contiguous data layout message (addr + size). */
    def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(1.toByte)
      b.putLong(2, addr); b.putLong(10, size)
      b.array()
    }
    /** v1 attribute message (name/datatype/dataspace/value, each part
      * padded to 8): scalar double or string. */
    def attrV1(name: String, value: Either[String, Double]): Array[Byte] = {
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
        Array[Byte](0)
      val namePad = (nb.length + 7) / 8 * 8
      val (dtClass, vb) = value match {
        case Left(s) =>
          val sb = s.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
            Array[Byte](0)
          (3, sb)
        case Right(d) =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          b.putDouble(d); (1, b.array())
      }
      val valuePad = (vb.length + 7) / 8 * 8
      val dsSize = 8 // v1 scalar dataspace: rank 0, no dims
      val b = ByteBuffer.allocate(8 + namePad + 8 + dsSize + valuePad)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(0.toByte)
      b.putShort(nb.length.toShort)        // name size incl null
      b.putShort(8)                        // datatype size
      b.putShort(dsSize.toShort)           // dataspace size
      b.position(8); b.put(nb)
      b.position(8 + namePad)
      b.put(((1 << 4) | dtClass).toByte)   // datatype: ver 1 + class
      b.position(8 + namePad + 4); b.putInt(vb.length)
      b.position(8 + namePad + 8)
      b.put(1.toByte); b.put(0.toByte)     // dataspace v1, rank 0
      b.position(8 + namePad + 8 + dsSize); b.put(vb)
      b.array()
    }

    // root group: heap names, btree -> snod -> {lat, precip, science}
    localHeap(heapAddr, heapData,
      Seq(8L -> "lat", 16L -> "precip", 24L -> "science"))
    btree(btreeAddr, snodAddr)
    snod(snodAddr, Seq(8L -> latHdr, 16L -> precipHdr, 24L -> scienceHdr))
    objHeader(latHdr, Seq(
      0x0001 -> dataspace(Seq(3L)),
      0x0003 -> datatype(clazz = 1, size = 8),
      0x0008 -> layoutContiguous(latData, 24)))
    buf.putDouble(latData.toInt, -10.0)
    buf.putDouble(latData.toInt + 8, 0.0)
    buf.putDouble(latData.toInt + 16, 10.0)
    objHeader(precipHdr, Seq(
      0x0001 -> dataspace(Seq(10L, 20L)),
      0x0003 -> datatype(clazz = 1, size = 4),
      0x0005 -> fillValue(-9999f)))
    objHeader(scienceHdr, Seq(0x0011 -> symtab(subBtree, subHeap)))
    // science subgroup
    localHeap(subHeap, subHeapData, Seq(8L -> "temp"))
    btree(subBtree, subSnod)
    snod(subSnod, Seq(8L -> tempHdr))
    objHeader(tempHdr, Seq(
      0x0001 -> dataspace(Seq(5L, 7L)),
      0x0003 -> datatype(clazz = 1, size = 8),
      // attributes, not a fill-value message: the `variable._FillValue`
      // shape the reference reads (`cogify/handler.py:105`)
      0x000C -> attrV1("_FillValue", Right(-7777.0)),
      0x000C -> attrV1("units", Left("K"))))

    buf.array()
  }

  /** HDF5 with CHUNKED datasets — the layout netCDF-4/HDF-EOS writers
    * actually emit (`nc.createVariable(..., zlib=True, shuffle=True)`
    * defaults): `precip` float32[5][7] chunked 3x4 behind a
    * shuffle+deflate pipeline, `precip_contig` the SAME grid stored
    * contiguous (the two reads must agree bit-for-bit), `lon`
    * float64[7] chunked 4 deflate-only, `lat` float64[3] chunked 2
    * behind deflate+fletcher32. Every chunk is stored PADDED to the
    * full chunk shape, as the HDF5 library does for edge chunks. */
  def hdf5Chunked(): Array[Byte] = {
    val fill = -9999f
    def precipAt(i: Int, j: Int): Float = (i * 10 + j).toFloat
    val lonVals = Array(-150.0, -100.0, -50.0, 0.0, 50.0, 100.0, 150.0)
    val latVals = Array(-10.0, 0.0, 10.0)

    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(out); d.end()
      out.take(n)
    }
    def shuffle(in: Array[Byte], es: Int): Array[Byte] = {
      val count = in.length / es
      val out = new Array[Byte](in.length)
      for (i <- 0 until count; j <- 0 until es)
        out(j * count + i) = in(i * es + j)
      out
    }
    // precip chunks (3x4 grid cells, row-major, padded with fill)
    def precipChunk(oy: Int, ox: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(3 * 4 * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (cy <- 0 until 3; cx <- 0 until 4) {
        val y = oy + cy; val x = ox + cx
        b.putFloat(if (y < 5 && x < 7) precipAt(y, x) else fill)
      }
      deflate(shuffle(b.array(), 4))
    }
    def lonChunk(o: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (c <- 0 until 4)
        b.putDouble(if (o + c < 7) lonVals(o + c) else 0.0)
      deflate(b.array())
    }
    def latChunk(o: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(2 * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (c <- 0 until 2)
        b.putDouble(if (o + c < 3) latVals(o + c) else 0.0)
      // fletcher32 appends a 4-byte checksum AFTER deflate in this
      // pipeline ordering; the reader strips it unverified
      deflate(b.array()) ++ Array[Byte](0, 0, 0, 0)
    }
    val precipChunks = Seq((0, 0), (0, 4), (3, 0), (3, 4))
      .map { case (oy, ox) => (Seq(oy.toLong, ox.toLong), precipChunk(oy, ox)) }
    val lonChunks = Seq(0, 4).map(o => (Seq(o.toLong), lonChunk(o)))
    val latChunks = Seq(0, 2).map(o => (Seq(o.toLong), latChunk(o)))

    // ---- static layout ----
    val heapAddr = 96L; val heapData = 128L
    val btreeAddr = 256L; val snodAddr = 320L
    val lonHdr = 512L; val precipHdr = 768L
    val pcontigHdr = 1088L; val latHdr = 1280L
    val lonBt = 1536L; val precipBt = 1792L; val latBt = 2112L
    val pcontigData = 2304L // 5*7*4 = 140 bytes
    var dataOff = 2560L
    def alloc(n: Int): Long = { val o = dataOff; dataOff += n; o }
    val precipAddrs = precipChunks.map { case (_, p) => alloc(p.length) }
    val lonAddrs = lonChunks.map { case (_, p) => alloc(p.length) }
    val latAddrs = latChunks.map { case (_, p) => alloc(p.length) }

    val buf = ByteBuffer.allocate(dataOff.toInt + 64)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    buf.put(8, 0.toByte)
    buf.put(13, 8.toByte); buf.put(14, 8.toByte)
    buf.putShort(16, 4); buf.putShort(18, 16)
    buf.putLong(24, 0L)
    buf.putLong(40, dataOff + 64)
    buf.putLong(56, 0L); buf.putLong(64, 0L); buf.putInt(72, 1)
    buf.putLong(80, btreeAddr); buf.putLong(88, heapAddr)

    def localHeap(at: Long, dataAt: Long, names: Seq[(Long, String)]): Unit = {
      buf.position(at.toInt)
      buf.put("HEAP".getBytes)
      buf.putLong(at.toInt + 8, 96L)
      buf.putLong(at.toInt + 16, 0L)
      buf.putLong(at.toInt + 24, dataAt)
      names.foreach { case (off, s) =>
        buf.position((dataAt + off).toInt)
        buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        buf.put(0.toByte)
      }
    }
    def groupBtree(at: Long, snod: Long): Unit = {
      buf.position(at.toInt)
      buf.put("TREE".getBytes); buf.put(0.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 6, 1)
      buf.putLong(at.toInt + 8, -1L); buf.putLong(at.toInt + 16, -1L)
      buf.putLong(at.toInt + 24, 0L)
      buf.putLong(at.toInt + 32, snod)
      buf.putLong(at.toInt + 40, 8L)
    }
    def snod(at: Long, entries: Seq[(Long, Long)]): Unit = {
      buf.position(at.toInt)
      buf.put("SNOD".getBytes); buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 6, entries.size.toShort)
      entries.zipWithIndex.foreach { case ((nameOff, hdr), i) =>
        val e = at.toInt + 8 + i * 40
        buf.putLong(e, nameOff); buf.putLong(e + 8, hdr)
        buf.putInt(e + 16, 0)
      }
    }
    def objHeader(at: Long, msgs: Seq[(Int, Array[Byte])]): Unit = {
      buf.position(at.toInt)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 2, msgs.size.toShort)
      buf.putInt(at.toInt + 4, 1)
      buf.putInt(at.toInt + 8, msgs.map(_._2.length + 8).sum)
      var p = at.toInt + 16
      msgs.foreach { case (typ, body) =>
        require(body.length % 8 == 0, "message body must be 8-aligned")
        buf.putShort(p, typ.toShort)
        buf.putShort(p + 2, body.length.toShort)
        buf.put(p + 4, 0.toByte)
        buf.position(p + 8); buf.put(body)
        p += 8 + body.length
      }
    }
    def dataspace(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + dims.size * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(dims.size.toByte); b.put(0.toByte)
      b.position(8); dims.foreach(b.putLong)
      b.array()
    }
    def datatype(clazz: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | clazz).toByte)
      b.position(4); b.putInt(size)
      b.array()
    }
    def fillValueMsg(f: Float): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(1.toByte); b.put(2.toByte); b.put(1.toByte)
      b.putInt(4, 4); b.putFloat(8, f)
      b.array()
    }
    def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(1.toByte)
      b.putLong(2, addr); b.putLong(10, size)
      b.array()
    }
    /** v3 class-2 chunked layout: dimensionality counts the data dims
      * PLUS the trailing element-size dim. */
    def layoutChunked(bt: Long, cdims: Seq[Int], es: Int): Array[Byte] = {
      val nd = cdims.size + 1
      val len = 3 + 8 + nd * 4
      val b = ByteBuffer.allocate((len + 7) / 8 * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(2.toByte); b.put(nd.toByte)
      b.putLong(bt)
      cdims.foreach(b.putInt); b.putInt(es)
      b.array()
    }
    /** v1 filter pipeline; (filterId, clientData) in WRITE order. */
    def filterPipeline(fs: Seq[(Int, Seq[Int])]): Array[Byte] = {
      val bodies = fs.map { case (id, cd) =>
        val pad = if (cd.size % 2 == 1) 1 else 0
        val b = ByteBuffer.allocate(8 + (cd.size + pad) * 4)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(id.toShort); b.putShort(0.toShort)
        b.putShort(0.toShort); b.putShort(cd.size.toShort)
        cd.foreach(b.putInt)
        b.array()
      }
      val b = ByteBuffer.allocate(8 + bodies.map(_.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(fs.size.toByte)
      b.position(8); bodies.foreach(b.put)
      b.array()
    }
    /** Leaf v1 chunk B-tree (node type 1): keys = (nbytes, mask,
      * offsets ++ 0), children = chunk data addresses. */
    def chunkBtree(at: Long, rank: Int,
                   entries: Seq[(Seq[Long], Int, Long)]): Unit = {
      val nd = rank + 1
      buf.position(at.toInt)
      buf.put("TREE".getBytes); buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(at.toInt + 6, entries.size.toShort)
      buf.putLong(at.toInt + 8, -1L); buf.putLong(at.toInt + 16, -1L)
      val keySize = 8 + 8 * nd
      var p = at.toInt + 24
      entries.foreach { case (offs, size, addr) =>
        buf.putInt(p, size); buf.putInt(p + 4, 0)
        offs.zipWithIndex.foreach { case (o, j) =>
          buf.putLong(p + 8 + j * 8, o)
        }
        buf.putLong(p + 8 + rank * 8, 0L)
        buf.putLong(p + keySize, addr)
        p += keySize + 8
      }
    }

    localHeap(heapAddr, heapData,
      Seq(8L -> "lon", 16L -> "precip", 24L -> "precip_contig", 40L -> "lat"))
    groupBtree(btreeAddr, snodAddr)
    snod(snodAddr,
      Seq(8L -> lonHdr, 16L -> precipHdr, 24L -> pcontigHdr, 40L -> latHdr))

    objHeader(lonHdr, Seq(
      0x0001 -> dataspace(Seq(7L)),
      0x0003 -> datatype(clazz = 1, size = 8),
      0x000B -> filterPipeline(Seq(1 -> Seq(6))),
      0x0008 -> layoutChunked(lonBt, Seq(4), es = 8)))
    objHeader(precipHdr, Seq(
      0x0001 -> dataspace(Seq(5L, 7L)),
      0x0003 -> datatype(clazz = 1, size = 4),
      0x0005 -> fillValueMsg(fill),
      // netCDF4 default: shuffle runs BEFORE deflate on write
      0x000B -> filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> layoutChunked(precipBt, Seq(3, 4), es = 4)))
    objHeader(pcontigHdr, Seq(
      0x0001 -> dataspace(Seq(5L, 7L)),
      0x0003 -> datatype(clazz = 1, size = 4),
      0x0005 -> fillValueMsg(fill),
      0x0008 -> layoutContiguous(pcontigData, 5 * 7 * 4)))
    objHeader(latHdr, Seq(
      0x0001 -> dataspace(Seq(3L)),
      0x0003 -> datatype(clazz = 1, size = 8),
      0x000B -> filterPipeline(Seq(1 -> Seq(6), 3 -> Nil)),
      0x0008 -> layoutChunked(latBt, Seq(2), es = 8)))

    chunkBtree(precipBt, rank = 2,
      precipChunks.zip(precipAddrs).map { case ((offs, p), a) =>
        (offs, p.length, a)
      })
    chunkBtree(lonBt, rank = 1,
      lonChunks.zip(lonAddrs).map { case ((offs, p), a) =>
        (offs, p.length, a)
      })
    chunkBtree(latBt, rank = 1,
      latChunks.zip(latAddrs).map { case ((offs, p), a) =>
        (offs, p.length, a)
      })

    buf.position(pcontigData.toInt)
    for (i <- 0 until 5; j <- 0 until 7) buf.putFloat(precipAt(i, j))
    (precipChunks.map(_._2) ++ lonChunks.map(_._2) ++ latChunks.map(_._2))
      .zip(precipAddrs ++ lonAddrs ++ latAddrs)
      .foreach { case (p, a) =>
        buf.position(a.toInt); buf.put(p)
      }
    buf.array()
  }

  // ---------------- HDF5 superblock-v2 fixture ----------------

  /** Shared builders for the superblock-v2 fixture family: ONE
    * encoding of each v2 structure, so a format fix (like the FRHP
    * statistics-field offsets) lands once instead of drifting across
    * per-fixture copies. */
  private object V2 {
    /** 48-byte superblock v2: magic, version, sizes, base/extension/
      * EOF, root OBJECT HEADER address, checksum (unread). */
    def superblock(buf: ByteBuffer, rootHdr: Long, eof: Long): Unit = {
      buf.position(0)
      buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
        0x1A, '\n'))
      buf.put(8, 2.toByte)
      buf.put(9, 8.toByte); buf.put(10, 8.toByte)
      buf.put(11, 0.toByte)
      buf.putLong(12, 0L)
      buf.putLong(20, -1L)
      buf.putLong(28, eof)
      buf.putLong(36, rootHdr)
    }
    /** v2 object header: flags bit5 = timestamps, bit2 = 2-byte
      * creation order per message, bits0-1 = chunk-0 size width. */
    def ohdr2(buf: ByteBuffer, at: Long, flags: Int,
              msgs: Seq[(Int, Array[Byte])]): Unit = {
      var p = at.toInt
      buf.position(p); buf.put("OHDR".getBytes)
      buf.put(2.toByte); buf.put(flags.toByte)
      p += 6
      if ((flags & 0x20) != 0) { // 4 unread timestamps
        (0 until 4).foreach(i => buf.putInt(p + i * 4, 0)); p += 16
      }
      val hdrSz = if ((flags & 0x04) != 0) 6 else 4
      val chunk0 = msgs.map(_._2.length + hdrSz).sum
      (flags & 0x03) match {
        case 0 => buf.put(p, chunk0.toByte); p += 1
        case 1 => buf.putShort(p, chunk0.toShort); p += 2
        case _ => buf.putInt(p, chunk0); p += 4
      }
      msgs.zipWithIndex.foreach { case ((typ, body), i) =>
        buf.put(p, typ.toByte)
        buf.putShort(p + 1, body.length.toShort)
        buf.put(p + 3, 0.toByte) // message flags
        if (hdrSz == 6) buf.putShort(p + 4, i.toShort) // creation order
        buf.position(p + hdrSz); buf.put(body)
        p += hdrSz + body.length
      }
      buf.putInt(p, 0) // chunk checksum (parser does not verify)
    }
    /** Hard-link message; `full` adds the optional link-type and
      * charset fields real writers emit for UTF-8 names. */
    def link(name: String, hdr: Long, full: Boolean = false): Array[Byte] = {
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = ByteBuffer
        .allocate(2 + (if (full) 2 else 0) + 1 + nb.length + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte)                          // version
      b.put((if (full) 0x18 else 0x00).toByte) // flags: 1-byte name len
      if (full) { b.put(0.toByte); b.put(1.toByte) } // hard, UTF-8
      b.put(nb.length.toByte); b.put(nb)
      b.putLong(hdr)
      b.array()
    }
    /** Link-info message; heap = -1 means compact storage. The
      * name-index B-tree address matters only to the huge/tiny
      * heap-object walk. */
    def linkInfo(heap: Long = -1L, nameBtree: Long = -1L): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte); b.put(0.toByte)
      b.putLong(heap); b.putLong(nameBtree)
      b.array()
    }
    /** v2 dataspace: version, rank, flags, type, then dims. */
    def dataspace(dims: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + dims.size * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(dims.size.toByte)
      b.put(0.toByte); b.put(1.toByte) // simple dataspace
      dims.foreach(b.putLong)
      b.array()
    }
    def datatype(clazz: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(((1 << 4) | clazz).toByte)
      b.position(4); b.putInt(size)
      b.array()
    }
    def fillValueMsg(f: Float): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte); b.put(1.toByte); b.put(2.toByte); b.put(1.toByte)
      b.putInt(4, 4); b.putFloat(8, f)
      b.array()
    }
    /** Layout v4 contiguous (field-compatible with v3; written as v4
      * to pin the parser's (ver 3 || 4) acceptance). */
    def layoutContiguousV4(addr: Long, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(4.toByte); b.put(1.toByte)
      b.putLong(2, addr); b.putLong(10, size)
      b.array()
    }
    /** Layout v4 class-2 chunked: u32-encoded chunk dims (ELEMENT
      * units, no element-size dim) + the index-specific creation
      * params — single (1, + size/mask when filtered), implicit (2),
      * fixed array (3, page bits), extensible array (4, five cparam
      * bytes), v2 B-tree (5, node size + split/merge %). */
    def layoutChunkedV4(cdims: Seq[Int], idxType: Int, addr: Long,
                        flags: Int = 0,
                        singleSize: Option[Long] = None,
                        faPageBits: Int = 10,
                        eaParams: Seq[Int] = Seq(8, 2, 2, 2, 10),
                        bt2NodeSize: Int = 128): Array[Byte] = {
      val extra = idxType match {
        case 1 => if ((flags & 0x02) != 0) 12 else 0
        case 3 => 1
        case 4 => 5
        case 5 => 6
        case _ => 0
      }
      val b = ByteBuffer.allocate(5 + cdims.size * 4 + 1 + extra + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(4.toByte); b.put(2.toByte); b.put(flags.toByte)
      b.put(cdims.size.toByte); b.put(4.toByte) // u32 dim encoding
      cdims.foreach(b.putInt)
      b.put(idxType.toByte)
      idxType match {
        case 1 if (flags & 0x02) != 0 =>
          b.putLong(singleSize.get); b.putInt(0) // size + filter mask
        case 3 => b.put(faPageBits.toByte)
        case 4 => // max bits, index elmts, min ptrs, min elmts, page bits
          eaParams.foreach(v => b.put(v.toByte))
        case 5 =>
          b.putInt(bt2NodeSize); b.put(100.toByte); b.put(40.toByte)
        case _ => ()
      }
      b.putLong(addr)
      b.array()
    }
    /** v1 filter-pipeline message (valid in v2 headers too). */
    def filterPipeline(ids: Seq[(Int, Seq[Int])]): Array[Byte] = {
      val entries = ids.map { case (id, cvs) =>
        val pad = if (cvs.size % 2 == 1) 1 else 0
        val b = ByteBuffer.allocate(8 + (cvs.size + pad) * 4)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(id.toShort); b.putShort(0); b.putShort(1)
        b.putShort(cvs.size.toShort)
        cvs.foreach(b.putInt)
        b.array()
      }
      val total = 8 + entries.map(_.length).sum
      val pad8 = (8 - total % 8) % 8
      val b = ByteBuffer.allocate(total + pad8)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(ids.size.toByte)
      b.position(8); entries.foreach(b.put)
      b.array()
    }
  }

  /** The [[hdf5]] file re-written in the HDF5 >= 1.10 / netCDF-4
    * "latest format" layout: superblock v2 (root object header
    * address, no symbol-table entry), version-2 object headers
    * ("OHDR" chunks + "OCHK" continuation), and compact link-message
    * groups. Same logical content as [[hdf5]] — {lat: float64[3]
    * contiguous (-10, 0, 10), precip: float32[10][20] fill=-9999,
    * science/ {temp: float64[5][7]}} — so the two parses must agree
    * on everything but the format string. Deliberate coverage
    * variations: the root header stores timestamps + per-message
    * creation order and pushes its last link through an OCHK
    * continuation; one link message carries explicit link-type and
    * charset fields; one header uses a 2-byte chunk-0 size field. */
  def hdf5V2(): Array[Byte] = {
    val buf = ByteBuffer.allocate(2048).order(ByteOrder.LITTLE_ENDIAN)

    val rootHdr = 64L
    val ochkAddr = 256L
    val latHdr = 320L; val precipHdr = 448L
    val scienceHdr = 576L; val tempHdr = 704L // + attrs: ~130 bytes
    val latData = 896L

    V2.superblock(buf, rootHdr, eof = 2048L)

    def continuation(off: Long, len: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(off); b.putLong(len)
      b.array()
    }
    /** v3 attribute message (unpadded parts + encoding byte): scalar
      * double or string — the layout v2 object headers carry. */
    def attrV3(name: String, value: Either[String, Double]): Array[Byte] = {
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
        Array[Byte](0)
      val (dtClass, vb) = value match {
        case Left(s) =>
          val sb = s.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
            Array[Byte](0)
          (3, sb)
        case Right(d) =>
          val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          b.putDouble(d); (1, b.array())
      }
      val ds = Array[Byte](2, 0, 0, 0) // v2 dataspace: scalar (rank 0)
      val b = ByteBuffer.allocate(9 + nb.length + 8 + ds.length + vb.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(0.toByte)
      b.putShort(nb.length.toShort)
      b.putShort(8); b.putShort(ds.length.toShort)
      b.put(0.toByte) // name character-set encoding (ASCII)
      b.put(nb)
      val dtAt = 9 + nb.length
      b.put(dtAt, ((1 << 4) | dtClass).toByte)
      b.putInt(dtAt + 4, vb.length)
      b.position(dtAt + 8); b.put(ds); b.put(vb)
      b.array()
    }

    // OCHK continuation block carrying root's third link ("science"):
    // signature + messages (root's hdrSz = 6: creation order) + cksum
    val sciLink = V2.link("science", scienceHdr)
    val ochkLen = 4 + (6 + sciLink.length) + 4
    buf.position(ochkAddr.toInt); buf.put("OCHK".getBytes)
    buf.put(ochkAddr.toInt + 4, 0x06.toByte)
    buf.putShort(ochkAddr.toInt + 5, sciLink.length.toShort)
    buf.put(ochkAddr.toInt + 7, 0.toByte)
    buf.putShort(ochkAddr.toInt + 8, 2) // creation order
    buf.position(ochkAddr.toInt + 10); buf.put(sciLink)
    buf.putInt(ochkAddr.toInt + 10 + sciLink.length, 0) // checksum

    // root: timestamps + creation order (0x24), links to lat/precip
    // in chunk 0, science via the continuation
    V2.ohdr2(buf, rootHdr, flags = 0x24, Seq(
      0x0002 -> V2.linkInfo(),
      0x0006 -> V2.link("lat", latHdr),
      0x0006 -> V2.link("precip", precipHdr, full = true),
      0x0010 -> continuation(ochkAddr, ochkLen)))
    V2.ohdr2(buf, latHdr, flags = 0x00, Seq(
      0x0001 -> V2.dataspace(Seq(3L)),
      0x0003 -> V2.datatype(clazz = 1, size = 8),
      0x0008 -> V2.layoutContiguousV4(latData, 24)))
    // 2-byte chunk-0 size field variant
    V2.ohdr2(buf, precipHdr, flags = 0x01, Seq(
      0x0001 -> V2.dataspace(Seq(10L, 20L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(-9999f)))
    V2.ohdr2(buf, scienceHdr, flags = 0x00, Seq(
      0x0002 -> V2.linkInfo(),
      0x0006 -> V2.link("temp", tempHdr)))
    V2.ohdr2(buf, tempHdr, flags = 0x00, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 8),
      // v3 attribute twins of the v0 file's v1 attributes
      0x000C -> attrV3("_FillValue", Right(-7777.0)),
      0x000C -> attrV3("units", Left("K"))))

    buf.putDouble(latData.toInt, -10.0)
    buf.putDouble(latData.toInt + 8, 0.0)
    buf.putDouble(latData.toInt + 16, 10.0)
    buf.array()
  }

  /** Superblock-v2 file whose root group uses DENSE link storage —
    * the layout HDF5 writes once a group grows past the compact limit
    * (default 8 links): a fractal heap ("FRHP") holding the link
    * messages, scanned sequentially by the parser. Ten float64[3]
    * contiguous datasets `v00`..`v09` with values (i, i+0.5, i+1).
    * `indirect = true` roots the heap in a one-level "FHIB" indirect
    * block spreading the links over two 512-byte direct blocks (with
    * two undefined slots) — the other parsed heap shape.
    * `filtered = true` gives the heap a deflate I/O pipeline: each
    * ENTIRE direct block is compressed (header included), the stored
    * size living in the heap header (filtered root) or in the
    * widened 8-byte-size + 4-byte-mask indirect-block entries. */
  def hdf5V2Dense(indirect: Boolean = false,
                  filtered: Boolean = false): Array[Byte] = {
    val buf = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val frhp = 160L  // header is 146 bytes (incl. the 4 stats fields)
    val fhib = 320L
    val block0 = 512L; val block1 = 1024L
    val dsBase = 1536L; val dsStride = 96
    val dataBase = 2560L

    V2.superblock(buf, rootHdr, eof = 4096L)
    // link info pointing at the fractal heap (dense storage)
    V2.ohdr2(buf, rootHdr, flags = 0,
      Seq(0x0002 -> V2.linkInfo(heap = frhp)))

    // ten datasets
    val names = (0 until 10).map(i => f"v$i%02d")
    names.zipWithIndex.foreach { case (_, i) =>
      val ds = dsBase + i * dsStride
      val data = dataBase + i * 24
      V2.ohdr2(buf, ds, flags = 0, Seq(
        0x0001 -> V2.dataspace(Seq(3L)),
        0x0003 -> V2.datatype(clazz = 1, size = 8),
        0x0008 -> V2.layoutContiguousV4(data, 24)))
      buf.putDouble(data.toInt, i.toDouble)
      buf.putDouble(data.toInt + 8, i + 0.5)
      buf.putDouble(data.toInt + 16, i + 1.0)
    }

    // deflate filter-pipeline body (v2, one filter, id 1, one client
    // value = compression level) — the heap header embeds this when
    // the heap is filtered
    val filterInfo: Array[Byte] = if (filtered) {
      val fi = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      fi.put(2.toByte); fi.put(1.toByte)
      fi.putShort(1.toShort)  // deflate
      fi.putShort(0.toShort)  // flags
      fi.putShort(1.toShort)  // # client values
      fi.putInt(6)            // level
      fi.array()
    } else Array.emptyByteArray
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new Array[Byte](raw.length + 64)
      val n = d.deflate(out); d.end()
      out.take(n)
    }

    // fractal heap header: 32-bit heap offsets (offSz 4),
    // no block checksums (flags 0)
    buf.position(frhp.toInt); buf.put("FRHP".getBytes)
    buf.put(0.toByte)                     // version
    buf.putShort(frhp.toInt + 5, 7)       // heap id length
    buf.putShort(frhp.toInt + 7, filterInfo.length.toShort)
    buf.put(frhp.toInt + 9, 0.toByte)     // flags
    buf.putInt(frhp.toInt + 10, 4096)     // max managed object size
    buf.putLong(frhp.toInt + 14, 0L)      // next huge id (none)
    buf.putLong(frhp.toInt + 22, -1L)     // huge-object B-tree
    buf.putLong(frhp.toInt + 30, 0L)      // free space
    buf.putLong(frhp.toInt + 38, -1L)     // free-space manager
    buf.putLong(frhp.toInt + 46, 512L)    // managed space
    buf.putLong(frhp.toInt + 54, 512L)    // allocated space
    buf.putLong(frhp.toInt + 62, 0L)      // iterator offset
    buf.putLong(frhp.toInt + 70, names.size.toLong) // managed objects
    buf.putLong(frhp.toInt + 78, 0L)      // size of huge objects
    buf.putLong(frhp.toInt + 86, 0L)      // number of huge objects
    buf.putLong(frhp.toInt + 94, 0L)      // size of tiny objects
    buf.putLong(frhp.toInt + 102, 0L)     // number of tiny objects
    buf.putShort(frhp.toInt + 110, 4)     // table width
    buf.putLong(frhp.toInt + 112, 512L)   // starting block size
    buf.putLong(frhp.toInt + 120, 4096L)  // max direct block size
    buf.putShort(frhp.toInt + 128, 32)    // max heap size (bits)
    buf.putShort(frhp.toInt + 130, 1)     // starting # rows
    buf.putLong(frhp.toInt + 132, if (indirect) fhib else block0)
    buf.putShort(frhp.toInt + 140, if (indirect) 1 else 0) // curr rows
    // filtered + root-direct-block tail fields land below once the
    // block's stored size is known; the filter info itself follows
    if (filtered)
      (0 until filterInfo.length).foreach { i =>
        buf.put(frhp.toInt + 142 + (if (indirect) 0 else 12) + i,
          filterInfo(i))
      }
    // (checksum after the tail stays 0 either way)

    // builds the 512-byte LOGICAL block, then stores it as-is or
    // deflated whole; returns the stored (on-disk) size
    def directBlock(at: Long, offset: Int,
                    links: Seq[Array[Byte]]): Int = {
      val lb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      lb.put("FHDB".getBytes)
      lb.put(0.toByte); lb.putLong(frhp)
      lb.putInt(13, offset) // 4-byte heap block offset
      lb.position(17)
      links.foreach(lb.put)
      val stored = if (filtered) deflate(lb.array()) else lb.array()
      buf.position(at.toInt); buf.put(stored)
      stored.length
    }
    val linkBodies = names.zipWithIndex.map { case (nm, i) =>
      V2.link(nm, dsBase + i * dsStride)
    }
    if (indirect) {
      // one-level indirect root: row 0 of 4 children, two defined;
      // filtered heaps widen each entry to addr + size(8) + mask(4)
      val s0 = directBlock(block0, 0, linkBodies.take(6))
      val s1 = directBlock(block1, 512, linkBodies.drop(6))
      buf.position(fhib.toInt); buf.put("FHIB".getBytes)
      buf.put(0.toByte); buf.putLong(frhp)
      buf.putInt(fhib.toInt + 13, 0) // heap offset of the block
      var e = fhib.toInt + 17
      def entry(addr: Long, size: Int): Unit = {
        buf.putLong(e, addr); e += 8
        if (filtered) {
          buf.putLong(e, size.toLong); e += 8
          buf.putInt(e, 0); e += 4 // per-block filter mask
        }
      }
      entry(block0, s0); entry(block1, s1)
      entry(-1L, 0); entry(-1L, 0)
      buf.putInt(e, 0) // checksum
    } else {
      val s0 = directBlock(block0, 0, linkBodies)
      if (filtered) {
        buf.putLong(frhp.toInt + 142, s0.toLong) // stored root size
        buf.putInt(frhp.toInt + 150, 0)          // root filter mask
      }
    }
    buf.array()
  }

  /** Superblock-v2 dense-links file whose fractal heap carries HUGE
    * and TINY objects alongside its managed direct block: ten managed
    * links `v00`..`v09`, one HUGE link (64-char name `w`·64, stored
    * raw outside any heap block — past the heap's max managed object
    * size) and, in the direct variant, one TINY link (`t`, the whole
    * 12-byte link message inlined in its heap ID). Heap IDs live in
    * the name-index v2 B-tree (BTHD type 5, depth 0) — the structures
    * a sequential block scan cannot see.
    *
    * `indirectHuge = false`: heap ID length 18 → the huge ID carries
    * address+length directly, huge B-tree undefined.
    * `indirectHuge = true`: heap ID length 8 → the huge ID holds a
    * 7-byte object id resolved through the huge-object v2 B-tree
    * (BTHD type 1, depth 0); no tiny link (a 12-byte message cannot
    * inline in an 8-byte ID).
    *
    * `deepNameIndex = true` (direct-huge mode only): the name index
    * becomes a DEPTH-1 v2 B-tree — node size 120 gives leaf capacity
    * 5 and internal capacity 3 (child-pointer width 8 + 1), so the 12
    * records split into three leaves (4/4/2) under a root BTIN whose
    * own two records are the HUGE and TINY heap IDs: a walk that only
    * reads leaves loses exactly the links the index exists to carry. */
  def hdf5V2DenseHugeTiny(indirectHuge: Boolean = false,
                          deepNameIndex: Boolean = false,
                          extendedTiny: Boolean = false,
                          hugeBtreeDirect: Boolean = false): Array[Byte] = {
    require(!(indirectHuge && deepNameIndex),
      "deepNameIndex fixture is direct-huge only")
    require(!(indirectHuge && (extendedTiny || hugeBtreeDirect)),
      "extendedTiny/hugeBtreeDirect are direct-huge variants")
    val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val frhp = 160L
    val block0 = 512L
    val nameBt = 1088L; val nameLeaf = 1152L
    val hugeBt = 1424L; val hugeLeaf = 1472L
    val hugeObj = 1520L
    val dsBase = 1792L; val dsStride = 96
    val dataBase = 3072L
    // extendedTiny: > 18 forces the 12-bit length form (msg at byte 2)
    val heapIdLen = if (indirectHuge) 8 else if (extendedTiny) 19 else 18
    val hasTiny = !indirectHuge
    // 6-char name -> 17-byte message -> length-1 = 16 = 0x10: the
    // extended ID's length needs BOTH nibble (byte 0) and byte 1
    val tinyName = if (extendedTiny) "tttttt" else "t"

    V2.superblock(buf, rootHdr, eof = 8192L)
    V2.ohdr2(buf, rootHdr, flags = 0,
      Seq(0x0002 -> V2.linkInfo(heap = frhp, nameBtree = nameBt)))

    // datasets: v00..v09 managed, #10 huge-linked, #11 tiny-linked
    val n = if (hasTiny) 12 else 11
    (0 until n).foreach { i =>
      val ds = dsBase + i * dsStride
      val data = dataBase + i * 24
      V2.ohdr2(buf, ds, flags = 0, Seq(
        0x0001 -> V2.dataspace(Seq(3L)),
        0x0003 -> V2.datatype(clazz = 1, size = 8),
        0x0008 -> V2.layoutContiguousV4(data, 24)))
      buf.putDouble(data.toInt, i.toDouble)
      buf.putDouble(data.toInt + 8, i + 0.5)
      buf.putDouble(data.toInt + 16, i + 1.0)
    }
    val hugeName = "w" * 64
    val hugeMsg = V2.link(hugeName, dsBase + 10 * dsStride)
    val tinyMsg = V2.link(tinyName, dsBase + 11 * dsStride) // 12/17 bytes

    // fractal heap header: like hdf5V2Dense but with nonzero huge/tiny
    // statistics and (indirect mode) a huge-object B-tree address
    buf.position(frhp.toInt); buf.put("FRHP".getBytes)
    buf.put(0.toByte)
    buf.putShort(frhp.toInt + 5, heapIdLen.toShort)
    buf.putShort(frhp.toInt + 7, 0) // unfiltered heap
    buf.put(frhp.toInt + 9, 0.toByte)
    buf.putInt(frhp.toInt + 10, 64) // max managed object size
    buf.putLong(frhp.toInt + 14, 2L) // next huge id
    // hugeBtreeDirect: the spec keeps a type-3 tracking B-tree even
    // when IDs are direct — its presence must NOT flip the walk to
    // indirect resolution
    buf.putLong(frhp.toInt + 22,
      if (indirectHuge || hugeBtreeDirect) hugeBt else -1L)
    buf.putLong(frhp.toInt + 30, 0L)
    buf.putLong(frhp.toInt + 38, -1L)
    buf.putLong(frhp.toInt + 46, 512L)
    buf.putLong(frhp.toInt + 54, 512L)
    buf.putLong(frhp.toInt + 62, 0L)
    buf.putLong(frhp.toInt + 70, 10L) // managed objects
    buf.putLong(frhp.toInt + 78, hugeMsg.length.toLong)
    buf.putLong(frhp.toInt + 86, 1L)  // number of huge objects
    buf.putLong(frhp.toInt + 94, if (hasTiny) tinyMsg.length.toLong else 0L)
    buf.putLong(frhp.toInt + 102, if (hasTiny) 1L else 0L)
    buf.putShort(frhp.toInt + 110, 4)
    buf.putLong(frhp.toInt + 112, 512L)
    buf.putLong(frhp.toInt + 120, 4096L)
    buf.putShort(frhp.toInt + 128, 32)
    buf.putShort(frhp.toInt + 130, 1)
    buf.putLong(frhp.toInt + 132, block0)
    buf.putShort(frhp.toInt + 140, 0) // root is a direct block

    // managed direct block: v00..v09
    buf.position(block0.toInt); buf.put("FHDB".getBytes)
    buf.put(0.toByte); buf.putLong(frhp)
    buf.putInt(block0.toInt + 13, 0)
    buf.position(block0.toInt + 17)
    (0 until 10).foreach(i =>
      buf.put(V2.link(f"v$i%02d", dsBase + i * dsStride)))

    // huge object bytes: the raw link message outside any heap block
    buf.position(hugeObj.toInt); buf.put(hugeMsg)

    // heap IDs (heapIdLen bytes): type in bits 4-5 of byte 0
    def managedId(): Array[Byte] = new Array[Byte](heapIdLen)
    def hugeId(): Array[Byte] = {
      val b = ByteBuffer.allocate(heapIdLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte)
      val oid = 1L
      if (indirectHuge) (0 until 7).foreach(i =>
        b.put(((oid >>> (8 * i)) & 0xFF).toByte)) // object id, LE
      else { b.putLong(hugeObj); b.putLong(hugeMsg.length.toLong) }
      b.array()
    }
    def tinyId(): Array[Byte] = {
      val b = ByteBuffer.allocate(heapIdLen)
      if (extendedTiny) { // 12-bit length-1 across bytes 0-1
        val lm1 = tinyMsg.length - 1
        b.put((0x20 | (lm1 & 0xF)).toByte)
        b.put(((lm1 >> 4) & 0xFF).toByte)
      } else b.put((0x20 | (tinyMsg.length - 1)).toByte)
      b.put(tinyMsg)
      b.array()
    }

    // name-index v2 B-tree (type 5): one record per link — 4-byte
    // name hash (unused by the walk) + heap ID
    val recSize = 4 + heapIdLen
    def bthd(at: Long, typ: Int, rs: Int, root: Long, nrec: Int,
             depth: Int = 0, nodeSize: Int = 512,
             total: Long = -1L): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("BTHD".getBytes)
      buf.put(0.toByte); buf.put(typ.toByte)
      buf.putInt(a + 6, nodeSize)
      buf.putShort(a + 10, rs.toShort)
      buf.putShort(a + 12, depth.toShort)
      buf.put(a + 14, 100.toByte); buf.put(a + 15, 40.toByte)
      buf.putLong(a + 16, root)
      buf.putShort(a + 24, nrec.toShort)
      buf.putLong(a + 26, if (total >= 0) total else nrec.toLong)
    }
    def btlf(at: Long, typ: Int, ids: Seq[Array[Byte]]): Unit = {
      buf.position(at.toInt); buf.put("BTLF".getBytes)
      buf.put(0.toByte); buf.put(typ.toByte)
      ids.foreach { idb =>
        buf.putInt(0) // name hash (unused by the full listing)
        buf.put(idb)
      }
    }
    if (deepNameIndex) {
      // 12 records, huge at index 4 and tiny at index 9 — both land
      // in the root BTIN as its two separator records
      val m = Seq.fill(10)(managedId())
      val ordered = m.slice(0, 4) ++ Seq(hugeId()) ++ m.slice(4, 8) ++
        Seq(tinyId()) ++ m.slice(8, 10)
      val nameInt = 1152L
      val leaves = Seq(1232L, 1328L, 1424L)
      val parts = Seq(ordered.slice(0, 4), ordered.slice(5, 9),
        ordered.slice(10, 12))
      bthd(nameBt, 5, recSize, nameInt, nrec = 2, depth = 1,
        nodeSize = 120, total = 12L)
      buf.position(nameInt.toInt); buf.put("BTIN".getBytes)
      buf.put(0.toByte); buf.put(5.toByte)
      Seq(ordered(4), ordered(9)).foreach { idb =>
        buf.putInt(0); buf.put(idb)
      }
      leaves.zip(parts).foreach { case (addr, ids) =>
        buf.putLong(addr); buf.put(ids.size.toByte) // ptr: addr + nrec
      }
      leaves.zip(parts).foreach { case (addr, ids) => btlf(addr, 5, ids) }
    } else {
      val nameIds = Seq.fill(10)(managedId()) ++ Seq(hugeId()) ++
        (if (hasTiny) Seq(tinyId()) else Nil)
      bthd(nameBt, 5, recSize, nameLeaf, nameIds.size)
      btlf(nameLeaf, 5, nameIds)
    }

    // huge-object v2 B-tree: type 1 (addr + len + id) in indirect
    // mode; type 3 (addr + len — the direct-access tracking index the
    // listing walk must IGNORE) in hugeBtreeDirect mode
    if (indirectHuge) {
      bthd(hugeBt, 1, 24, hugeLeaf, 1)
      buf.position(hugeLeaf.toInt); buf.put("BTLF".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(hugeObj); buf.putLong(hugeMsg.length.toLong)
      buf.putLong(1L) // object id
    } else if (hugeBtreeDirect) {
      bthd(hugeBt, 3, 16, hugeLeaf, 1)
      buf.position(hugeLeaf.toInt); buf.put("BTLF".getBytes)
      buf.put(0.toByte); buf.put(3.toByte)
      buf.putLong(hugeObj); buf.putLong(hugeMsg.length.toLong)
    }
    buf.array()
  }

  /** Superblock-v2 dense-links file whose fractal heap ROOT indirect
    * block NESTS: heap params (width 2, start 512, maxDirect 512)
    * give maxDirectRows = 2, so root row 2 (covering 1024 bytes)
    * points at a CHILD indirect block — 1 row (log2(1024/(512·2))+1)
    * of two 512-byte direct blocks. Six direct blocks total over
    * three root rows, ten `v00`..`v09` links spread 2/2/2/1/2/1.
    * `filtered = true` deflates every direct block whole (direct
    * entries widen to addr+size+mask; child-INDIRECT entries stay
    * address-only — the spec's asymmetry this fixture pins). */
  def hdf5V2DenseNested(filtered: Boolean = false): Array[Byte] = {
    val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val frhp = 160L
    val rootIb = 320L
    val childIb = 448L
    val b = Seq(512L, 1024L, 1536L, 2048L) // root rows 0-1 directs
    val c = Seq(2560L, 3072L)              // child row 0 directs
    val dsBase = 3584L; val dsStride = 96
    val dataBase = 4608L

    V2.superblock(buf, rootHdr, eof = 8192L)
    V2.ohdr2(buf, rootHdr, flags = 0,
      Seq(0x0002 -> V2.linkInfo(heap = frhp)))
    val names = (0 until 10).map(i => f"v$i%02d")
    names.zipWithIndex.foreach { case (_, i) =>
      val ds = dsBase + i * dsStride
      val data = dataBase + i * 24
      V2.ohdr2(buf, ds, flags = 0, Seq(
        0x0001 -> V2.dataspace(Seq(3L)),
        0x0003 -> V2.datatype(clazz = 1, size = 8),
        0x0008 -> V2.layoutContiguousV4(data, 24)))
      buf.putDouble(data.toInt, i.toDouble)
      buf.putDouble(data.toInt + 8, i + 0.5)
      buf.putDouble(data.toInt + 16, i + 1.0)
    }

    val filterInfo: Array[Byte] = if (filtered) {
      val fi = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      fi.put(2.toByte); fi.put(1.toByte)
      fi.putShort(1.toShort); fi.putShort(0.toShort)
      fi.putShort(1.toShort); fi.putInt(6)
      fi.array()
    } else Array.emptyByteArray
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new Array[Byte](raw.length + 64)
      val n = d.deflate(out); d.end()
      out.take(n)
    }

    buf.position(frhp.toInt); buf.put("FRHP".getBytes)
    buf.put(0.toByte)
    buf.putShort(frhp.toInt + 5, 7)
    buf.putShort(frhp.toInt + 7, filterInfo.length.toShort)
    buf.put(frhp.toInt + 9, 0.toByte)
    buf.putInt(frhp.toInt + 10, 4096)
    buf.putLong(frhp.toInt + 14, 0L)
    buf.putLong(frhp.toInt + 22, -1L)
    buf.putLong(frhp.toInt + 30, 0L)
    buf.putLong(frhp.toInt + 38, -1L)
    buf.putLong(frhp.toInt + 46, 3072L)   // managed space (6 × 512)
    buf.putLong(frhp.toInt + 54, 3072L)
    buf.putLong(frhp.toInt + 62, 0L)
    buf.putLong(frhp.toInt + 70, names.size.toLong)
    buf.putLong(frhp.toInt + 78, 0L)
    buf.putLong(frhp.toInt + 86, 0L)
    buf.putLong(frhp.toInt + 94, 0L)
    buf.putLong(frhp.toInt + 102, 0L)
    buf.putShort(frhp.toInt + 110, 2)     // table width
    buf.putLong(frhp.toInt + 112, 512L)   // starting block size
    buf.putLong(frhp.toInt + 120, 512L)   // max direct block size
    buf.putShort(frhp.toInt + 128, 32)
    buf.putShort(frhp.toInt + 130, 1)
    buf.putLong(frhp.toInt + 132, rootIb)
    buf.putShort(frhp.toInt + 140, 3)     // curr rows: 2 direct + 1 ind
    if (filtered)
      filterInfo.indices.foreach(i =>
        buf.put(frhp.toInt + 142 + i, filterInfo(i)))

    def directBlock(at: Long, offset: Int,
                    links: Seq[Array[Byte]]): Int = {
      val lb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      lb.put("FHDB".getBytes)
      lb.put(0.toByte); lb.putLong(frhp)
      lb.putInt(13, offset)
      lb.position(17)
      links.foreach(lb.put)
      val stored = if (filtered) deflate(lb.array()) else lb.array()
      buf.position(at.toInt); buf.put(stored)
      stored.length
    }
    val linkBodies = names.zipWithIndex.map { case (nm, i) =>
      V2.link(nm, dsBase + i * dsStride)
    }
    // 2/2/2/1 across root direct rows, 2/1 in the child
    val split = Seq(2, 2, 2, 1, 2, 1)
    val cuts = split.scanLeft(0)(_ + _)
    val perBlock = split.indices.map(i =>
      linkBodies.slice(cuts(i), cuts(i + 1)))
    val bSizes = b.zipWithIndex.map { case (at, i) =>
      directBlock(at, i * 512, perBlock(i))
    }
    val cSizes = c.zipWithIndex.map { case (at, i) =>
      directBlock(at, 2048 + i * 512, perBlock(4 + i))
    }

    def writeIndirect(at: Long, heapOff: Int,
                      entries: Seq[(Long, Int, Boolean)]): Unit = {
      // (addr, storedSize, isDirect) — filtered DIRECT entries carry
      // size+mask, indirect entries never do
      buf.position(at.toInt); buf.put("FHIB".getBytes)
      buf.put(0.toByte); buf.putLong(frhp)
      buf.putInt(at.toInt + 13, heapOff)
      var e = at.toInt + 17
      entries.foreach { case (addr, size, isDirect) =>
        buf.putLong(e, addr); e += 8
        if (filtered && isDirect) {
          buf.putLong(e, size.toLong); e += 8
          buf.putInt(e, 0); e += 4
        }
      }
      buf.putInt(e, 0) // checksum
    }
    writeIndirect(childIb, 2048,
      c.zip(cSizes).map { case (a, s) => (a, s, true) })
    writeIndirect(rootIb, 0,
      b.zip(bSizes).map { case (a, s) => (a, s, true) } ++
        Seq((childIb, 0, false), (-1L, 0, false)))
    buf.array()
  }

  /** Superblock-v2 file with LAYOUT-V4 chunk indexes — the storage
    * HDF5 >= 1.10 "latest format" writes for chunked data: `precip`
    * float32[5][7] chunked 3x4 behind shuffle+deflate through a
    * FIXED-ARRAY index (FAHD/FADB, filtered client-1 entries, one
    * elided all-fill chunk), `precip_contig` the same grid contiguous
    * (must agree bit-for-bit where chunks exist), `lon` float64[7] as
    * a deflate-filtered SINGLE-CHUNK index, `lat` float64[3] chunked
    * 2 through an IMPLICIT index (unfiltered, packed row-major). */
  /** @param pagedIndex write the fixed array's data block in the
    *   PAGED layout (page bitmap + per-page checksums — what large
    *   chunk counts get): pageBits = 1 → two 2-entry pages for the
    *   same four chunks, so the grids must decode identically. */
  def hdf5V2Chunked(pagedIndex: Boolean = false): Array[Byte] = {
    val fill = -9999f
    def precipAt(i: Int, j: Int): Float = (i * 10 + j).toFloat
    val lonVals = Array(-150.0, -100.0, -50.0, 0.0, 50.0, 100.0, 150.0)
    val latVals = Array(-10.0, 0.0, 10.0)

    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    def shuffle(in: Array[Byte], es: Int): Array[Byte] = {
      val n = in.length / es
      val out = new Array[Byte](in.length)
      for (i <- 0 until n; b <- 0 until es)
        out(b * n + i) = in(i * es + b)
      out
    }
    // precip chunks: 2x3 chunk grid over 5x7, padded to 3x4; the LAST
    // grid cell (rows 3-4 x cols 4-6 -> offs (3,4)) is ELIDED (all
    // fill) to pin the fill-value pre-fill through the v4 path
    def precipChunk(oy: Int, ox: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(3 * 4 * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until 3; j <- 0 until 4) {
        val y = oy + i; val x = ox + j
        b.putFloat(if (y < 5 && x < 7) precipAt(y, x) else fill)
      }
      deflate(shuffle(b.array(), 4))
    }
    val chunkGrid = for (oy <- Seq(0, 3); ox <- Seq(0, 4))
      yield (oy, ox) // row-major chunk order: (0,0) (0,4) (3,0) (3,4)
    val precipPayloads = chunkGrid.map { case (oy, ox) =>
      if (oy == 3 && ox == 4) None else Some(precipChunk(oy, ox))
    }
    val lonRaw = ByteBuffer.allocate(7 * 8).order(ByteOrder.LITTLE_ENDIAN)
    lonVals.foreach(lonRaw.putDouble)
    val lonPayload = deflate(lonRaw.array())

    val buf = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val lonHdr = 192L; val precipHdr = 320L
    val pcontigHdr = 480L; val latHdr = 624L
    val fahd = 736L; val fadb = 776L
    var dataOff = 912
    def alloc(n: Int): Long = { val o = dataOff; dataOff += n; o.toLong }

    V2.superblock(buf, rootHdr, eof = 4096L)

    def filterPipeline(ids: Seq[(Int, Seq[Int])]): Array[Byte] =
      V2.filterPipeline(ids)
    def layoutChunkedV4(cdims: Seq[Int], idxType: Int, addr: Long,
                        flags: Int = 0,
                        singleSize: Option[Long] = None): Array[Byte] =
      V2.layoutChunkedV4(cdims, idxType, addr, flags, singleSize,
        faPageBits = 10)

    // data placement
    val precipAddrs = precipPayloads.map(_.map(p => alloc(p.length)))
    val pcontigData = alloc(5 * 7 * 4)
    val lonData = alloc(lonPayload.length)
    // implicit lat: two 2-element chunks packed at the base (second
    // chunk padded to full shape)
    val latData = alloc(2 * 2 * 8)

    // fixed array for precip: FAHD + FADB, client 1 (filtered),
    // entry = addr(8) + size(4) + mask(4); the elided chunk's entry
    // carries the undefined address
    buf.position(fahd.toInt); buf.put("FAHD".getBytes)
    buf.put(0.toByte); buf.put(1.toByte)  // version, client id 1
    // entry size 16; page bits: 10 (unpaged, 4 <= 1024) or 1 (paged:
    // 2-entry pages)
    buf.put(16.toByte); buf.put((if (pagedIndex) 1 else 10).toByte)
    buf.putLong(fahd.toInt + 8, 4L)        // max entries = chunk count
    buf.putLong(fahd.toInt + 16, fadb)
    buf.putInt(fahd.toInt + 24, 0)         // checksum
    buf.position(fadb.toInt); buf.put("FADB".getBytes)
    buf.put(0.toByte); buf.put(1.toByte)
    buf.putLong(fadb.toInt + 6, fahd)
    def faEntry(e: Int, i: Int): Unit = {
      val (pay, addr) = (precipPayloads(i), precipAddrs(i))
      buf.putLong(e, addr.getOrElse(-1L))
      buf.putInt(e + 8, pay.map(_.length).getOrElse(0))
      buf.putInt(e + 12, 0) // filter mask: all filters applied
    }
    if (pagedIndex) {
      // page bitmap (both pages initialized — MSB-first bit order per
      // H5VM_bit_set, so pages 0,1 are bits 0x80,0x40), the data
      // block's OWN checksum, then two 2-entry pages each with a
      // trailing checksum
      buf.put(fadb.toInt + 14, 0xC0.toByte)
      buf.putInt(fadb.toInt + 15, 0) // data-block checksum
      val pg0 = fadb.toInt + 19
      faEntry(pg0, 0); faEntry(pg0 + 16, 1)
      buf.putInt(pg0 + 32, 0) // page 0 checksum
      val pg1 = pg0 + 36
      faEntry(pg1, 2); faEntry(pg1 + 16, 3)
      buf.putInt(pg1 + 32, 0) // page 1 checksum
    } else {
      (0 until 4).foreach(i => faEntry(fadb.toInt + 14 + i * 16, i))
      buf.putInt(fadb.toInt + 14 + 4 * 16, 0) // checksum
    }

    // object headers
    V2.ohdr2(buf, rootHdr, flags = 0, Seq(
      0x0006 -> V2.link("lon", lonHdr),
      0x0006 -> V2.link("precip", precipHdr),
      0x0006 -> V2.link("precip_contig", pcontigHdr),
      0x0006 -> V2.link("lat", latHdr)))
    V2.ohdr2(buf, lonHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 8),
      0x000B -> filterPipeline(Seq(1 -> Seq(6))),
      0x0008 -> layoutChunkedV4(Seq(7), idxType = 1, lonData,
        flags = 0x02, singleSize = Some(lonPayload.length.toLong))))
    V2.ohdr2(buf, precipHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x000B -> filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> layoutChunkedV4(Seq(3, 4), idxType = 3, fahd)))
    V2.ohdr2(buf, pcontigHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x0008 -> V2.layoutContiguousV4(pcontigData, 5 * 7 * 4)))
    V2.ohdr2(buf, latHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(3L)),
      0x0003 -> V2.datatype(clazz = 1, size = 8),
      0x0008 -> layoutChunkedV4(Seq(2), idxType = 2, latData)))

    // raw data
    precipPayloads.zip(precipAddrs).foreach {
      case (Some(p), Some(a)) => buf.position(a.toInt); buf.put(p)
      case _ => ()
    }
    buf.position(pcontigData.toInt)
    for (i <- 0 until 5; j <- 0 until 7)
      buf.putFloat(if (i >= 3 && j >= 4) fill else precipAt(i, j))
    buf.position(lonData.toInt); buf.put(lonPayload)
    buf.position(latData.toInt)
    buf.putDouble(latVals(0)); buf.putDouble(latVals(1))
    buf.putDouble(latVals(2)); buf.putDouble(0.0) // pad of chunk 2
    buf.array()
  }

  /** Superblock-v2 file exercising the remaining layout-v4 chunk
    * indexes: `precip_ea` (float32[5][7], chunks 1×4, shuffle+deflate)
    * behind an EXTENSIBLE ARRAY spanning all three element regions —
    * 2 elements inline in the index block, data blocks addressed from
    * the index block (super-block rows 0 and 1), and a real super
    * block ("EASB") with the tail data block; `precip_bt2` (same data)
    * behind a depth-1 VERSION-2 B-TREE of filtered-chunk records
    * (type 11: address + 2-byte stored size + mask + scaled offsets);
    * `lat_ea` (float64[3], chunks of 1) behind an UNFILTERED (client
    * 0) extensible array; and `precip_contig`, the contiguous twin
    * the chunked reads must equal bit-for-bit. Chunk (4,4) of both
    * precip variants is ELIDED — an undefined EA element / no B-tree
    * record — so row 4, cols 4-6 must decode as the fill value. */
  def hdf5V2EaBt2(): Array[Byte] = {
    val fill = -9999f
    def precipAt(i: Int, j: Int): Float = (i * 10 + j).toFloat
    val latVals = Array(-10.0, 0.0, 10.0)

    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    def shuffle(in: Array[Byte], es: Int): Array[Byte] = {
      val n = in.length / es
      val out = new Array[Byte](in.length)
      for (i <- 0 until n; b <- 0 until es)
        out(b * n + i) = in(i * es + b)
      out
    }
    // 1×4 chunks over 5×7: row-major chunk grid is 5×2, linear index
    // i = row*2 + col/4; chunk i=9 (row 4, cols 4-6) is elided
    def precipChunk(r: Int, cOff: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until 4) {
        val c = cOff + k
        b.putFloat(if (c < 7) precipAt(r, c) else fill)
      }
      deflate(shuffle(b.array(), 4))
    }
    val nChunks = 10
    val payloads = (0 until nChunks).map { i =>
      if (i == 9) None else Some(precipChunk(i / 2, (i % 2) * 4))
    }

    val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val eaHdr = 256L; val btHdr = 416L
    val latHdr = 576L; val contigHdr = 704L
    var dataOff = 832
    def alloc(n: Int): Long = { val o = dataOff; dataOff += n; o.toLong }

    V2.superblock(buf, rootHdr, eof = 8192L)

    // placement: chunk payloads, lat chunks, contiguous twin, indexes
    val chunkAddrs = payloads.map(_.map(p => alloc(p.length)))
    val latChunks = (0 until 3).map(_ => alloc(8))
    val contigData = alloc(5 * 7 * 4)
    val eahd = alloc(72); val eaib = alloc(110)
    val eadb0 = alloc(47); val eadb1 = alloc(75)
    val easb = alloc(35); val sdblk0 = alloc(75)
    val leahd = alloc(72); val leaib = alloc(98); val leadb0 = alloc(35)
    val bthd = alloc(38); val btin = alloc(97)
    val btlf = Seq(alloc(100), alloc(70), alloc(70))

    // ---- extensible array for precip (client 1, elemSize 14) ----
    def eaHeader(at: Long, clientId: Int, elemSize: Int, iblk: Long,
                 nsblks: Long, ndblks: Long, nelmts: Long): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("EAHD".getBytes)
      buf.put(0.toByte); buf.put(clientId.toByte)
      buf.put(elemSize.toByte); buf.put(8.toByte)  // max nelmts bits
      buf.put(2.toByte)                            // index blk elmts
      buf.put(2.toByte)                            // data blk min elmts
      buf.put(2.toByte)                            // sblk min data ptrs
      buf.put(10.toByte)                           // max dblk page bits
      // array statistics (parser skips; plausible values)
      buf.putLong(a + 12, nsblks); buf.putLong(a + 20, 35L)
      buf.putLong(a + 28, ndblks); buf.putLong(a + 36, 232L)
      buf.putLong(a + 44, nelmts); buf.putLong(a + 52, nelmts)
      buf.putLong(a + 60, iblk)
      buf.putInt(a + 68, 0) // checksum
    }
    def eaElemFiltered(p: Int, i: Int): Unit = {
      buf.putLong(p, chunkAddrs(i).getOrElse(-1L))
      buf.putShort(p + 8,
        payloads(i).map(_.length).getOrElse(0).toShort)
      buf.putInt(p + 10, 0) // filter mask
    }
    def eaDataBlock(at: Long, hdr: Long, blockOff: Int,
                    elems: Seq[Int => Unit], elemSize: Int): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("EADB".getBytes)
      buf.put(0.toByte)
      buf.put((if (hdr == eahd) 1 else 0).toByte) // client id
      buf.putLong(a + 6, hdr)
      buf.put(a + 14, blockOff.toByte) // 1-byte block offset (8 bits)
      elems.zipWithIndex.foreach { case (w, k) =>
        w(a + 15 + k * elemSize)
      }
      buf.putInt(a + 15 + elems.size * elemSize, 0) // checksum
    }
    eaHeader(eahd, clientId = 1, elemSize = 14, iblk = eaib,
      nsblks = 1L, ndblks = 4L, nelmts = 9L)
    locally { // index block: 2 inline elements, 2 dblk addrs, 6 sblk
      val a = eaib.toInt
      buf.position(a); buf.put("EAIB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      eaElemFiltered(a + 14, 0); eaElemFiltered(a + 28, 1)
      buf.putLong(a + 42, eadb0); buf.putLong(a + 50, eadb1)
      buf.putLong(a + 58, easb)
      (1 until 6).foreach(k => buf.putLong(a + 58 + k * 8, -1L))
      buf.putInt(a + 106, 0) // checksum
    }
    eaDataBlock(eadb0, eahd, 2,
      Seq(p => eaElemFiltered(p, 2), p => eaElemFiltered(p, 3)), 14)
    eaDataBlock(eadb1, eahd, 4,
      (4 to 7).map(i => (p: Int) => eaElemFiltered(p, i)), 14)
    locally { // super block (row u=2): two data-block addresses
      val a = easb.toInt
      buf.position(a); buf.put("EASB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      buf.put(a + 14, 8.toByte) // block offset: first element index
      buf.putLong(a + 15, sdblk0)
      buf.putLong(a + 23, -1L) // second data block never allocated
      buf.putInt(a + 31, 0)
    }
    eaDataBlock(sdblk0, eahd, 8,
      (8 to 11).map(i => (p: Int) => (
        if (i < nChunks) eaElemFiltered(p, i)
        else { buf.putLong(p, -1L); buf.putShort(p + 8, 0.toShort)
               buf.putInt(p + 10, 0) })), 14)

    // ---- extensible array for lat (client 0, elemSize 8) ----
    eaHeader(leahd, clientId = 0, elemSize = 8, iblk = leaib,
      nsblks = 0L, ndblks = 1L, nelmts = 3L)
    locally {
      val a = leaib.toInt
      buf.position(a); buf.put("EAIB".getBytes)
      buf.put(0.toByte); buf.put(0.toByte)
      buf.putLong(a + 6, leahd)
      buf.putLong(a + 14, latChunks(0)); buf.putLong(a + 22, latChunks(1))
      buf.putLong(a + 30, leadb0); buf.putLong(a + 38, -1L) // dblk addrs
      (0 until 6).foreach(k => buf.putLong(a + 46 + k * 8, -1L))
      buf.putInt(a + 94, 0)
    }
    eaDataBlock(leadb0, leahd, 2, Seq(
      p => buf.putLong(p, latChunks(2)),
      p => buf.putLong(p, -1L)), 8) // element 3 is past the extent

    // ---- depth-1 v2 B-tree for precip (record type 11) ----
    // records sorted by scaled offsets = linear chunk order; the 9
    // live records split leaf0={0,1,2} root-rec 3 leaf1={4,5}
    // root-rec 6 leaf2={7,8}; node size 128 → max 3 records/leaf,
    // 1-byte child-count fields
    def btRecord(p: Int, i: Int): Unit = {
      buf.putLong(p, chunkAddrs(i).getOrElse(-1L))
      buf.putShort(p + 8,
        payloads(i).map(_.length).getOrElse(0).toShort)
      buf.putInt(p + 10, 0)               // filter mask
      buf.putLong(p + 14, (i / 2).toLong) // scaled row
      buf.putLong(p + 22, (i % 2).toLong) // scaled col
    }
    locally {
      val a = bthd.toInt
      buf.position(a); buf.put("BTHD".getBytes)
      buf.put(0.toByte); buf.put(11.toByte) // filtered-chunk records
      buf.putInt(a + 6, 128)                // node size
      buf.putShort(a + 10, 30.toShort)      // record size (szW = 2)
      buf.putShort(a + 12, 1.toShort)       // depth
      buf.put(a + 14, 100.toByte); buf.put(a + 15, 40.toByte)
      buf.putLong(a + 16, btin)
      buf.putShort(a + 24, 2.toShort)       // records in root
      buf.putLong(a + 26, 9L)               // total records
      buf.putInt(a + 34, 0)
    }
    locally {
      val a = btin.toInt
      buf.position(a); buf.put("BTIN".getBytes)
      buf.put(0.toByte); buf.put(11.toByte)
      btRecord(a + 6, 3); btRecord(a + 36, 6)
      val ptrBase = a + 66 // child ptr: address(8) + nrec(1)
      val childNrec = Seq(3, 2, 2)
      btlf.zip(childNrec).zipWithIndex.foreach { case ((addr, n), k) =>
        buf.putLong(ptrBase + k * 9, addr)
        buf.put(ptrBase + k * 9 + 8, n.toByte)
      }
      buf.putInt(ptrBase + 27, 0)
    }
    def btLeaf(at: Long, recs: Seq[Int]): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("BTLF".getBytes)
      buf.put(0.toByte); buf.put(11.toByte)
      recs.zipWithIndex.foreach { case (i, k) => btRecord(a + 6 + k * 30, i) }
      buf.putInt(a + 6 + recs.size * 30, 0)
    }
    btLeaf(btlf(0), Seq(0, 1, 2))
    btLeaf(btlf(1), Seq(4, 5))
    btLeaf(btlf(2), Seq(7, 8))

    // ---- object headers ----
    V2.ohdr2(buf, rootHdr, flags = 0, Seq(
      0x0006 -> V2.link("lat_ea", latHdr),
      0x0006 -> V2.link("precip_bt2", btHdr),
      0x0006 -> V2.link("precip_contig", contigHdr),
      0x0006 -> V2.link("precip_ea", eaHdr)))
    V2.ohdr2(buf, eaHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x000B -> V2.filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> V2.layoutChunkedV4(Seq(1, 4), idxType = 4, eahd)))
    V2.ohdr2(buf, btHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x000B -> V2.filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> V2.layoutChunkedV4(Seq(1, 4), idxType = 5, bthd)))
    V2.ohdr2(buf, latHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(3L)),
      0x0003 -> V2.datatype(clazz = 1, size = 8),
      0x0008 -> V2.layoutChunkedV4(Seq(1), idxType = 4, leahd)))
    V2.ohdr2(buf, contigHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x0008 -> V2.layoutContiguousV4(contigData, 5 * 7 * 4)))

    // ---- raw data ----
    payloads.zip(chunkAddrs).foreach {
      case (Some(p), Some(a)) => buf.position(a.toInt); buf.put(p)
      case _ => ()
    }
    latChunks.zip(latVals).foreach { case (a, v) =>
      buf.putDouble(a.toInt, v)
    }
    buf.position(contigData.toInt)
    for (i <- 0 until 5; j <- 0 until 7)
      buf.putFloat(if (i == 4 && j >= 4) fill else precipAt(i, j))
    buf.array()
  }

  /** Superblock-v2 file whose extensible array reaches a PAGED
    * super-block row: `precip_ea` (float32[5][7], chunks 1×2 → a 20-
    * chunk grid, shuffle+deflate) with EA page size 4 (`max dblk page
    * bits` = 2), so super-block row u=3's 8-element data blocks split
    * into two 4-element pages. Chunks 16–19 land in that row's first
    * data block, page 0 (init bit set, MSB-first); page 1 and the
    * second data block are never written (bits clear / undefined
    * address). Chunk 19 is ELIDED inside an initialized page, and
    * `precip_contig` is the contiguous twin the paged read must
    * equal bit-for-bit. */
  def hdf5V2EaPaged(): Array[Byte] = {
    val fill = -9999f
    def precipAt(i: Int, j: Int): Float = (i * 10 + j).toFloat
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    def shuffle(in: Array[Byte], es: Int): Array[Byte] = {
      val n = in.length / es
      val out = new Array[Byte](in.length)
      for (i <- 0 until n; b <- 0 until es)
        out(b * n + i) = in(i * es + b)
      out
    }
    // 1×2 chunks over 5×7: chunk grid 5×4, linear idx i = r*4 + c;
    // chunk 19 (r4, col 6 + pad) is elided
    val nChunks = 20
    def precipChunk(r: Int, cOff: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(2 * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until 2) {
        val c = cOff + k
        b.putFloat(if (c < 7) precipAt(r, c) else fill)
      }
      deflate(shuffle(b.array(), 4))
    }
    val payloads = (0 until nChunks).map { i =>
      if (i == 19) None else Some(precipChunk(i / 4, (i % 4) * 2))
    }

    val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val eaHdr = 256L; val contigHdr = 416L
    var dataOff = 560
    def alloc(n: Int): Long = { val o = dataOff; dataOff += n; o.toLong }

    V2.superblock(buf, rootHdr, eof = 8192L)

    val chunkAddrs = payloads.map(_.map(p => alloc(p.length)))
    val contigData = alloc(5 * 7 * 4)
    val eahd = alloc(72); val eaib = alloc(110)
    val dblkR0 = alloc(47); val dblkR1 = alloc(75)
    val dblkR2a = alloc(75); val dblkR2b = alloc(75)
    val sblk2 = alloc(35); val sblk3 = alloc(36)
    val dblkR3a = alloc(19 + 2 * (4 * 14 + 4)) // paged: prefix + 2 pages

    // EAHD: params (page bits = 2 → 4-element pages), stats, address
    locally {
      val a = eahd.toInt
      buf.position(a); buf.put("EAHD".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)  // version, client 1
      buf.put(14.toByte); buf.put(8.toByte) // elem size, max nelmts bits
      buf.put(2.toByte)                     // index blk elmts
      buf.put(2.toByte)                     // data blk min elmts
      buf.put(2.toByte)                     // sblk min data ptrs
      buf.put(2.toByte)                     // max dblk page bits → 4
      buf.putLong(a + 12, 2L); buf.putLong(a + 20, 71L) // stats
      buf.putLong(a + 28, 5L); buf.putLong(a + 36, 410L)
      buf.putLong(a + 44, 20L); buf.putLong(a + 52, 20L)
      buf.putLong(a + 60, eaib)
      buf.putInt(a + 68, 0)
    }
    def eaElem(p: Int, i: Int): Unit = {
      buf.putLong(p, chunkAddrs(i).getOrElse(-1L))
      buf.putShort(p + 8,
        payloads(i).map(_.length).getOrElse(0).toShort)
      buf.putInt(p + 10, 0) // filter mask
    }
    locally { // index block: 2 inline elems, 2 dblk addrs, 6 sblk addrs
      val a = eaib.toInt
      buf.position(a); buf.put("EAIB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      eaElem(a + 14, 0); eaElem(a + 28, 1)
      buf.putLong(a + 42, dblkR0); buf.putLong(a + 50, dblkR1)
      buf.putLong(a + 58, sblk2); buf.putLong(a + 66, sblk3)
      (2 until 6).foreach(k => buf.putLong(a + 58 + k * 8, -1L))
      buf.putInt(a + 106, 0)
    }
    def eaDataBlock(at: Long, blockOff: Int, elems: Seq[Int]): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("EADB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      buf.put(a + 14, blockOff.toByte)
      elems.zipWithIndex.foreach { case (i, k) => eaElem(a + 15 + k * 14, i) }
      buf.putInt(a + 15 + elems.size * 14, 0)
    }
    eaDataBlock(dblkR0, 2, Seq(2, 3))
    eaDataBlock(dblkR1, 4, 4 to 7)
    eaDataBlock(dblkR2a, 8, 8 to 11)
    eaDataBlock(dblkR2b, 12, 12 to 15)
    locally { // super block row u=2 (unpaged 4-elem data blocks)
      val a = sblk2.toInt
      buf.position(a); buf.put("EASB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      buf.put(a + 14, 8.toByte)
      buf.putLong(a + 15, dblkR2a); buf.putLong(a + 23, dblkR2b)
      buf.putInt(a + 31, 0)
    }
    locally { // super block row u=3: PAGED (8 elems > 4/page) — page-
      // init bitmap (2 dblks × 2 pages, MSB-first: dblk0 page0 = 0x80)
      // sits between the block offset and the data block addresses
      val a = sblk3.toInt
      buf.position(a); buf.put("EASB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      buf.put(a + 14, 16.toByte)
      buf.put(a + 15, 0x80.toByte) // page bitmap
      buf.putLong(a + 16, dblkR3a)
      buf.putLong(a + 24, -1L)     // second data block never allocated
      buf.putInt(a + 32, 0)
    }
    locally { // paged data block: prefix (sig+ver+client, header addr,
      // block offset, own checksum), then 4-elem pages each with a
      // trailing checksum; page 1 uninitialized (bitmap bit clear)
      val a = dblkR3a.toInt
      buf.position(a); buf.put("EADB".getBytes)
      buf.put(0.toByte); buf.put(1.toByte)
      buf.putLong(a + 6, eahd)
      buf.put(a + 14, 16.toByte)
      buf.putInt(a + 15, 0)        // data block's own checksum
      val pg0 = a + 19
      (16 to 19).zipWithIndex.foreach { case (i, k) =>
        eaElem(pg0 + k * 14, i) }
      buf.putInt(pg0 + 56, 0)      // page 0 checksum
      // page 1 (idx 20-23, past the chunk grid): left uninitialized
    }

    V2.ohdr2(buf, rootHdr, flags = 0, Seq(
      0x0006 -> V2.link("precip_contig", contigHdr),
      0x0006 -> V2.link("precip_ea", eaHdr)))
    V2.ohdr2(buf, eaHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x000B -> V2.filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> V2.layoutChunkedV4(Seq(1, 2), idxType = 4, eahd)))
    V2.ohdr2(buf, contigHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x0008 -> V2.layoutContiguousV4(contigData, 5 * 7 * 4)))

    payloads.zip(chunkAddrs).foreach {
      case (Some(p), Some(a)) => buf.position(a.toInt); buf.put(p)
      case _ => ()
    }
    buf.position(contigData.toInt)
    for (i <- 0 until 5; j <- 0 until 7)
      buf.putFloat(if (i == 4 && j == 6) fill else precipAt(i, j))
    buf.array()
  }

  /** Superblock-v2 file with a DEPTH-2 version-2 B-tree chunk index —
    * the first depth where the node-capacity recurrence matters: the
    * root's child pointers carry a cumulative-record-count field
    * (cumSize(1) = 1 byte here) that depth-1 pointers don't, so any
    * width error shifts every pointer. `precip_bt2` is float32[5][7]
    * in 1×2 chunks (a 5×4 grid, 20 chunks), shuffle+deflate, record
    * type 11; chunks {5, 10, 17, 19} are ELIDED (no record — interior
    * AND tail gaps), and `precip_contig` is the contiguous twin the
    * tree walk must equal bit-for-bit. Node size 128 → 3 records/leaf,
    * 2/internal; 16 live records span root(1) + two depth-1 subtrees
    * (10 + 5) in scaled-offset order. */
  def hdf5V2Bt2Deep(): Array[Byte] = {
    val fill = -9999f
    def precipAt(i: Int, j: Int): Float = (i * 10 + j).toFloat
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new ByteArrayOutputStream()
      val tmp = new Array[Byte](256)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end(); out.toByteArray
    }
    def shuffle(in: Array[Byte], es: Int): Array[Byte] = {
      val n = in.length / es
      val out = new Array[Byte](in.length)
      for (i <- 0 until n; b <- 0 until es)
        out(b * n + i) = in(i * es + b)
      out
    }
    val nChunks = 20
    val elided = Set(5, 10, 17, 19)
    def precipChunk(r: Int, cOff: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(2 * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until 2) {
        val c = cOff + k
        b.putFloat(if (c < 7) precipAt(r, c) else fill)
      }
      deflate(shuffle(b.array(), 4))
    }
    val payloads = (0 until nChunks).map { i =>
      if (elided(i)) None else Some(precipChunk(i / 4, (i % 4) * 2))
    }
    // live chunk indices in scaled-offset (= linear) order, dealt
    // in-order across the depth-2 tree
    val live = (0 until nChunks).filterNot(elided).toVector
    assert(live.size == 16)
    val Seq(leafA1, recA1, leafA2, recA2, leafA3, rootRec, leafB1,
      recB1, leafB2) = Seq(
      live.slice(0, 3), Seq(live(3)), live.slice(4, 7), Seq(live(7)),
      live.slice(8, 10), Seq(live(10)), live.slice(11, 13),
      Seq(live(13)), live.slice(14, 16))

    val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    val rootHdr = 64L
    val btHdr = 256L; val contigHdr = 416L
    var dataOff = 560
    def alloc(n: Int): Long = { val o = dataOff; dataOff += n; o.toLong }

    V2.superblock(buf, rootHdr, eof = 8192L)

    val chunkAddrs = payloads.map(_.map(p => alloc(p.length)))
    val contigData = alloc(5 * 7 * 4)
    val bthd = alloc(38)
    val btRoot = alloc(60)           // BTIN d2: 1 rec, 2 ptrs of 10
    val btinA = alloc(97)            // BTIN d1: 2 recs, 3 ptrs of 9
    val btinB = alloc(58)            // BTIN d1: 1 rec, 2 ptrs of 9
    val lA1 = alloc(100); val lA2 = alloc(100); val lA3 = alloc(70)
    val lB1 = alloc(70); val lB2 = alloc(70)

    def btRecord(p: Int, i: Int): Unit = {
      buf.putLong(p, chunkAddrs(i).getOrElse(-1L))
      buf.putShort(p + 8,
        payloads(i).map(_.length).getOrElse(0).toShort)
      buf.putInt(p + 10, 0)               // filter mask
      buf.putLong(p + 14, (i / 4).toLong) // scaled row
      buf.putLong(p + 22, (i % 4).toLong) // scaled col
    }
    locally {
      val a = bthd.toInt
      buf.position(a); buf.put("BTHD".getBytes)
      buf.put(0.toByte); buf.put(11.toByte) // filtered-chunk records
      buf.putInt(a + 6, 128)                // node size
      buf.putShort(a + 10, 30.toShort)      // record size (szW = 2)
      buf.putShort(a + 12, 2.toShort)       // DEPTH 2
      buf.put(a + 14, 100.toByte); buf.put(a + 15, 40.toByte)
      buf.putLong(a + 16, btRoot)
      buf.putShort(a + 24, 1.toShort)       // records in root
      buf.putLong(a + 26, 16L)              // total records
      buf.putInt(a + 34, 0)
    }
    locally { // root internal node (depth 2): child pointers carry
      // address(8) + nrec(1) + TOTAL records in subtree (1 byte —
      // encSize(cumMax(1) = 11)); a wrong total-field width would
      // shift the second pointer
      val a = btRoot.toInt
      buf.position(a); buf.put("BTIN".getBytes)
      buf.put(0.toByte); buf.put(11.toByte)
      btRecord(a + 6, rootRec.head)
      val ptrBase = a + 36
      buf.putLong(ptrBase, btinA)
      buf.put(ptrBase + 8, 2.toByte)        // records in A
      buf.put(ptrBase + 9, 10.toByte)       // total in A's subtree
      buf.putLong(ptrBase + 10, btinB)
      buf.put(ptrBase + 18, 1.toByte)
      buf.put(ptrBase + 19, 5.toByte)
      buf.putInt(ptrBase + 20, 0)
    }
    def btInternal1(at: Long, recs: Seq[Int],
                    children: Seq[(Long, Int)]): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("BTIN".getBytes)
      buf.put(0.toByte); buf.put(11.toByte)
      recs.zipWithIndex.foreach { case (i, k) => btRecord(a + 6 + k * 30, i) }
      val ptrBase = a + 6 + recs.size * 30  // leaf ptrs: addr(8)+nrec(1)
      children.zipWithIndex.foreach { case ((addr, n), k) =>
        buf.putLong(ptrBase + k * 9, addr)
        buf.put(ptrBase + k * 9 + 8, n.toByte)
      }
      buf.putInt(ptrBase + children.size * 9, 0)
    }
    btInternal1(btinA, recA1 ++ recA2,
      Seq((lA1, leafA1.size), (lA2, leafA2.size), (lA3, leafA3.size)))
    btInternal1(btinB, recB1,
      Seq((lB1, leafB1.size), (lB2, leafB2.size)))
    def btLeaf(at: Long, recs: Seq[Int]): Unit = {
      val a = at.toInt
      buf.position(a); buf.put("BTLF".getBytes)
      buf.put(0.toByte); buf.put(11.toByte)
      recs.zipWithIndex.foreach { case (i, k) => btRecord(a + 6 + k * 30, i) }
      buf.putInt(a + 6 + recs.size * 30, 0)
    }
    btLeaf(lA1, leafA1); btLeaf(lA2, leafA2); btLeaf(lA3, leafA3)
    btLeaf(lB1, leafB1); btLeaf(lB2, leafB2)

    V2.ohdr2(buf, rootHdr, flags = 0, Seq(
      0x0006 -> V2.link("precip_bt2", btHdr),
      0x0006 -> V2.link("precip_contig", contigHdr)))
    V2.ohdr2(buf, btHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x000B -> V2.filterPipeline(Seq(2 -> Seq(4), 1 -> Seq(6))),
      0x0008 -> V2.layoutChunkedV4(Seq(1, 2), idxType = 5, bthd)))
    V2.ohdr2(buf, contigHdr, flags = 0, Seq(
      0x0001 -> V2.dataspace(Seq(5L, 7L)),
      0x0003 -> V2.datatype(clazz = 1, size = 4),
      0x0005 -> V2.fillValueMsg(fill),
      0x0008 -> V2.layoutContiguousV4(contigData, 5 * 7 * 4)))

    payloads.zip(chunkAddrs).foreach {
      case (Some(p), Some(a)) => buf.position(a.toInt); buf.put(p)
      case _ => ()
    }
    buf.position(contigData.toInt)
    for (i <- 0 until 5; j <- 0 until 7) {
      val chunkIdx = i * 4 + j / 2
      buf.putFloat(if (elided(chunkIdx)) fill else precipAt(i, j))
    }
    buf.array()
  }
}
