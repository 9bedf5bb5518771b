package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

/** K3/S6/S7/F14/F15 — the cogify stage (reference
  * `lambdas/cogify/handler.py`).
  *
  * What is preserved exactly:
  *  - suffix dispatch: `.he5` → HDF5 conversion path, `.tif` → GeoTIFF
  *    COG translate, anything else is an error row
  *    (`handler.py:233-243` — the reference raises; here the row is
  *    flagged for the quarantine sink, T2)
  *  - per-collection config (`example.ini`): variable_name, group,
  *    x/y coordinate variables, src_crs, affine
  *  - the affine override is a PARSED 6-term tuple — the reference
  *    `eval`s a Python expression (`handler.py:147`), which is exactly
  *    the kind of thing not to port; the term language below covers
  *    every config the reference ships (`(xmin, xres, 0, ymax, 0,
  *    -yres)`)
  *  - output naming `{filename}.tif`, upload target
  *    `{output_dir}/{collection}/{filename}` (`handler.py:216-218`)
  *
  * What is pluggable: the actual raster IO ([[FileTransform]]).
  * GDAL/rasterio are CPython-native; production wires a JNI/GDAL or
  * process-based transform, tests use [[passthroughTransform]]. The
  * conversion is per-file local work inside `mapPartitions` —
  * embarrassingly parallel, no shuffle (SURVEY §2.1/S6). */
object Cogify {

  /** F15 — affine geotransform term language (replaces the eval). */
  sealed trait AffineTerm
  case object Xmin extends AffineTerm
  case object Ymax extends AffineTerm
  case object Xres extends AffineTerm
  case object Yres extends AffineTerm
  case object NegXres extends AffineTerm
  case object NegYres extends AffineTerm
  final case class Const(v: Double) extends AffineTerm

  /** Parse the reference's ini tuple syntax, e.g.
    * `(xmin, xres, 0, ymax, 0, -yres)` → 6 terms. Unknown symbols are
    * rejected at config-load time, not evaluated. */
  def parseAffine(s: String): Seq[AffineTerm] = {
    val terms = s.trim.stripPrefix("(").stripSuffix(")").split(",")
      .map(_.trim.toLowerCase)
    require(terms.length == 6, s"affine needs 6 terms: $s")
    terms.toSeq.map {
      case "xmin" => Xmin
      case "ymax" => Ymax
      case "xres" => Xres
      case "yres" => Yres
      case "-xres" => NegXres
      case "-yres" => NegYres
      case n => Const(java.lang.Double.parseDouble(n))
    }
  }

  /** Evaluate a parsed affine against the grid envelope (the only
    * variables the reference exposes to its eval, `handler.py:143-147`). */
  def evalAffine(terms: Seq[AffineTerm], xmin: Double, ymax: Double,
                 xres: Double, yres: Double): Seq[Double] =
    terms.map {
      case Xmin => xmin
      case Ymax => ymax
      case Xres => xres
      case Yres => yres
      case NegXres => -xres
      case NegYres => -yres
      case Const(v) => v
    }

  /** Per-collection conversion config (`example.ini` sections). */
  case class CollectionConfig(
      variableName: Option[String] = None,
      group: Option[String] = None,
      xVariable: Option[String] = None,
      yVariable: Option[String] = None,
      srcCrs: Option[String] = None,
      affine: Option[Seq[AffineTerm]] = None,
      outputBucket: String = "",
      outputDir: String = "file-staging")

  /** S6 — derive the conversion grid for a NetCDF/HDF5 input from its
    * header bytes + the collection config: the exact inputs
    * `hdf5_to_cog` computes before reprojection (`handler.py:96-120` —
    * variable shape via group dispatch, `_FillValue`, x/y extent with
    * the global default) plus the evaluated affine override
    * (`handler.py:143-147`: `xres = (xmax-xmin)/width` etc against the
    * parsed 6-term language — never an eval). */
  def netcdfGrid(bytes: Array[Byte], cfg: CollectionConfig)
  : Either[String, (graft.sources.NetCdf.GridInfo, Option[Seq[Double]])] =
    cfg.variableName.toRight("no variable_name configured").flatMap { v =>
      graft.sources.NetCdf.gridInfo(bytes, v, cfg.group, cfg.xVariable,
        cfg.yVariable).map { g =>
        val affine = cfg.affine.map { terms =>
          val xres = (g.xmax - g.xmin) / g.width.toDouble
          val yres = (g.ymax - g.ymin) / g.height.toDouble
          evalAffine(terms, g.xmin, g.ymax, xres, yres)
        }
        (g, affine)
      }
    }

  /** K3 — real COG bytes for a classic-NetCDF input: grid data +
    * envelope from the parsed header ([[netcdfGrid]]), affine override
    * honored, float32 tiled-deflate output via
    * [[graft.sources.GeoTiffWriter]] (the JVM replacement for the
    * reference's GDAL `cog_translate` deflate profile,
    * `handler.py:151-220`). */
  def classicNetcdfToCog(bytes: Array[Byte], cfg: CollectionConfig,
                         tileSize: Int = 256)
  : Either[String, Array[Byte]] =
    netcdfGrid(bytes, cfg).flatMap { case (g, affine) =>
      graft.sources.NetCdf.parse(bytes).flatMap { meta =>
        val path = cfg.group.map(gr => s"$gr/${cfg.variableName.get}")
          .getOrElse(cfg.variableName.get)
        graft.sources.NetCdf.readGrid2D(bytes, meta, path)
          .toRight(s"no readable 2-D data for $path")
          .map { data =>
            val w = g.width.toInt; val h = g.height.toInt
            val xres = (g.xmax - g.xmin) / w
            val yres = (g.ymax - g.ymin) / h
            val transform = affine.getOrElse(
              Seq(g.xmin, xres, 0.0, g.ymax, 0.0, -yres))
            graft.sources.GeoTiffWriter.write(w, h, data,
              graft.sources.GeoTiffWriter.Geo(transform, epsg = 4326),
              g.fillValue, tileSize)
          }
      }
    }

  /** [[FileTransform]] doing the real conversion for classic-NetCDF
    * inputs (local/Hadoop-readable paths). Output naming matches the
    * reference: `{stem}.tif` next to the input (`handler.py:174`). */
  class NetcdfCogTransform(tileSize: Int = 256) extends FileTransform {
    def toCog(url: String, collection: String,
              config: CollectionConfig): String = {
      val in = java.nio.file.Paths.get(url.stripPrefix("file://"))
      val bytes = java.nio.file.Files.readAllBytes(in)
      val cog = classicNetcdfToCog(bytes, config, tileSize)
        .fold(e => throw new IllegalArgumentException(e), identity)
      val stem = in.getFileName.toString.replaceAll("\\.[^.]+$", "")
      val out = in.resolveSibling(stem + ".tif")
      java.nio.file.Files.write(out, cog)
      out.toString
    }
  }

  /** One file conversion: local input → local COG output. Production
    * implementations shell out to GDAL / use JNI; the contract is
    * file-in/file-out so the Spark layer never sees raster bytes. */
  trait FileTransform extends Serializable {
    /** @return local path of the produced COG */
    def toCog(url: String, collection: String,
              config: CollectionConfig): String
  }

  /** Test-double transform: emits `{filename}.tif` without raster IO
    * (the reference's naming, `handler.py:174`). */
  object passthroughTransform extends FileTransform {
    def toCog(url: String, collection: String,
              config: CollectionConfig): String = url + ".tif"
  }

  private def outSchema(in: StructType) = StructType(in.fields ++ Seq(
    StructField("cog_error", StringType, nullable = true)))

  /** Run the cogify stage: suffix-dispatch each eligible row through
    * the transform, rewrite `remote_fileurl` to the upload target
    * (`s3://{bucket}/{dir}/{collection}/{file}`), flag unsupported
    * suffixes in `cog_error` for the DLQ. Rows with `cogify=false`
    * pass through untouched. */
  def run(objs: DataFrame, transform: FileTransform,
          configs: Map[String, CollectionConfig],
          defaultConfig: CollectionConfig = CollectionConfig())
  : DataFrame = {
    val schema = objs.schema
    val out = outSchema(schema)
    val urlIdx = schema.fieldIndex("remote_fileurl")
    val colIdx = schema.fieldIndex("collection")
    val cogIdx = schema.fieldIndex("cogify")
    val upIdx = schema.fieldIndex("upload")
    objs.mapPartitions { rows =>
      rows.map { row =>
        val base = row.toSeq
        def pass(err: String) = Row.fromSeq(base :+ err)
        if (row.isNullAt(cogIdx) || !row.getBoolean(cogIdx)) pass(null)
        else {
          val url = row.getString(urlIdx)
          val coll = row.getString(colIdx)
          val cfg = configs.getOrElse(coll, defaultConfig)
          if (!url.endsWith(".he5") && !url.endsWith(".tif"))
            pass(s"File type not supported: $url")
          else {
            val local = transform.toCog(url, coll, cfg)
            val upload = !row.isNullAt(upIdx) && row.getBoolean(upIdx)
            val newUrl =
              if (upload) {
                val name = local.split('/').last
                s"s3://${cfg.outputBucket}/${cfg.outputDir}/$coll/$name"
              } else local
            Row.fromSeq(base.updated(urlIdx, newUrl) :+ (null: String))
          }
        }
      }
    }(RowEncoder.encoderFor(out))
    .toDF(out.fieldNames.toIndexedSeq: _*)
  }
}
