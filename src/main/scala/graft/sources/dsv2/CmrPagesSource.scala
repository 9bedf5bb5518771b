package graft.sources.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.util
import scala.jdk.CollectionConverters._

/** S3 as a DataSource V2 table with partition-per-page (SURVEY §2.1's
  * nominated shape for the CMR granule query): the reference loops
  * `search/granules.json` pages serially on the driver, re-triggering
  * itself via Step Functions when the payload fills up
  * (`cmr-query/handler.py:104-151`); here every page is an input
  * partition fetched by an executor task, so a million-granule
  * collection fans out instead of paging one-at-a-time.
  *
  * Two page stores behind one source, dispatched on the path scheme:
  *  - a directory of `page-*.json` files, each holding one page's
  *    `feed.entry` array (exactly the fixture shape of the reference's
  *    tests, `conftest.py:78-114`) — one partition per file;
  *  - an `http(s)://...search/granules.json?...` endpoint — planning
  *    probes `CMR-Hits` once (page_size=1) to learn the total, plans
  *    ceil(hits / page_size) partitions, and each partition GETs its
  *    own `page_num` ([[HttpPages]]); an optional `token` option is
  *    sent as a bearer `Authorization` header (Earthdata-style auth).
  *
  * Limit pushdown (W4): `page_size` (default 100, the CMR default)
  * lets a pushed LIMIT prune whole pages at planning time — the
  * partition list shrinks to ceil(limit / page_size) pages, mirroring
  * the `CMR-Hits`-bounded pagination of the reference.
  *
  * Rows are `(page, granule_json)`; [[graft.sources.Cmr.pagedGranules]]
  * decodes them against the granule schema partition-parallel.
  */
class CmrPagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cmr-pages"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CmrPagesSource.schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new CmrPagesTable(
      opts.getOrElse("path", throw new IllegalArgumentException(
        "graft-cmr-pages requires a path")),
      opts.get("page_size").map(_.toInt).getOrElse(100),
      opts.get("token"))
  }
}

object CmrPagesSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("granule_json", StringType, nullable = false)))
}

class CmrPagesTable(root: String, pageSize: Int, token: Option[String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-cmr-pages($root)"
  override def schema(): StructType = CmrPagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CmrPagesScanBuilder(root, pageSize, token)
}

class CmrPagesScanBuilder(root: String, pageSize: Int, token: Option[String])
  extends ScanBuilder with SupportsPushDownLimit {

  private var limit: Option[Int] = None

  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false // pages may be ragged; Spark re-applies the limit above
  }

  override def build(): Scan = new CmrPagesScan(root, pageSize, limit, token)
}

case class CmrPagePartition(page: Int, file: String) extends InputPartition

class CmrPagesScan(root: String, pageSize: Int, limit: Option[Int],
                   token: Option[String] = None)
  extends Scan with Batch {

  override def readSchema(): StructType = CmrPagesSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-cmr-pages root=$root pageSize=$pageSize" +
      limit.map(l => s" PushedLimit=$l").getOrElse("")

  private def keepForLimit(pages: Array[CmrPagePartition])
  : Array[CmrPagePartition] = limit match {
    case Some(l) =>
      val needed = math.max(1, (l + pageSize - 1) / pageSize) + 1
      pages.take(needed)
    case None => pages
  }

  /** One partition per page file, pruned to the pushed limit.
    *
    * Pruning precondition (CMR pagination semantics): every page except
    * the final one is full, i.e. holds exactly `page_size` entries —
    * so a prefix of m < total pages holds at least m * page_size rows.
    * Because a mis-specified `page_size` option (or a ragged fixture)
    * breaks that invariant silently, one EXTRA page beyond
    * ceil(limit / page_size) is always kept; `pushLimit` returned
    * false, so Spark re-applies the limit above and trims the surplus. */
  override def planInputPartitions(): Array[InputPartition] =
    if (HttpPages.isHttp(root)) {
      // one CMR-Hits probe tells us the page count exactly — the
      // partition-per-page fan-out of the reference's serial
      // `hits > limit * page` loop (handler.py:145)
      val total = HttpPages.hits(root, HttpPages.authHeaders(token))
      val nPages = ((total + pageSize - 1) / pageSize).toInt
      val pages = (1 to nPages).map(i =>
        CmrPagePartition(i, HttpPages.pageUrl(root, i, pageSize))).toArray
      keepForLimit(pages).toArray[InputPartition]
    } else {
      val spark = org.apache.spark.sql.SparkSession.active
      val p = new Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pages = fs.listStatus(p).filter(_.isFile)
        .map(_.getPath.toString)
        .filter(f => f.split('/').last.matches("page-\\d+\\.json"))
        // numeric order: a lexicographic filename sort puts
        // page-10 before page-2, scrambling the public `page`
        // column and breaking the LIMIT-pruning precondition that
        // every kept page except the last is full
        .sortBy(f => f.split('/').last
          .stripPrefix("page-").stripSuffix(".json").toInt)
        .zipWithIndex
        .map { case (f, i) => CmrPagePartition(i + 1, f) }
      keepForLimit(pages).toArray[InputPartition]
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new CmrPagesReaderFactory(new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration), token)
  }
}

class CmrPagesReaderFactory(conf: SerializableConfiguration,
                            token: Option[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] = {
    val pp = partition.asInstanceOf[CmrPagePartition]
    new CmrPageReader(pp, conf, token)
  }
}

/** Reads one page — an HTTP GET of its `page_num` (live CMR) or a
  * filesystem page file (fixtures) — into one row per granule. */
class CmrPageReader(part: CmrPagePartition, conf: SerializableConfiguration,
                    token: Option[String])
  extends PartitionReader[InternalRow] {

  private val iter: Iterator[String] = {
    val body =
      if (HttpPages.isHttp(part.file)) {
        val r = HttpPages.get(part.file, HttpPages.authHeaders(token))
        require(r.status == 200,
          s"HTTP ${r.status} fetching page ${part.page}: ${r.body.take(200)}")
        r.body
      } else {
        val path = new Path(part.file)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        val bytes =
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      }
    HttpPages.entries(body)
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (iter.hasNext) {
      current = InternalRow(part.page,
        UTF8String.fromString(iter.next()))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
