package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Paginated-API source as a genuine DataSourceV2 connector (reference
  * S4/S5/S6: the Spotify client pages search results with
  * offset += limit until an empty page, probes `total` with a limit=1
  * request first, and batches point lookups at <= 50 ids per call —
  * spotify_client.py:204-245, 506-553, 431-467; page size `api_limit`
  * and rate `api_timeout` from config/settings_example.toml:30-32).
  *
  * Spark-first shape: the probe happens once at planning time (the
  * analog of the reference's limit=1 total probe), then ONE INPUT
  * PARTITION PER PAGE so a 1000-executor cluster pulls pages
  * concurrently — bounded by `ratePerPartitionMs`, the per-reader
  * token interval that keeps aggregate request rate under the API
  * budget (reference: 0.5 s sleep between calls — sequential there,
  * budgeted-parallel here).
  *
  * The API itself sits behind the [[SpotifyService]] trait; which
  * implementation to use is an option (`service` = fully-qualified
  * name, resolved again executor-side since V2 options are strings).
  * [[FakeApi]] is the default — a deterministic in-process endpoint
  * (zero-egress container) producing the same page payloads for the
  * same (offset, limit) forever; an HTTP implementation plugs in via
  * the same option with no source changes (PagedSourceSpec proves the
  * swap with a second implementation).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PagedSourceProvider")
  *   .option("total", 5000).option("pageSize", 50)
  *   .option("service", "graft.sources.FakeApi").load()
  * }}}
  */
class PagedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeApi.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

/** Deterministic in-process [[SpotifyService]] stand-in for the remote
  * paginated API (the offline default — zero-egress container).
  */
object FakeApi extends SpotifyService {
  val schema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("popularity", IntegerType, nullable = false)))

  private val categories = Array("rock", "pop", "jazz", "folk", "ska")

  /** The reference probes total with a limit=1 request
    * (spotify_client.py:527-529); here the "server" reports it.
    */
  override def probeTotal(configuredTotal: Int): Int = configuredTotal

  /** One page of results; empty past the end (the loop-until-empty
    * contract — the reference does not trust `total`, README.md:148-149).
    */
  override def page(offset: Int, limit: Int, total: Int): Seq[(Long, String, String, Int)] =
    (offset until math.min(offset + limit, total)).map { i =>
      (i.toLong, s"track_$i", categories(i % categories.length), i * 37 % 101)
    }

  /** Deterministic fake feature endpoint: one "call" per id batch. */
  override def featureBatch(ids: Seq[Long]): Seq[(Long, Double)] =
    ids.map(id => id -> (id * 2654435761L % 1000) / 10.0)

  /** "Server-side" filtered page: only matching rows are constructed —
    * the in-process stand-in for a filter term inside the API request.
    */
  override def pageFiltered(offset: Int, limit: Int, total: Int,
      category: Option[String]): Seq[(Long, String, String, Int)] =
    category match {
      case Some(c) =>
        (offset until math.min(offset + limit, total))
          .filter(i => categories(i % categories.length) == c)
          .map(i => (i.toLong, s"track_$i", c, i * 37 % 101))
      case None => page(offset, limit, total)
    }
}

class PagedTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "paged_api"
  override def schema(): StructType = FakeApi.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new PagedScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class PagedScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = {
    import scala.jdk.CollectionConverters._
    new PagedScan(
      total = options.getInt("total", 1000),
      pageSize = options.getInt("pageSize", 50),
      rateMs = options.getLong("ratePerPartitionMs", 0L),
      serviceClass = options.getOrDefault("service", "graft.sources.FakeApi"),
      connectOptions = options.asScala.toMap)
  }
}

class PagedScan(total: Int, pageSize: Int, rateMs: Long,
    serviceClass: String, connectOptions: Map[String, String])
  extends Scan with Batch {
  override def readSchema(): StructType = FakeApi.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedScan(total=$total, pageSize=$pageSize, rateMs=$rateMs, service=$serviceClass)"

  override def planInputPartitions(): Array[InputPartition] = {
    // planning-time probe (the limit=1 total request), against the
    // configured service — the driver-side connect+probe
    val svc = SpotifyService.resolve(serviceClass)
    svc.connect(connectOptions)
    val probed = svc.probeTotal(total)
    val nPages = (probed + pageSize - 1) / pageSize
    (0 until nPages).map(p =>
      PagePartition(p * pageSize, pageSize, probed, rateMs, serviceClass, connectOptions)
      : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = PagedReaderFactory
}

case class PagePartition(offset: Int, limit: Int, total: Int, rateMs: Long,
    serviceClass: String, connectOptions: Map[String, String])
  extends InputPartition

/** Batched point-lookup against the API (reference S6: audio-features
  * fetched in chunks of <= 50 track ids per call,
  * spotify_client.py:431-467). mapPartitions + grouped(batchSize) keeps
  * the request count at ceil(n/batch) per partition — the distributed
  * generalization of the reference's sequential chunking — while the
  * ids stay distributed (no driver collect).
  */
object BatchedLookup {
  import org.apache.spark.sql.DataFrame

  def features(df: DataFrame, idCol: String, batchSize: Int = 50,
      service: SpotifyService = FakeApi): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol).as[Long]
      .mapPartitions(_.grouped(batchSize).flatMap(b => service.featureBatch(b.toSeq)))
      .toDF("id", "feature")
  }
}

object PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // executor-side service resolution (V2 options are strings) +
      // the per-reader connect (OAuth2 seam), then the rate gate
      private val svc = SpotifyService.resolve(p.serviceClass)
      svc.connect(p.connectOptions)
      if (p.rateMs > 0) Thread.sleep(p.rateMs)
      private val rows = svc.page(p.offset, p.limit, p.total).iterator
      private var cur: (Long, String, String, Int) = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) cur = rows.next(); h }
      override def get(): InternalRow =
        InternalRow(cur._1, UTF8String.fromString(cur._2),
          UTF8String.fromString(cur._3), cur._4)
      override def close(): Unit = ()
    }
  }
}
