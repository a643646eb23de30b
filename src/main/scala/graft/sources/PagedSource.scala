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
  * The remote API is simulated by [[FakeApi]] — a deterministic
  * in-process endpoint (zero-egress container) producing the same page
  * payloads for the same (offset, limit) forever; swap it for an HTTP
  * client and nothing else changes.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PagedSourceProvider")
  *   .option("total", 5000).option("pageSize", 50).load()
  * }}}
  */
class PagedSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeApi.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

/** Deterministic in-process stand-in for the remote paginated API. */
object FakeApi {
  val schema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("popularity", IntegerType, nullable = false)))

  private val categories = Array("rock", "pop", "jazz", "folk", "ska")

  /** The reference probes total with a limit=1 request
    * (spotify_client.py:527-529); here the "server" reports it.
    */
  def probeTotal(configuredTotal: Int): Int = configuredTotal

  /** One page of results; empty past the end (the loop-until-empty
    * contract — the reference does not trust `total`, README.md:148-149).
    */
  def page(offset: Int, limit: Int, total: Int): Seq[(Long, String, String, Int)] =
    (offset until math.min(offset + limit, total)).map { i =>
      (i.toLong, s"track_$i", categories(i % categories.length), i * 37 % 101)
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
  override def build(): Scan = new PagedScan(
    total = options.getInt("total", 1000),
    pageSize = options.getInt("pageSize", 50),
    rateMs = options.getLong("ratePerPartitionMs", 0L))
}

class PagedScan(total: Int, pageSize: Int, rateMs: Long) extends Scan with Batch {
  override def readSchema(): StructType = FakeApi.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedScan(total=$total, pageSize=$pageSize, rateMs=$rateMs)"

  override def planInputPartitions(): Array[InputPartition] = {
    // planning-time probe (the limit=1 total request)
    val probed = FakeApi.probeTotal(total)
    val nPages = (probed + pageSize - 1) / pageSize
    (0 until nPages).map(p => PagePartition(p * pageSize, pageSize, probed, rateMs)
      : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = PagedReaderFactory
}

case class PagePartition(offset: Int, limit: Int, total: Int, rateMs: Long)
  extends InputPartition

/** Batched point-lookup against the API (reference S6: audio-features
  * fetched in chunks of <= 50 track ids per call,
  * spotify_client.py:431-467). mapPartitions + grouped(batchSize) keeps
  * the request count at ceil(n/batch) per partition — the distributed
  * generalization of the reference's sequential chunking — while the
  * ids stay distributed (no driver collect).
  */
object BatchedLookup {
  import org.apache.spark.sql.{DataFrame, Encoders}

  /** Deterministic fake feature endpoint: one "call" per id batch. */
  def featureBatch(ids: Seq[Long]): Seq[(Long, Double)] =
    ids.map(id => id -> (id * 2654435761L % 1000) / 10.0)

  def features(df: DataFrame, idCol: String, batchSize: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol).as[Long]
      .mapPartitions(_.grouped(batchSize).flatMap(b => featureBatch(b.toSeq)))
      .toDF("id", "feature")
  }
}

object PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // per-partition rate limit before the page "request"
      if (p.rateMs > 0) Thread.sleep(p.rateMs)
      private val rows = FakeApi.page(p.offset, p.limit, p.total).iterator
      private var cur: (Long, String, String, Int) = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) cur = rows.next(); h }
      override def get(): InternalRow =
        InternalRow(cur._1, UTF8String.fromString(cur._2),
          UTF8String.fromString(cur._3), cur._4)
      override def close(): Unit = ()
    }
  }
}
