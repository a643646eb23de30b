package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PagedSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def read(total: Int, pageSize: Int) =
    spark.read.format("graft.sources.PagedSourceProvider")
      .option("total", total).option("pageSize", pageSize).load()

  test("row count and content match the API contract") {
    val df = read(total = 503, pageSize = 50)
    assert(df.count() == 503)
    val r = df.where("item_id = 7").collect()(0)
    assert(r.getString(1) == "track_7" && r.getString(2) == "jazz" &&
      r.getInt(3) == 7 * 37 % 101)
  }

  test("one input partition per page") {
    val df = read(total = 503, pageSize = 50)
    assert(df.rdd.getNumPartitions == 11) // ceil(503/50)
  }

  test("empty source -> zero pages, zero rows") {
    val df = read(total = 0, pageSize = 50)
    assert(df.count() == 0 && df.rdd.getNumPartitions == 0)
  }

  test("filters/projection still work through the connector") {
    import spark.implicits._
    val n = read(5000, 50).where($"category" === "ska").count()
    assert(n == 1000)
  }

  test("batched lookup: one batch per <= batchSize ids, values deterministic") {
    import spark.implicits._
    val ids = (0L until 120L).toDF("doc_id").repartition(2)
    val out = graft.sources.BatchedLookup.features(ids, "doc_id", batchSize = 50)
    assert(out.count() == 120)
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(3L) == (3L * 2654435761L % 1000) / 10.0)
  }
}
