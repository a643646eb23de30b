package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 optimization pins: the codegen kernels that replaced
  * interpreted HOF chains in query hot paths (guide §4) must be
  * BIT-IDENTICAL to the SQL expressions they replaced — these tests
  * evaluate both side by side in one Spark session over adversarial
  * inputs (negative values, Long-overflow magnitudes, multi-byte
  * UTF-8) so a semantic drift in either the kernel or a future Spark
  * upgrade of the SQL builtins fails loudly.
  */
class KernelEqualitySpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dot_i64 equals the aggregate(zip_with(...)) HOF fold it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // q148-contract magnitudes only (|x| <= 1e6 quantized, 64 dims —
    // the overflow-freedom bound documented at Similarity.quantized
    // and pinned in SimilaritySpec): under Spark 4's default ANSI
    // mode the HOF's Long multiply THROWS on overflow while the
    // kernel wraps, so out-of-contract magnitudes are not an
    // equivalence domain — inputs violating the bound fail loudly in
    // SimilaritySpec before either path runs
    def vec(scale: Long) = Array.fill(64)(
      (rnd.nextLong() % scale) * (if (rnd.nextBoolean()) 1 else -1))
    val rows = (1 to 200).map(_ => (vec(1000000L), vec(1000000L)))
    val df = rows.toDF("a", "b")
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, d) -> acc + d)"))
      .withColumn("kern", graft.functions.GraftFunctions.dot_i64($"a", $"b"))
    assert(df.where($"hof" =!= $"kern").isEmpty,
      df.where($"hof" =!= $"kern").collect().take(3).mkString("\n"))
  }

  test("l2sq_i64 equals the per-centroid aggregate(zip_with(...)) fold it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(
      (rnd.nextLong() % 1000000L) * (if (rnd.nextBoolean()) 1 else -1))
    val cent = vec()
    val df = (1 to 200).map(_ => Tuple1(vec())).toDF("q")
      .withColumn("hof", expr(
        s"aggregate(zip_with(q, array(${cent.mkString("L,")}L), " +
          "(x, y) -> (x - y) * (x - y)), 0L, (acc, d) -> acc + d)"))
      .withColumn("kern", graft.functions.GraftFunctions.l2sq_i64($"q", cent))
    assert(df.where($"hof" =!= $"kern").isEmpty,
      df.where($"hof" =!= $"kern").collect().take(3).mkString("\n"))
  }

  test("poly31_bucket equals the per-character SQL fold it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ascii = (1 to 150).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    // multi-byte UTF-8: ascii('é') reads the lead byte — the kernel
    // must agree on 2-, 3- and 4-byte code points too
    val uni = Seq("héllo wörld", "naïve café", "日本語 テスト", "emoji 🙂 pair",
      "mixed ascii ünd 中文", "ß", "𝔘𝔫𝔦", "a", " ")
    val df = (ascii ++ uni).toDF("f")
      .withColumn("sql", expr(
        "aggregate(sequence(1, length(f)), 0L," +
          " (h, i) -> (h * 31 + ascii(substring(f, i, 1))) % 1000003) % 256"))
      .withColumn("kern",
        graft.functions.GraftFunctions.poly31_bucket($"f", 1000003L, 256))
    assert(df.where($"sql" =!= $"kern").isEmpty,
      df.where($"sql" =!= $"kern").select("f", "sql", "kern")
        .collect().take(5).mkString("\n"))
  }
}
