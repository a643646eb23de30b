package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's session hygiene (rounds 8-10 found the
  * in-session bench overstating heavy queries up to 3.7x vs isolated
  * runs purely through cross-query debris). Two properties:
  *
  *  1. [[Bench.resetSession]] actually restores a pre-query state:
  *     zero persistent RDDs (including localCheckpoint blocks, which
  *     `clearCache` alone never releases) and an empty SQL cache,
  *     even after a query that persists AND checkpoints.
  *  2. [[Bench.minStable]] resets BETWEEN runs (so the reported
  *     minimum never times a run executed under a previous run's
  *     debris) and fires its third run exactly when the first two
  *     disagree by >25% on a >=0.8 s query.
  */
class BenchHygieneSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = {
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("resetSession releases SQL-cached plans AND checkpoint blocks") {
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // one SQL-cache entry + one localCheckpoint (the block family
    // Dataset.unpersist misses) + a query that does both internally
    val cached = Tables.load(spark, sf, "nation").persist()
    cached.count()
    val ckpt = Tables.load(spark, sf, "region").localCheckpoint()
    ckpt.count()
    SparkEntry.queries("q139_setsim_join")(spark, sf).count()
    assert(sc.getPersistentRDDs.nonEmpty) // the fixture is live
    Bench.resetSession(spark)
    assert(sc.getPersistentRDDs.isEmpty,
      s"blocks survived resetSession: ${sc.getPersistentRDDs.keySet}")
    assert(spark.sharedState.cacheManager.isEmpty, "SQL cache not empty")
  }

  test("minStable resets between runs and samples heavies harder") {
    // fast query: 2 runs, 2 resets, min reported
    var resets = 0
    var i = 0
    val stable = Bench.minStable(
      () => { i += 1; Seq(0.10, 0.12)(i - 1) }, () => resets += 1)
    assert(stable == 0.10 && i == 2 && resets == 2)
    // the reset must fall BETWEEN the runs, not after both: assert
    // run 2 observes run 1's reset
    var order = List.empty[String]
    Bench.minStable(
      () => { order :+= "run"; 0.1 }, () => order :+= "reset")
    assert(order.take(3) == List("run", "reset", "run"))
    // >=0.8s query whose 2 inline draws disagree >25%: adaptive 3rd
    var j = 0
    val heavy = Bench.minStable(
      () => { j += 1; Seq(1.40, 0.90, 0.85)(j - 1) }, () => ())
    assert(heavy == 0.85 && j == 3)
    // 25% spread below the 0.8s floor: quantization noise, no re-run
    var k = 0
    val tiny = Bench.minStable(
      () => { k += 1; Seq(0.2, 0.4)(k - 1) }, () => ())
    assert(tiny == 0.2 && k == 2)
  }

  test("deferred pass re-draws exactly the >=0.8s queries and min-merges") {
    // the time-decorrelated second pass: a steal burst that blanketed
    // q_b's whole inline slot is corrected minutes later; q_a (fast)
    // is not re-run; a rerun that throws keeps the inline number
    var reruns = List.empty[String]
    var resets = 0
    val out = Bench.withDeferredPass(
      Seq("q_a" -> 0.3, "q_b" -> 11.6, "q_c" -> 2.0, "q_d" -> 1.5),
      rerun = {
        case "q_b" => reruns :+= "q_b"; 6.5  // burst over, honest wall
        case "q_c" => reruns :+= "q_c"; 2.4  // slower re-draw ignored
        case "q_d" => reruns :+= "q_d"; throw new RuntimeException("boom")
        case other => fail(s"unexpected rerun of $other")
      },
      reset = () => resets += 1)
    assert(out == Seq("q_a" -> 0.3, "q_b" -> 6.5, "q_c" -> 2.0, "q_d" -> 1.5))
    assert(reruns == List("q_b", "q_c", "q_d")) // suite order, no q_a
    assert(resets == 3) // reset after every re-draw, throwing included
  }
}
