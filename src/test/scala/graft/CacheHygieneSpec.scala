package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the drop-on-return cache policy (round-9 ADVICE #5) for the
  * WHOLE query surface: after any `SparkEntry.queries` entry returns
  * and its result is consumed, the only block-holding RDD allowed to
  * remain is the query's own sealed output (the `dropAfter`
  * checkpoint — at most ONE persistent RDD). Queries that return a
  * plain lazy plan leave zero. Anything else is a leak: an embedding
  * application calling that query in a loop would accumulate dead
  * cache blocks per call, exactly the failure mode the policy exists
  * to prevent.
  *
  * The sweep between queries mirrors what a caller must do with the
  * sealed output once consumed (`localCheckpoint` blocks are not in
  * the SQL cache manager, so only an RDD-level unpersist releases
  * them); the assertion is on what a query leaves BEYOND that.
  */
class CacheHygieneSpec extends AnyFunSuite {
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

  test("every query releases its caches on return (only the output's own blocks remain)") {
    val sc = spark.sparkContext
    // start clean: earlier suites in the same JVM may have left blocks
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val leaks = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val before = sc.getPersistentRDDs.keySet
        val df = fn(spark, sf)
        df.count() // consume: lazy plans run their internal persists here
        // blocks the RETURNED plan itself is backed by (the dropAfter
        // seal, or a checkpoint the lazy output legitimately reads)
        // are the caller's to release — everything else is a leak
        val outIds = df.queryExecution.logical.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
        }.toSet
        val leaked = sc.getPersistentRDDs.keySet -- before -- outIds
        // sweep so query N's residue never hides query N+1's leak
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id)) rdd.unpersist(blocking = false)
        }
        if (leaked.nonEmpty) Some(name -> leaked.size) else None
    }
    assert(leaks.isEmpty,
      s"queries holding blocks beyond their own output: ${leaks.mkString(", ")}")
  }
}
