package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out helpers: skew-salted joins and bucketed co-located joins.
  * These are the knobs a 100 TB deployment turns when AQE's automatic
  * handling isn't enough (extreme single-key skew; repeated joins on
  * the same key across jobs).
  */
object Scale {

  /** Skew-salted equi-join: replicate the (small) right side `salt`
    * ways and scatter left rows uniformly across the replicas, so one
    * hot key spreads over `salt` reducers instead of one.
    *
    * Semantics-preserving for inner/left joins on `leftKey === rightKey`
    * (each left row meets exactly one replica of its key's right rows).
    * Use when a single key dominates (AQE skew-join splits partitions,
    * but cannot split ONE giant key-group within a sort-merge join).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(leftKey != rightKey,
      "alias the join keys to distinct names (like AsOf.join)")
    val saltedLeft = left.withColumn("__salt_l",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(salt.toLong)))
    val saltedRight = right.withColumn("__salt_r",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(saltedRight,
        col(leftKey) === col(rightKey) && col("__salt_l") === col("__salt_r"),
        joinType)
      .drop("__salt_l", "__salt_r")
  }

  /** Write a frame as a bucketed+sorted managed table: repeated joins
    * and aggregations on `key` then need NO exchange (the scan's
    * outputPartitioning already satisfies the join's distribution).
    *
    * Pre-partitioned by the bucket function before the write: a
    * bucketed writer otherwise emits one file per (write task x
    * bucket), and probe/scan latency tracks file count before
    * anything else (GateProbe escurve). repartition's
    * HashPartitioning computes the exact pmod(murmur3, n) bucket id,
    * so each task holds one bucket and the table carries <= buckets
    * files (same device as the streaming SegStore's writeBucketed).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Write hive-style partitioned parquet: predicates on the partition
    * column prune whole directories at planning time (`PartitionFilters`
    * in the scan) — the first line of defense at 100 TB, where date/
    * category partitioning turns full scans into targeted reads.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
