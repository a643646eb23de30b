package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan and wall time of one
  * named SparkEntry query. Usage: runMain graft.tools.Explain <name> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Production GraftExtensions install (parser + strategy + SQL
    // functions) by DEFAULT — q111 needs the injected parser, and the
    // driver's Verify/Bench sessions install it too. Set
    // SPARK_GRAFT_EXTENSIONS=0 to inspect stock-session plans.
    val spark = (if (sys.env.get("SPARK_GRAFT_EXTENSIONS").contains("0"))
      builder else builder.withExtensions(new graft.GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val mode = if (args.length > 2) args(2) else "formatted"
    if (mode == "codegen") spark.conf.set("spark.sql.adaptive.enabled", "false")
    fn(spark, sfDir).explain(mode)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
