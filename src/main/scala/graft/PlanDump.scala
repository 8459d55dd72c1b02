package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: write one SparkEntry query's formatted physical plan to
  * a file (the optimization-round before/after artifact).
  * Usage: runMain graft.PlanDump <queryName> <outFile> [sfDir]
  * Plans are captured UNEXECUTED (`explain` on the lazy frame), so
  * AQE-final shapes still come from the bench/UI; this records the
  * static plan: join strategies, Exchange placement, PushedFilters,
  * ReadSchema, codegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.PlanDump <queryName>[,<queryName>...] <outFile|outDir> [sfDir]")
      sys.exit(2)
    }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val bad = names.filterNot(SparkEntry.queries.contains)
    if (bad.nonEmpty) {
      System.err.println(s"unknown queries: ${bad.mkString(", ")}")
      sys.exit(2)
    }
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names.foreach { name =>
      val path = if (names.length == 1 && !new java.io.File(out).isDirectory)
        out
      else { new java.io.File(out).mkdirs(); s"${out.stripSuffix("/")}/$name.txt" }
      // queryExecution is built inside a scope so operators that persist
      // during CONSTRUCTION (trained models collected at plan time) are
      // released; the plan string itself is pure driver-side.
      val plan = CacheScope.scoped {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        plan.getBytes("UTF-8"))
      println(s"PLAN $name -> $path")
    }
    spark.stop()
  }
}
