package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named registry queries to
  * files — the before/after plan evidence for optimization rounds
  * (plans/rNN/<query>_{before,after}.txt). Not part of the driver
  * contract. Args: <sfDir> <outDir> <suffix> <query,query,...>. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, qlist) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // SPARK_GRAFT_PLANDUMP_EXEC=1: run the query through the noop sink
    // first so AQE's FINAL plan (with runtime stage reuse / join rewrites)
    // is what gets printed, not the initial one.
    val exec = sys.env.get("SPARK_GRAFT_PLANDUMP_EXEC").contains("1")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n"))
      val df = fn(spark, sfDir)
      // collect() (not a noop write) so THIS df's queryExecution is the
      // one that runs — a write spawns a fresh QueryExecution and the
      // printed plan would stay isFinalPlan=false. Registry results are
      // driver-small by contract.
      if (exec) { df.collect(): Unit }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
