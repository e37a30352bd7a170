package graft
import org.apache.spark.sql.SparkSession

/** Throwaway probe: can Spark 4 read the ns-timestamp events parquet? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    println("spark version: " + spark.version)
    spark.stop()
  }
}
