package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}
import graft.llm.Similarity

/** Dev-only scratch profiler for the vector near-dup plans (delete freely):
  * times signLshDupPairs and cosineDupPairs at several IVF cell counts. */
object ScratchLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.select(F.col("vec_id").as("id"),
      F.col("embedding").cast("array<double>").as("v"))
    val planes = Similarity.lshPlanes(8, 20, 64)
    val lsh = Similarity.signLshDupPairs(base, "id", "v", planes, 20, 0.9)
    time("lsh pairs warm-up") {
      lsh.write.format("noop").mode("overwrite").save()
    }
    time("lsh pairs") { lsh.write.format("noop").mode("overwrite").save() }
    val n = e.count()
    for (k <- args.drop(1).map(_.toLong)) {
      val centroids = e.filter(F.col("vec_id") < k).orderBy("vec_id")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toSeq).toSeq
      val ivf = Similarity.cosineDupPairs(e, "vec_id", "embedding", centroids,
        threshold = 0.45, nprobe = 2)
      time(s"ivf pairs k=$k (n=$n)") {
        ivf.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
