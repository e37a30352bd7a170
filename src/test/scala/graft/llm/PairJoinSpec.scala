package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.{functions => F}

/** Plan shape of the shared pair-loop helper: a broadcastable build side
  * must yield a broadcast join whose probe side is hash-distributed across
  * the full cluster width — the property that keeps O(bucket²) comparison
  * loops off a single core when the input scan has few partitions. */
class PairJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val expectedPairs: Long = (1 to 64).groupBy(_ % 4).values
    .map(g => g.size.toLong * (g.size - 1) / 2).sum

  /** Runs the pair-loop under the given broadcast threshold and returns
    * (probePartitions, broadcastJoins, shuffleExchanges, pairCount) — all
    * materialized INSIDE the conf scope, since plans are evaluated lazily. */
  private def pairFacts(threshold: String): (Int, Int, Int, Long) = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    try {
      // coalesce(1) models the single-partition small-file scan that
      // caused the serialized pair loop at scale
      val base = (1 to 64).map(i => (i % 4, i.toLong)).toDF("blk", "id")
        .coalesce(1)
      val a = base.select(F.col("blk"), F.col("id").as("id_a"))
      val b = base.select(F.col("blk"), F.col("id").as("id_b"))
      val (probe, build) = PairJoin.sides(a, b, Seq(F.col("blk"), F.col("id_a")))
      val joined = probe.join(build, Seq("blk"))
        .filter(F.col("id_a") < F.col("id_b"))
      val plan = joined.queryExecution.executedPlan
      (probe.rdd.getNumPartitions,
        plan.collect { case j: BroadcastHashJoinExec => j }.size,
        plan.collect { case e: ShuffleExchangeExec => e }.size,
        joined.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  it should "broadcast the build side and spread the probe side to full width" in {
    val (probeParts, bhj, exchanges, pairs) = pairFacts("10MB")
    probeParts shouldBe spark.sparkContext.defaultParallelism
    bhj shouldBe 1
    // the probe repartition is the only exchange besides the broadcast one
    exchanges shouldBe 1
    pairs shouldBe expectedPairs
  }

  it should "pass both sides through unchanged when broadcast is disabled" in {
    val (probeParts, bhj, _, pairs) = pairFacts("-1")
    // no injected exchange on the probe side: the sort-merge join's own
    // key exchange provides per-bucket parallelism
    probeParts shouldBe 1
    bhj shouldBe 0
    pairs shouldBe expectedPairs
  }
}
