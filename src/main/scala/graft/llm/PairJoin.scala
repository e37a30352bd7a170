package graft.llm

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/**
 * Shared plan-shaping for blocked self-join pair loops (exact Jaccard
 * pairs, cell-bucketed cosine pairs): when the build side's optimizer size
 * estimate fits the broadcast threshold, broadcast it explicitly and hash
 * the probe side across the full cluster width. Without this, the probe
 * side of a broadcast join inherits the file scan's partitioning — ONE
 * partition for a small-file corpus — and the entire O(bucket²) comparison
 * loop serializes through a single core while the rest of the cluster
 * idles (a 10x scale probe measured one task pinned for minutes on 32
 * cores). Hashing by (bucket keys + probe id) spreads each bucket's pair
 * loop over every core; exactness is untouched because the broadcast build
 * side is replicated to all tasks.
 *
 * When the build side cannot broadcast, the inputs are returned unchanged:
 * the sort-merge join's own key exchange already provides per-bucket
 * parallelism, and a full-width probe shuffle would just be re-shuffled
 * back onto the join keys.
 */
private[llm] object PairJoin {

  /** Returns `(probeSide, buildSide)` ready for `probe.join(build, keys)`. */
  def sides(a: DataFrame, b: DataFrame,
            probeKeys: Seq[Column]): (DataFrame, DataFrame) = {
    val cap = a.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val buildFits = cap > 0 &&
      b.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(cap)
    if (buildFits)
      (a.repartition(a.sparkSession.sparkContext.defaultParallelism,
        probeKeys: _*), F.broadcast(b))
    else (a, b)
  }
}
