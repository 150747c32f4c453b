package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics WITHOUT a per-group sort — the
  * bucket-offset distributed rank device already proven by
  * TextAnalysis.vocabulary and Sampling.deterministicShuffle, applied
  * to quantile selection.
  *
  * Why: a `row_number().over(partitionBy(g).orderBy(v))` window sorts
  * an ENTIRE group in one task. That is spillable (disk, not OOM) but
  * a billion-row hot group at 100 TB is a one-task straggler on a
  * skewed shuffle key. Here the group's value range splits into
  * `buckets` order-preserving range buckets:
  *
  *   1. per-group (min, max, count) — one tiny aggregate,
  *   2. per-(group, bucket) histogram — one bounded aggregate,
  *   3. exclusive running offsets over the histogram — a window over
  *      at most `buckets` rows per group,
  *   4. the k-th element's bucket located arithmetically
  *      (off < k <= off + c), and only THAT bucket's rows ranked by a
  *      (group, bucket)-keyed window — each sort is ~n/buckets rows.
  *
  * Equal values always land in the same bucket (the bucket is a
  * monotonic function of the value), so bucket-local rank + offset IS
  * the global rank and ties cannot straddle a boundary. The selected
  * element is identical to the sort-window formulation's, so existing
  * oracles keep passing unchanged.
  *
  * Degenerate distributions (one value dominating a group) put the
  * mass in one bucket; its sort is still bounded by that value's
  * multiplicity, and a second bucketing level would apply the same
  * device recursively if a deployment ever needed it.
  *
  * Contract: null values are excluded from the population; infinite /
  * NaN values must be normalized out by the caller (they would poison
  * the min/max range split).
  */
object RankSelect {

  /** One row per group: `groupCol` plus one double column per entry of
    * `quantiles` — (output name, num, den) selects the element with
    * rank ceil(num * n / den), 1-based (the smallest rank r with
    * r * den >= num * n — the same integer rank selection as
    * Baseline's p95, so no float boundary exists anywhere). A zero
    * `num` clamps to rank 1, the group minimum (ceil gives rank 0,
    * which selects no element).
    *
    * `broadcastGroups`: the per-group stats/targets tables carry ONE
    * row per group (per group x quantile for targets), and the default
    * broadcasts them — right when groups are an enumerable dimension
    * (event types, networks). A HIGH-CARDINALITY group key (user ids,
    * URLs) makes those tables data-sized: set `broadcastGroups=false`
    * and the same plan runs the lookups as shuffled joins — identical
    * results, no driver-sized collect anywhere.
    */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Long, Long)], buckets: Int = 1024,
      countCol: Option[String] = None,
      broadcastGroups: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, num, den) =>
      num >= 0 && den > 0 && num <= den }, s"invalid quantile spec: $qs")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val bcast: DataFrame => DataFrame =
      if (broadcastGroups) broadcast else identity
    val g = col(groupCol)
    val v = col(valueCol)
    val base = df.select(g, v).filter(v.isNotNull)

    // (1) per-group range + population: one row per group, broadcast
    val stats = base.groupBy(g).agg(
      min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("__n"))

    // (2) order-preserving range bucket: floor((v-lo)/(hi-lo)*buckets)
    // clamped to [0, buckets-1]. Monotonic in v, so equal values share
    // a bucket and bucket boundaries respect the value order.
    val keyed = base.join(bcast(stats), groupCol)
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((v - col("__lo")) / (col("__hi") - col("__lo")) * buckets))
            .cast("int")))
      .select(g, v, col("__b"))

    // (3) per-(group, bucket) histogram + exclusive running offsets —
    // the only unkeyed-by-bucket window, over <= `buckets` rows/group
    val hist = keyed.groupBy(g, col("__b")).agg(count(lit(1)).as("__c"))
    val off = hist.withColumn("__off",
      coalesce(sum(col("__c")).over(Window.partitionBy(g).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    // (4) locate each target rank's bucket arithmetically
    val qArr = array(qs.map { case (name, num, den) =>
      struct(lit(name).as("name"),
        expr(s"greatest(1L, ($num * __n + $den - 1) DIV $den)").as("k"))
    }: _*)
    val targets = off.join(bcast(stats.select(g, col("__n"))), groupCol)
      .select(g, col("__b"), col("__off"), col("__c"), explode(qArr).as("__q"))
      .filter(col("__off") < col("__q.k") && col("__q.k") <= col("__off") + col("__c"))
      .select(g, col("__b"), col("__q.name").as("__name"),
        (col("__q.k") - col("__off")).as("__r"))

    // (5) rank ONLY the target buckets' rows; local rank + offset is
    // the global rank, and the window is (group, bucket, name)-keyed
    val picked = keyed.join(bcast(targets), Seq(groupCol, "__b"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g, col("__b"), col("__name")).orderBy(v)))
      .filter(col("__rn") === col("__r"))

    val aggs: Seq[Column] = qs.map { case (name, _, _) =>
      min(when(col("__name") === name, v)).as(name)
    }
    val res = picked.groupBy(g).agg(aggs.head, aggs.tail: _*)
    // optional population column (the non-null count backing the
    // ranks) — joined from the already-aggregated stats, group-sized
    countCol.fold(res)(c =>
      res.join(bcast(stats.select(g, col("__n").as(c))), groupCol))
  }
}
