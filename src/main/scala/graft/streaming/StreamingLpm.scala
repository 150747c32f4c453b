package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions
import graft.operators.Lpm

/** R26s: longest-prefix-match enrichment of a LIVE stream against a
  * static CIDR table with ZERO streaming state — the serving shape of
  * the ER3/S8/M7s family: everything per-row, nothing remembered
  * across micro-batches, so there is no watermark to tune and no
  * state store to size.
  *
  * The batch [[Lpm.lpmEnrich]] plan scores DISTINCT host numbers
  * first — on a stream that distinct would BE state. Instead the
  * static side pre-groups its anchor-key expansion
  * ([[Lpm.expandedIndex]]) into one candidate-array row per anchor
  * key (`collect_list` on the STATIC side only — the bounded-fanout
  * inversion M7s/ER3 use); each stream row then does one broadcast
  * left equi-join on its anchor key and resolves the winner IN-ROW:
  * `filter()` for real containment (one shift-equal per candidate),
  * `array_sort` by descending prefix length (at most anchor-to-32
  * candidates per key — a routing table has one block per length at
  * most for a given host, so the sort is over a handful of structs).
  *
  * Parity contract (spec-pinned): row-for-row equal to the batch
  * operator on the same inputs, including unmatched-NULL semantics.
  */
object StreamingLpm {

  def enrich(stream: DataFrame, hostCol: String, blocks: DataFrame,
      cidrCol: String, anchor: Int = 16): DataFrame = {
    val attrs = blocks.columns.filter(_ != cidrCol).toSeq
    val blkStruct = struct(
      (col("__len") +: col("__base") +: col(cidrCol).as("matched_cidr") +:
        attrs.map(a => col(a))): _*)
    val idx = Lpm.expandedIndex(blocks, cidrCol, anchor)
      .groupBy("__ak")
      .agg(collect_list(blkStruct).as("__blks"))
    val matches = expr(s"filter(__blks, b -> shiftright(__hn, 32 - b.__len)" +
      " = shiftright(b.__base, 32 - b.__len))")
    // descending prefix length; lengths are unique per host (cidr
    // uniqueness contract), so the comparator is total for the rows
    // that matter
    val best = expr("element_at(array_sort(__matches, " +
      "(a, b) -> CAST(b.__len - a.__len AS INT)), 1)")
    // a host with no indexed anchor key keeps __blks NULL: filter and
    // size propagate it, the when() stays NULL, every output attr is
    // NULL — exactly the batch left-join contract
    val out = stream
      .withColumn("__hn", IpFunctions.ip4ToNum(col(hostCol)))
      .withColumn("__ak", expr(s"shiftright(__hn, ${32 - anchor})"))
      .join(broadcast(idx), Seq("__ak"), "left")
      .withColumn("__matches", matches)
      .withColumn("__best",
        when(size(col("__matches")) > 0, best))
    out.select(
      (stream.columns.map(col) :+
        col("__best.matched_cidr").as("matched_cidr") :+
        col("__best.__len").as("matched_len")) ++
        attrs.map(a => col(s"__best.$a").as(a)): _*)
  }
}
