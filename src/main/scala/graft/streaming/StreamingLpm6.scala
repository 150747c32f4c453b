package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Ip6Expressions
import graft.operators.Lpm

/** R26s v6: IPv6 longest-prefix-match enrichment of a LIVE stream with
  * ZERO streaming state — [[StreamingLpm]]'s shape over 16-byte
  * addresses. The static side pre-groups [[Lpm.expandedIndex6]] into
  * one candidate-array row per anchor key; each stream row does one
  * broadcast left equi-join on its anchor key (the top `anchor` bits
  * of the hi long) and resolves the winner IN-ROW: `filter()` with the
  * shared (hi, lo) shift-compare containment predicate
  * ([[Lpm.contains6Sql]]), then `array_sort` by descending prefix
  * length over the handful of surviving candidates.
  *
  * Parity contract (spec-pinned): row-for-row equal to the batch
  * [[Lpm.lpmEnrich6]] on the same inputs, including unmatched-NULL
  * semantics for both unrouted and unparseable hosts.
  */
object StreamingLpm6 {

  def enrich(stream: DataFrame, hostCol: String, blocks: DataFrame,
      cidrCol: String, anchor: Int = 40): DataFrame = {
    val attrs = blocks.columns.filter(_ != cidrCol).toSeq
    val blkStruct = struct(
      (col("__len") +: col("__bhi") +: col("__blo") +:
        col(cidrCol).as("matched_cidr") +: attrs.map(a => col(a))): _*)
    val idx = Lpm.expandedIndex6(blocks, cidrCol, anchor)
      .groupBy("__ak")
      .agg(collect_list(blkStruct).as("__blks"))
    val matches = expr("filter(__blks, b -> " +
      Lpm.contains6Sql("__hhi", "__hlo", "b.__len", "b.__bhi", "b.__blo") + ")")
    val best = expr("element_at(array_sort(__matches, " +
      "(a, b) -> CAST(b.__len - a.__len AS INT)), 1)")
    // an unparseable host has a NULL __hb: its NULL __ak never
    // equi-joins, __blks stays NULL, and every enrichment column
    // propagates NULL — exactly the batch left-join contract
    val out = stream
      .withColumn("__hb", Ip6Expressions.ip6ToBytes(col(hostCol)))
      .withColumn("__hhi", Lpm.be64(substring(col("__hb"), 1, 8)))
      .withColumn("__hlo", Lpm.be64(substring(col("__hb"), 9, 8)))
      .withColumn("__ak", expr(s"shiftrightunsigned(__hhi, ${64 - anchor})"))
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
