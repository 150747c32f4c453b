package graft.sources

import graft.SparkSuite

class PartitionedTablesSpec extends SparkSuite {

  test("partition-column filter prunes at planning time") {
    val dir = "/root/testdata/sf0.001"
    val path = "/tmp/graft-partitioned-events"
    val events = Tables.load(spark, dir, "events")
    PartitionedTables.write(events, path, "event_type")

    val pruned = PartitionedTables.readPartition(
      spark, path, "event_type", "click")
    val n = pruned.count()
    assert(n == events.filter("event_type = 'click'").count() && n > 0)

    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pf.contains("event_type"),
      s"partition filter not applied at scan:\n$plan")
  }
}
