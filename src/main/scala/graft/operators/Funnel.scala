package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A27: strict staged funnel — how many entities completed stage k
  * AFTER completing stage k-1 (first qualifying occurrence each time).
  * The per-stage frame carries (id, first-completion time); stage k+1
  * filters its events to those strictly after the entity's stage-k
  * time, so out-of-order occurrences never count (a purchase before
  * the click does not convert).
  *
  * Scale shape: every stage is one filter + one equi-join + one
  * groupBy, all keyed on the entity id — the same hash partitioning
  * reused K times, no windows over unbounded groups, no driver state.
  */
object Funnel {

  /** Per-stage completion counts for the ordered `stages` of
    * `typeCol` values. Output: (stage label "a>b>...", n_entities),
    * one row per prefix of the funnel.
    */
  def strict(df: DataFrame, idCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = df.select(col(idCol).as("__id"), col(typeCol).as("__ty"),
      col(tsCol).cast("timestamp").as("__ts"))
    val first = e.filter(col("__ty") === stages.head)
      .groupBy(col("__id")).agg(min(col("__ts")).as("__t"))
    val (reached, _) = stages.tail.foldLeft((Seq(first), stages.head)) {
      case ((acc, _), stage) =>
        val next = e.filter(col("__ty") === stage)
          .join(acc.last.select(col("__id"), col("__t").as("__prev")), "__id")
          .filter(col("__ts") > col("__prev"))
          .groupBy(col("__id")).agg(min(col("__ts")).as("__t"))
        (acc :+ next, stage)
    }
    val labels = stages.inits.toSeq.reverse.drop(1).map(_.mkString(">"))
    reached.zip(labels).zipWithIndex.map { case ((stageDf, label), i) =>
      // global agg, not groupBy: an empty stage must still emit its
      // zero row (the funnel report always has one row per prefix)
      stageDf.agg(count(lit(1)).as("n_entities"))
        .select(lit(label).as("stage"), lit(i.toLong + 1L).as("depth"),
          col("n_entities"))
    }.reduce(_.unionByName(_))
  }
}
