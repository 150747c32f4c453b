package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** A55: session path analysis — the exploratory complement of the
    * funnel (the funnel counts a KNOWN sequence; this surfaces which
    * sequences actually happen): gap-sessionize per entity (the A6
    * kernel: a new session when the gap exceeds `gapSeconds`), order
    * each session's events by (ts, event id), and count every
    * CONSECUTIVE event-type trigram — per occurrence (`n_occ`) and
    * per containing session (`n_sessions`).
    *
    * Determinism: the in-session order is total ((ts, id) — ids are
    * unique), the sequence materializes via sort_array over collected
    * (ts, id, type) structs (order independent of partitioning), and
    * session membership counts through a '#'-joined key so both
    * engines deduplicate identical values.
    *
    * Scale shape: one keyed window (per entity) for session ids, one
    * groupBy per (entity, session) — session arrays are bounded by
    * session length, never by history — then a path-keyed count.
    */
  /** The A6 gap-session kernel shared by [[pathTrigrams]] and
    * [[basketPairs]]: rows annotated with (__uid, __us, __ty, __eid,
    * __sess).
    */
  private def sessionized(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, eventIdCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"invalid gap=$gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val w = Window.partitionBy(col("__uid")).orderBy(col("__us"), col("__eid"))
    df.select(col(idCol).as("__uid"),
        unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__ty"), col(eventIdCol).as("__eid"))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def pathTrigrams(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, eventIdCol: String, gapSeconds: Long): DataFrame = {
    val e = sessionized(df, idCol, tsCol, typeCol, eventIdCol, gapSeconds)
    e.groupBy(col("__uid"), col("__sess"))
      .agg(sort_array(collect_list(
        struct(col("__us"), col("__eid"), col("__ty")))).as("__evs"))
      .select(col("__uid"), col("__sess"),
        expr("transform(__evs, x -> x.__ty)").as("__tys"))
      .filter(size(col("__tys")) >= 3)
      .select(col("__uid"), col("__sess"),
        explode(expr(
          """transform(sequence(1, size(__tys) - 2),
            |  i -> concat_ws('>', element_at(__tys, i),
            |    element_at(__tys, i + 1), element_at(__tys, i + 2)))"""
            .stripMargin)).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(concat_ws("#", col("__uid"), col("__sess")))
          .as("n_sessions"))
  }

  /** A59: session basket analysis — support and LIFT for event-type
    * PAIRS co-occurring in a session (association mining over the
    * enumerable type vocabulary):
    *
    *   lift(a,b) = P(a,b) / (P(a)·P(b)) = N·n_ab / (n_a·n_b)
    *
    * computed as one integer product per side and ONE IEEE division
    * (round-6 display). n_* are SESSION counts (distinct presence, not
    * event counts).
    *
    * Scale shape: sessions reduce to distinct (session, type) rows;
    * the pair join is within-session with fanout bounded by the TYPE
    * vocabulary squared (never by session length — presence is
    * distinct-ed first); per-type counts broadcast back.
    */
  def basketPairs(df: DataFrame, idCol: String, tsCol: String,
      typeCol: String, eventIdCol: String, gapSeconds: Long): DataFrame = {
    val st = sessionized(df, idCol, tsCol, typeCol, eventIdCol, gapSeconds)
      .select(concat_ws("#", col("__uid"), col("__sess")).as("__sid"),
        col("__ty"))
      .distinct()
    val totals = st.agg(countDistinct(col("__sid")).as("__n_sessions"))
    val perType = st.groupBy(col("__ty")).agg(count(lit(1)).as("__n"))
    val pairs = st.as("x").join(st.as("y"), "__sid")
      .filter(col("x.__ty") < col("y.__ty"))
      .groupBy(col("x.__ty").as("type_a"), col("y.__ty").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(perType.select(col("__ty").as("type_a"),
        col("__n").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("__ty").as("type_b"),
        col("__n").as("n_b"))), "type_b")
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("__n_sessions").as("n_sessions"),
        round((col("__n_sessions") * col("n_ab")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }
}
