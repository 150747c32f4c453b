package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1: declarative data-contract audit (SURVEY.md §2.3) — the
  * "expectation suite" gate a pipeline runs before promoting a
  * snapshot: a set of named row-level predicates (not-null, range,
  * set-membership, regex, ...) plus referential checks against
  * dimension tables, evaluated over the WHOLE table and reported as
  * one row per expectation: (expectation, n_checked, n_failed,
  * fail_rate, pass).
  *
  * Scale shape: every row-level expectation compiles into a
  * `sum(when(violated, 1))` column of ONE aggregation — the audit
  * costs a single scan and a single 1-row partial-aggregated reduce
  * regardless of how many expectations it carries (adding a check is
  * free; it rides the same pass). Referential checks each cost one
  * left join against the DISTINCT dimension keys — dimension-sized
  * build sides, broadcast in practice — folded to counters in the
  * same style. Nothing row-sized ever reaches the driver.
  *
  * Violation semantics: a row violates a check when the predicate is
  * NOT satisfied — NULL predicate results count as violations (an
  * unknown is not a pass), which makes `x > 0` catch null x without a
  * separate not-null clause. Referential: a NULL foreign key fails
  * (it references nothing). An EMPTY table is NOT a pass: with
  * n_checked = 0 both `pass` and `fail_rate` are NULL (a gate keying
  * on `pass = 1` must therefore not promote an empty snapshot —
  * vacuous truth is reported as unknown, ADVICE_r13).
  */
object Expectations {

  /** Audit `df` against named row-level `checks` and `refChecks`
    * (name, foreign-key column, dimension frame, dimension key
    * column). Output ordered by expectation name.
    */
  def audit(df: DataFrame, checks: Seq[(String, Column)],
      refChecks: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || refChecks.nonEmpty, "empty expectation suite")
    val names = checks.map(_._1) ++ refChecks.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate expectation names in ${names.mkString(", ")}")

    val rowPart: Option[DataFrame] = if (checks.isEmpty) None else Some {
      val aggs = count(lit(1)).as("__n") +:
        checks.zipWithIndex.map { case ((_, c), i) =>
          sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(s"__f_$i")
        }
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(checks.zipWithIndex.map { case ((nm, _), i) =>
          struct(lit(nm).as("expectation"), col("__n").as("n_checked"),
            col(s"__f_$i").as("n_failed"))
        }: _*)).as("e"))
        .select("e.*")
    }
    val refParts = refChecks.map { case (nm, fk, dim, dk) =>
      df.select(col(fk).as("__fk"))
        .join(dim.select(col(dk).as("__fk")).distinct()
          .withColumn("__hit", lit(1)), Seq("__fk"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_failed"))
        .select(lit(nm).as("expectation"), col("n_checked"), col("n_failed"))
    }
    assembleAudit((rowPart.toSeq ++ refParts).reduce(_.unionAll(_)))
  }

  /** The config-sized audit tail: an (expectation, n_checked,
    * n_failed) frame — from the batch parts above, or from the
    * streaming twin's compacted per-key state snapshot (V1s) —
    * finished into the report columns. Shared verbatim between both
    * paths (the QualityCascade.assemble convention) so the
    * fail_rate/pass semantics, including the vacuous-pass-is-NULL
    * rule, cannot drift between batch and stream.
    */
  def assembleAudit(perExpectation: DataFrame): DataFrame =
    perExpectation
      .select(col("expectation"), col("n_checked"),
        coalesce(col("n_failed"), lit(0L)).as("n_failed"))
      .withColumn("fail_rate",
        when(col("n_checked") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_failed").cast("double") / col("n_checked"), 6)))
      .withColumn("pass",
        when(col("n_checked") === 0L, lit(null).cast("long"))
          .when(col("n_failed") === 0L, 1L).otherwise(0L))
      .orderBy("expectation")
}
