package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift audits between two corpus snapshots (SURVEY.md
  * §2.3) — the statistical complement to Snapshot.diff: row-level diff
  * says WHICH documents changed; these say whether the DISTRIBUTION a
  * model trains on moved. A pipeline runs them per source/group before
  * promoting a snapshot, and between the batch profile and a live
  * stream (the A50s histogram emits exactly the state [[psi]] bins).
  *
  *   - [[ksStatistic]]: exact two-sample Kolmogorov-Smirnov distance,
  *     ALL-INTEGER — D = max_x |F_a(x) - F_b(x)| is computed as
  *     max |cum_a * n_b - cum_b * n_a| over the merged value ladder,
  *     so both engines agree bit-for-bit with no float CDF anywhere
  *     (the only float is one final IEEE division, exact on both).
  *   - [[psi]]: population stability index over equi-width bins FIXED
  *     by the reference side's [min, max] (current-side outliers clamp
  *     into the edge bins — by construction of fixed bins, not data
  *     loss), with additive alpha-smoothing so empty bins stay finite.
  *     Per-bin counts are integer-exact; the PSI value itself sums ln
  *     terms, so it is emitted rounded to 6 decimals — the documented
  *     float-boundary discipline (Shared.moneySum) for a sum whose
  *     cross-engine wobble is bounded far below the rounding grid.
  *
  * Scale shape (both): one groupBy(group, value-or-bin) partial
  * aggregate per side (map-side combinable — the shuffle carries
  * per-value/per-bin counts, never rows), one (group)-keyed full-outer
  * merge, windows partitioned by group over the count ladder. No
  * all-pairs term, no driver state; the group's ladder length bounds
  * the window (distinct values for KS, nBins for PSI).
  */
object Drift {

  /** Per-group exact two-sample KS: returns (group, n_a, n_b, d_num,
    * ks) where ks = d_num / (n_a * n_b) and d_num is the integer
    * max |cum_a * n_b - cum_b * n_a|. Long arithmetic is exact while
    * n_a * n_b < 2^63 (~3e9 rows per side per group); past that the
    * same plan runs with the three product columns cast to
    * decimal(38,0) — documented upgrade path, not a silent overflow
    * (Spark raises on long overflow under ANSI; the gate data is far
    * inside the bound either way).
    */
  def ksStatistic(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val g = col(groupCol)
    def sideCounts(df: DataFrame, cName: String) =
      df.select(g, col(valueCol).as("__v")).filter(col("__v").isNotNull)
        .groupBy(g, col("__v")).agg(count(lit(1)).as(cName))
    ksLadder(sideCounts(a, "__ca")
      .join(sideCounts(b, "__cb"), Seq(groupCol, "__v"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb")), groupCol)
  }

  /** [[ksStatistic]] when both snapshots live in ONE frame separated
    * by a boolean (snapshot-id, time-half, parity…): a single scan and
    * a single (group, value) shuffle build both ladders as conditional
    * counts — half the IO of the two-frame form, same result. This is
    * the common monitoring shape ("this week vs last week of the same
    * table"), so it gets the fused plan.
    */
  def ksStatisticSplit(df: DataFrame, sideA: Column, groupCol: String,
      valueCol: String): DataFrame = {
    val g = col(groupCol)
    ksLadder(
      df.select(g, col(valueCol).as("__v"), sideA.as("__sa"))
        .filter(col("__v").isNotNull)
        .groupBy(g, col("__v"))
        .agg(
          sum(when(col("__sa"), 1L).otherwise(0L)).as("__ca"),
          sum(when(!col("__sa"), 1L).otherwise(0L)).as("__cb")),
      groupCol)
  }

  /** Shared KS tail over a merged (group, __v, __ca, __cb) ladder. */
  private def ksLadder(merged: DataFrame, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val ladder = Window.partitionBy(g).orderBy(col("__v"))
    val whole = Window.partitionBy(g)
    merged
      .withColumn("__cuma", sum(col("__ca")).over(ladder))
      .withColumn("__cumb", sum(col("__cb")).over(ladder))
      .withColumn("n_a", sum(col("__ca")).over(whole))
      .withColumn("n_b", sum(col("__cb")).over(whole))
      .groupBy(g)
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        max(abs(col("__cuma") * col("n_b") - col("__cumb") * col("n_a")))
          .as("d_num"))
      .withColumn("ks",
        col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
  }

  /** Binned two-sample KS over reference-range equi-width bins — the
    * scale-friendly variant: the exact KS ladder ([[ksStatistic]])
    * grows with the DISTINCT VALUES per group, which on a continuous
    * column is the row count; binning caps the ladder at nBins rows
    * per group forever (the price: D is computed on the binned CDFs —
    * a lower bound on the exact D, off by at most the bin mass). Same
    * all-integer cross-multiplication, so the gate hash-checks it.
    * This is also the form a STREAM can maintain (bounded bin-count
    * state — StreamingDrift.ksVsReference shares the definitions).
    */
  def ksBinnedSplit(df: DataFrame, refSide: Column, groupCol: String,
      valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins=$nBins")
    val g = col(groupCol)
    val rows = df.select(g, col(valueCol).as("__v"), refSide.as("__r"))
      .filter(col("__v").isNotNull)
    val refStats = rows.filter(col("__r"))
      .groupBy(g).agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val binned = rows
      .join(broadcast(refStats), groupCol)
      .select(g, col("__r"),
        refBin(col("__v"), col("__mn"), col("__mx"), nBins).as("bin"))
      .groupBy(g, col("bin"))
      .agg(
        sum(when(col("__r"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("__cb"))
    val ladder = Window.partitionBy(g).orderBy(col("bin"))
    val whole = Window.partitionBy(g)
    binned
      .withColumn("__cuma", sum(col("__ca")).over(ladder))
      .withColumn("__cumb", sum(col("__cb")).over(ladder))
      .withColumn("n_ref", sum(col("__ca")).over(whole))
      .withColumn("n_cur", sum(col("__cb")).over(whole))
      .groupBy(g)
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        max(abs(col("__cuma") * col("n_cur") - col("__cumb") * col("n_ref")))
          .as("d_num"))
      .withColumn("ks",
        col("d_num").cast("double") /
          (col("n_ref") * col("n_cur")).cast("double"))
  }

  /** The shared fixed-bin expression: reference-range equi-width with
    * both-edge clamping (mirrored in [[psiBinSql]] so the oracle can
    * compute the identical bin op-for-op).
    */
  private[graft] def refBin(v: Column, mn: Column, mx: Column, nBins: Int): Column =
    // clamp in LONG before the int cast: floor(...) of a far-out-of-
    // range value (corrupt current-side row) saturates the double->
    // long cast, and an int cast FIRST would wrap it negative and drop
    // the outlier into bin 0 instead of the top edge bin
    when(mx === mn, lit(0)).otherwise(
      least(lit(nBins - 1L), greatest(lit(0L),
        floor((v - mn) * nBins / (mx - mn)))).cast("int"))

  /** Scalar twin of [[refBin]] for the streaming state updaters — the
    * ONE definition the stream twins call, so the clamping/edge
    * convention cannot drift between batch and stream. Matches the
    * Column form's cast semantics exactly: Double.toLong saturates on
    * overflow and maps NaN to 0, same as Spark's non-ANSI cast.
    */
  private[graft] def refBinScalar(v: Double, mn: Double, mx: Double,
      nBins: Int): Int =
    if (mx == mn) 0
    else {
      val f = math.floor((v - mn) * nBins / (mx - mn))
      math.min(nBins - 1L, math.max(0L, f.toLong)).toInt
    }

  /** SQL twin of [[refBin]] for oracle authoring — kept next to the
    * Scala definition so the two cannot drift (same convention as
    * Profiling.histogramBinSql; outer CAST pins int32 on both engines).
    * The clamp happens BEFORE any integer cast (DuckDB raises on an
    * overflowing cast where Spark saturates — clamping first keeps the
    * value castable in both). NaN inputs are pinned to bin 0
    * explicitly: Spark's floor(double) returns LONG and maps NaN to 0
    * (bottom bin), while DuckDB's floor keeps NaN floating, which its
    * NaN-is-greatest ordering would ride through least() into the TOP
    * bin — the CASE guard makes both engines agree on bin 0.
    */
  def psiBinSql(v: String, mn: String, mx: String, nBins: Int): String =
    s"CAST(CASE WHEN isnan($v) THEN 0 WHEN $mx = $mn THEN 0 ELSE " +
      s"least(${nBins - 1}, greatest(0, " +
      s"floor(($v - $mn) * $nBins / ($mx - $mn)))) END AS INTEGER)"

  /** Per-(group, bin) PSI report: exact integer bin counts for both
    * sides plus the group's PSI (repeated per row; one output frame,
    * one gate hash). Smoothed proportions
    * p = (c_ref + alpha) / (n_ref + alpha * nBins) keep empty bins
    * finite; psi = round(sum (p - q) * ln(p / q), 6), summed in bin
    * order (an ordered window, not an unordered aggregate — float sums
    * must accumulate in a deterministic order to be comparable at
    * all). Conventional read: < 0.1 stable, 0.1-0.25 drifting, > 0.25
    * shifted.
    */
  def psi(ref: DataFrame, cur: DataFrame, groupCol: String,
      valueCol: String, nBins: Int, alpha: Double = 1e-4): DataFrame = {
    require(nBins > 0, s"nBins=$nBins")
    val g = col(groupCol)
    val refStats = ref.select(g, col(valueCol).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(g).agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    def sideBins(df: DataFrame, cName: String) =
      df.select(g, col(valueCol).as("__v")).filter(col("__v").isNotNull)
        .join(broadcast(refStats), groupCol)
        .select(g, refBin(col("__v"), col("__mn"), col("__mx"), nBins).as("bin"))
        .groupBy(g, col("bin")).agg(count(lit(1)).as(cName))
    psiTail(sideBins(ref, "c_ref")
      .join(sideBins(cur, "c_cur"), Seq(groupCol, "bin"), "full_outer")
      .na.fill(0L, Seq("c_ref", "c_cur")), groupCol, nBins, alpha)
  }

  /** [[psi]] when both sides live in ONE frame separated by a boolean
    * — one stats pass over the reference rows, then ONE binning scan
    * with conditional counts instead of two (the same fused-monitoring
    * rationale as [[ksStatisticSplit]]).
    */
  def psiSplit(df: DataFrame, refSide: Column, groupCol: String,
      valueCol: String, nBins: Int, alpha: Double = 1e-4): DataFrame = {
    require(nBins > 0, s"nBins=$nBins")
    val g = col(groupCol)
    // a NULL side flag belongs to NEITHER snapshot: without the filter
    // such rows count into neither conditional sum yet still witness
    // their (group, bin) row, creating a phantom both-zero bin whose
    // smoothed term the two-frame psi and the streaming twin never
    // include (their bin sets come from actual side members only)
    val rows = df.select(g, col(valueCol).as("__v"), refSide.as("__r"))
      .filter(col("__v").isNotNull && col("__r").isNotNull)
    val refStats = rows.filter(col("__r"))
      .groupBy(g).agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    psiTail(rows
      .join(broadcast(refStats), groupCol)
      .select(g, col("__r"),
        refBin(col("__v"), col("__mn"), col("__mx"), nBins).as("bin"))
      .groupBy(g, col("bin"))
      .agg(
        sum(when(col("__r"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("c_cur")),
      groupCol, nBins, alpha)
      // (both-empty bins cannot arise here: every (group, bin) row is
      // witnessed by at least one input row — same bin set as the
      // two-frame full-outer merge)
  }

  /** Shared PSI tail over merged (group, bin, c_ref, c_cur) rows. */
  private def psiTail(merged: DataFrame, groupCol: String, nBins: Int,
      alpha: Double): DataFrame = {
    val g = col(groupCol)
    val whole = Window.partitionBy(g)
    val ordered = Window.partitionBy(g).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    merged
      .withColumn("n_ref", sum(col("c_ref")).over(whole))
      .withColumn("n_cur", sum(col("c_cur")).over(whole))
      // alpha * nBins as an IEEE expression (lit * lit), NOT a
      // Scala-side constant fold — the oracle writes the same two-term
      // product, and the two double multiplies must round identically
      .withColumn("__p",
        (col("c_ref") + lit(alpha)) / (col("n_ref") + lit(alpha) * lit(nBins)))
      .withColumn("__q",
        (col("c_cur") + lit(alpha)) / (col("n_cur") + lit(alpha) * lit(nBins)))
      .withColumn("psi", round(
        sum((col("__p") - col("__q")) * log(col("__p") / col("__q")))
          .over(ordered), 6))
      .select(g, col("bin"), col("c_ref"), col("c_cur"),
        col("n_ref"), col("n_cur"), col("psi"))
  }

  /** C6: chi-square categorical drift — the classical two-sample test
    * over an ENUMERABLE category column (language mix, source mix,
    * label distribution), completing the drift battery: KS (C2) reads
    * continuous values, PSI (C3) reads binned magnitudes, chi-square
    * reads categories, where "a category appeared/vanished" is exactly
    * the signal bins smooth away. Both sides in ONE frame split by a
    * boolean (the psiSplit shape).
    *
    * χ² = Σ_cats (c_cur − E_c)² / E_c with the expected count
    * E_c = n_cur·(c_ref + α)/(n_ref + α·K) add-α smoothed so a
    * cur-only category contributes a finite (large) term instead of a
    * division by zero; K = categories observed on either side, dof =
    * K − 1. Float discipline: E is one fixed expression from integer
    * counts, the χ² sum accumulates in CATEGORY ORDER via the ordered
    * window (the PSI device) and rounds to 6.
    *
    * Shape: one conditional-count aggregation (map-side combinable,
    * output bounded by groups × category vocabulary) + two windows
    * over that bounded table. The category column must be enumerable —
    * for high-cardinality columns bin first (C2b/C3 territory).
    */
  def chiSquareSplit(df: DataFrame, refSide: Column, groupCol: String,
      catCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha=$alpha (want > 0: zero re-opens the " +
      "cur-only-category division by zero)")
    val g = col(groupCol)
    val rows = df.select(g, col(catCol).as("category"), refSide.as("__r"))
      .filter(col("category").isNotNull && col("__r").isNotNull)
    val counts = rows.groupBy(g, col("category"))
      .agg(sum(when(col("__r"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("c_cur"))
    val whole = Window.partitionBy(g)
    val ordered = Window.partitionBy(g).orderBy(col("category"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val expected = (col("n_cur") * (col("c_ref") + lit(alpha)))
      ./(col("n_ref") + lit(alpha) * col("n_cats"))
    counts
      .withColumn("n_ref", sum(col("c_ref")).over(whole))
      .withColumn("n_cur", sum(col("c_cur")).over(whole))
      .withColumn("n_cats", count(lit(1)).over(whole))
      // E = 0 exactly when the group's current side is empty (α > 0
      // keeps every other case positive): chi-square is undefined
      // there — raise a NAMED error instead of ANSI's bare
      // DIVIDE_BY_ZERO / non-ANSI's silent NULL
      .withColumn("__e",
        when(col("n_cur") === 0, raise_error(lit(
          "chiSquareSplit: group with an empty current side — " +
            "chi-square is undefined; filter such groups upstream")))
          .otherwise(expected))
      .withColumn("chi2", round(
        sum((col("c_cur") - col("__e")) * (col("c_cur") - col("__e"))
          / col("__e")).over(ordered), 6))
      .select(g, col("category"), col("c_ref"), col("c_cur"),
        col("n_ref"), col("n_cur"),
        round(col("__e"), 6).as("expected"), col("chi2"),
        (col("n_cats") - 1).cast("long").as("dof"))
  }
}
