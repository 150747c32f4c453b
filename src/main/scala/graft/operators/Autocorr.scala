package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A67: lag-k autocorrelation of keyed regular series (SURVEY.md §2.2)
  * — the time-series diagnostic behind seasonality detection (a daily
  * cycle shows as a peak at lag 24 on hourly buckets), anomaly-model
  * selection (is this metric AR-ish or white?), and the reference
  * family's own baseline choices (R15's seasonal split assumes the
  * period; ACF is how you'd MEASURE it).
  *
  * Exactness: Pearson r at lag k is computed from the six pair sums
  * (n, Σx, Σy, Σxy, Σx², Σy²) accumulated in decimal(38,0) over
  * INTEGER inputs — every sum is order-free exact under any
  * partitioning, so both engines see identical integers. Only the
  * final step leaves integers, as one fixed IEEE expression
  * (`num / (sqrt(d1) · sqrt(d2))`, each operand a correctly-rounded
  * decimal→double cast), identical on any engine that follows IEEE
  * semantics. A constant window (zero variance) yields NULL, not NaN.
  *
  * Scale shape: pairs come from ONE equi-join of the series with
  * itself on (key, t + lag) — the lag column is exploded from a
  * config-sized literal array (×|lags| row amplification, explicit),
  * and both sides shuffle on the series key, so consecutive lags
  * reuse the partitioning. No global window, no per-key sort: gaps in
  * the series self-select out (a missing t+lag simply finds no join
  * partner), which makes this the honest irregular-series form — a
  * row-lag window would silently pair across gaps. The join is
  * data × data (series tables at host-metrics scale are hosts ×
  * horizon) — documented in the SMJ allowlist.
  */
object Autocorr {

  /** Lag-k autocorrelations. `series`: one row per (key, t) with an
    * integral `t` (a bucket index — caller buckets time) and an
    * integral value `v` (caller quantizes; integers are what make the
    * sums exact). Returns (key, lag, n_pairs, r) for every requested
    * lag, r NULL when fewer than 2 pairs or zero variance on either
    * side.
    */
  def acf(series: DataFrame, keyCol: String, tCol: String, vCol: String,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0),
      s"lags must be positive, got $lags")
    val base = series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("x"))
    lagCorr(base, base.select(col("key"), col("t"), col("x").as("y")), lags)
  }

  /** A69: lag-k CROSS-correlation of two keyed series — the lead/lag
    * discovery diagnostic (does `views` at hour t predict `purchases`
    * at t+k? which k?). Same exactness and join shape as [[acf]]
    * (which is the xs == ys special case); lags may be negative or
    * zero (negative k means `ys` LEADS `xs`). `xs`/`ys` share (key,
    * t) conventions; r at each lag correlates x(t) with y(t + lag).
    */
  def ccf(xs: DataFrame, ys: DataFrame, keyCol: String, tCol: String,
      vCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty, "lags must be non-empty")
    require(lags.distinct.size == lags.size, s"duplicate lags in $lags")
    lagCorr(
      xs.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(vCol).cast("long").as("x")),
      ys.select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(vCol).cast("long").as("y")),
      lags)
  }

  /** Shared kernel: pair x(t) with y(t + lag) per key, six exact
    * integer sums, one final IEEE Pearson expression.
    */
  private def lagCorr(base: DataFrame, ySide: DataFrame,
      lags: Seq[Int]): DataFrame = {
    val lagged = ySide.select(col("key"), col("t").as("t_y"), col("y"))
    val xk = base.withColumn("lag",
        explode(array(lags.map(l => lit(l)).toIndexedSeq: _*)))
      .withColumn("t_y", col("t") + col("lag"))
    val d38 = "decimal(38,0)"
    val pairs = xk.join(lagged, Seq("key", "t_y"))
    val agg = pairs.groupBy(col("key"), col("lag"))
      .agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x").cast(d38)) * col("y").cast(d38)).as("sxy"),
        sum((col("x").cast(d38)) * col("x").cast(d38)).as("sxx"),
        sum((col("y").cast(d38)) * col("y").cast(d38)).as("syy"))
    // Overflow contract: the Pearson terms multiply two decimal(38,0)
    // aggregates; Spark caps the product at precision 38 and non-ANSI
    // mode yields NULL past ~1e38 (the DuckDB HUGEINT oracle and the
    // StreamingAcf 128-bit twin keep going slightly further). The
    // inputs are exact sums of longs, so every operand here is
    // non-NULL by construction — a NULL product can ONLY mean
    // overflow, and the guard below converts it to a raise so the
    // documented bit-for-bit parity breaks LOUDLY, never as a silent
    // NULL r that reads like degenerate variance.
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val d1 = col("n") * col("sxx") - col("sx") * col("sx")
    val d2 = col("n") * col("syy") - col("sy") * col("sy")
    def guarded(e: org.apache.spark.sql.Column, nm: String) =
      when(e.isNotNull, e.cast("double"))
        .otherwise(raise_error(lit(s"Autocorr: decimal(38,0) overflow " +
          s"in $nm — per-(key,lag) moments exceed the ~1e38 exactness " +
          "bound; shard the key or rescale the input")))
    agg
      .withColumn("__num", guarded(num, "n*sxy - sx*sy"))
      .withColumn("__d1", guarded(d1, "n*sxx - sx*sx"))
      .withColumn("__d2", guarded(d2, "n*syy - sy*sy"))
      .select(col("key"), col("lag").cast("int").as("lag"),
        col("n").cast("long").as("n_pairs"),
        when(col("__d1") > 0.0 && col("__d2") > 0.0,
            round(col("__num") / (sqrt(col("__d1")) * sqrt(col("__d2"))), 6))
          .as("r"))
  }
}
