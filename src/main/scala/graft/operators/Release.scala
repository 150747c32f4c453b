package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** P13: release writer with a content-addressed manifest — the
  * shipping step after curation: write the corpus partitioned by its
  * release dimension with bounded file sizes, then prove the written
  * artifact IS the corpus. The manifest row per partition carries an
  * order-independent content checksum, so "did the write lose,
  * duplicate, or mangle anything" is one frame comparison — the same
  * question the snapshot diff (P7) answers between corpus versions,
  * asked here between a corpus and its serialized form.
  *
  * Checksum: Σ md5₆₀(id | text) per partition, summed in
  * decimal(38,0) — exact and ORDER-INDEPENDENT (file/task order is
  * not deterministic in a distributed write, so an order-sensitive
  * digest would be useless), emitted as a STRING (the only dtype a
  * 38-digit integer survives in every engine/reader unchanged).
  * Collision scope: a corruption must collide a 60-bit-hash SUM to
  * slip through — fine for integrity (not an adversarial MAC).
  *
  * Scale shape: the write is Spark's own partitioned parquet write
  * (`maxRecordsPerFile` bounds task output files); the manifest is
  * one map-side-combinable aggregation per side, output bounded by
  * the partition vocabulary.
  */
object Release {

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register `dir` for recursive deletion at JVM exit (idempotent per
    * path). Eager post-build deletion is impossible for the gate's
    * scratch artifact — the returned manifest frame reads it LAZILY at
    * execution time — so the hook bounds disk accumulation at one
    * scratch copy per LIVE JVM instead of one per historical run (the
    * per-application path already keeps concurrent runs disjoint).
    */
  def deleteOnExit(dir: String): Unit =
    if (cleanupRegistered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(dir))
      }))

  /** Null-safe full outer join on one key column — a NULL partition
    * value is a legitimate release dimension (written as Hive's
    * default-partition directory and read back as NULL), but
    * `usingColumns` equi-joins never match null keys, so the two
    * sides' null-partition rows would split into two half-null rows
    * and read as corruption. `<=>` matches them; the surviving key is
    * coalesced back under the original name.
    */
  private def fullJoinNullSafe(l: DataFrame, r: DataFrame,
      key: String): DataFrame =
    l.withColumnRenamed(key, "__lk")
      .join(r.withColumnRenamed(key, "__rk"),
        col("__lk") <=> col("__rk"), "full")
      .withColumn(key, coalesce(col("__lk"), col("__rk")))
      .drop("__lk", "__rk")

  /** The per-row checksum term the manifest sums (order-independent by
    * commutativity of the decimal sum). */
  private def rowChecksum(idCol: String, textCol: String): Column =
    Hashing.md5Long60(concat(col(idCol).cast("string"), lit("|"),
      coalesce(col(textCol), lit("")))).cast("decimal(38,0)")

  /** Order-independent per-partition manifest of any frame. */
  def manifest(df: DataFrame, partitionCol: String, idCol: String,
      textCol: String): DataFrame =
    df.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowChecksum(idCol, textCol)).cast("string").as("content_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Write `df` partitioned by `partitionCol` under `dir`, read the
    * artifact back, and return ITS manifest — gating the full
    * write→read roundtrip, not the in-memory frame.
    */
  def writeAndManifest(df: DataFrame, dir: String, partitionCol: String,
      idCol: String, textCol: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dir)
    manifest(df.sparkSession.read.parquet(dir), partitionCol, idCol, textCol)
  }

  /** P13c: incremental APPEND to an existing release, manifest-
    * reconciled — the op that CREATES the fragmentation [[compact]]
    * cleans up, gated the same way. The P13 checksum is an
    * order-independent SUM, so append has an algebraic expectation:
    * per partition, expected = before + batch (both row counts and
    * decimal(38,0) content sums ADD — no re-scan of the existing
    * release's data beyond its vocabulary-sized manifest). The
    * returned frame compares that expectation against the re-read
    * artifact's actual manifest; `matched` false on any loss,
    * duplication, or mangling of either the old rows or the batch.
    *
    * Append is a pure MULTISET add (lakehouse append semantics): ids
    * already present simply duplicate, and the reconciliation still
    * balances — dedup against the corpus is the D8 incremental
    * operator's job, upstream of the writer. Both the before-manifest
    * and the batch-manifest are materialized EAGERLY before the write:
    * a lazy before-read re-listing the directory after the append
    * would see the new files and vacuously match, and a batch whose
    * lineage reads the target dir would double-count.
    */
  def appendAndManifest(batch: DataFrame, dir: String, partitionCol: String,
      idCol: String, textCol: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    val spark = batch.sparkSession
    val mat = Materializer.of(spark)
    val before = mat.eager(
      manifest(spark.read.parquet(dir), partitionCol, idCol, textCol))
    val batchM = mat.eager(manifest(batch, partitionCol, idCol, textCol))
    batch.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dir)
    reconcileAppend(before, batchM,
      manifest(spark.read.parquet(dir), partitionCol, idCol, textCol),
      partitionCol)
  }

  /** P13c's PRODUCTION path: the same append, verified in O(batch)
    * instead of O(release). [[appendAndManifest]] re-scans the whole
    * artifact twice (before + after) — audit-grade, but at 100 TB two
    * full-corpus scans per daily batch IS the op's own scale killer.
    * Here the caller passes the release's STORED manifest (the frame
    * the previous [[writeAndManifest]] / [[compact]] /
    * appendIncremental call returned — every writer op emits the next
    * one precisely so this chain never re-reads history):
    *
    *   1. list the release's files (a filesystem metadata op — the
    *      same listing every lakehouse commit does; Hadoop FS API, so
    *      HDFS/S3A work, not just local disk),
    *   2. append the batch,
    *   3. re-list; any PRE-EXISTING file missing RAISES (an append
    *      that destroyed history is not a mismatch to report, it is a
    *      stop-the-pipeline corruption),
    *   4. manifest ONLY the new files (partition columns restored via
    *      basePath) and compare against the batch's own manifest —
    *      the landed bytes must BE the batch,
    *   5. compose the post-append manifest algebraically from the
    *      stored manifest + the landed data (sums add, min/max fold)
    *      — zero reads of pre-existing rows anywhere.
    *
    * Returns the composed manifest (the stored artifact for the NEXT
    * call) plus a per-partition `matched` flag from step 4. Trust
    * model: the stored manifest attests history (re-attest any time
    * with [[manifest]] over a full read — the audit path); this call
    * proves the DELTA landed intact.
    */
  def appendIncremental(batch: DataFrame, dir: String,
      storedManifest: DataFrame, partitionCol: String, idCol: String,
      textCol: String, maxRecordsPerFile: Long = 1000000L): DataFrame = {
    val spark = batch.sparkSession
    val mat = Materializer.of(spark)
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(hPath)
    def listParquet(): Set[String] = {
      val it = fs.listFiles(qualified, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          b += st.getPath.toString
      }
      b.result()
    }
    // the stored manifest and the batch's manifest both materialize
    // BEFORE the write — same lazy-relist / self-referential-batch
    // holes appendAndManifest closes
    val before = mat.eager(storedManifest
      .select(col(partitionCol), col("n_rows"), col("content_sum"),
        col("min_id"), col("max_id")))
    val batchM = mat.eager(manifest(batch, partitionCol, idCol, textCol))
    val files0 = listParquet()
    batch.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dir)
    val files1 = listParquet()
    val lost = files0 -- files1
    if (lost.nonEmpty) throw new IllegalStateException(
      s"appendIncremental: ${lost.size} pre-existing file(s) vanished " +
        s"during the append (e.g. ${lost.head}) — the release history " +
        "was destroyed; halt and restore before trusting the artifact")
    val newFiles = (files1 -- files0).toSeq.sorted
    val landed =
      if (newFiles.isEmpty) batchM.limit(0)
      else manifest(
        spark.read.option("basePath", qualified.toString)
          .parquet(newFiles: _*),
        partitionCol, idCol, textCol)
    def arm(m: DataFrame, tag: String): DataFrame =
      m.select(col(partitionCol), col("n_rows").as(s"__n_$tag"),
        col("content_sum").cast("decimal(38,0)").as(s"__s_$tag"),
        col("min_id").as(s"__lo_$tag"), col("max_id").as(s"__hi_$tag"))
    val zero = lit(0L).cast("decimal(38,0)")
    // step 4 (landed == batch) and step 5 (before + landed) in one
    // three-way NULL-SAFE full join (a null partition is a legitimate
    // dimension value); least/greatest skip null arms natively
    fullJoinNullSafe(
        fullJoinNullSafe(arm(before, "b"), arm(landed, "l"), partitionCol),
        arm(batchM, "x"), partitionCol)
      .select(col(partitionCol),
        (coalesce(col("__n_b"), lit(0L)) + coalesce(col("__n_l"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("__s_b"), zero) + coalesce(col("__s_l"), zero))
          .cast("decimal(38,0)").cast("string").as("content_sum"),
        least(col("__lo_b"), col("__lo_l")).as("min_id"),
        greatest(col("__hi_b"), col("__hi_l")).as("max_id"),
        coalesce(
          (col("__n_l") <=> col("__n_x")) && (col("__s_l") <=> col("__s_x")),
          lit(false)).as("matched"))
  }

  /** The pure reconciliation behind [[appendAndManifest]], exposed so
    * the loss/tamper arms are unit-testable without corrupting a real
    * write: per partition, (before + batch) vs after on both row
    * counts and content sums, full-joined so a partition missing from
    * (or invented in) the artifact reads as mismatch, never null.
    */
  def reconcileAppend(beforeM: DataFrame, batchM: DataFrame,
      afterM: DataFrame, partitionCol: String): DataFrame = {
    val zero = lit(0L).cast("decimal(38,0)")
    def arm(m: DataFrame, tag: String): DataFrame =
      m.select(col(partitionCol), col("n_rows").as(s"__n_$tag"),
        col("content_sum").cast("decimal(38,0)").as(s"__s_$tag"))
    val expected = fullJoinNullSafe(arm(beforeM, "b"), arm(batchM, "a"),
        partitionCol)
      .select(col(partitionCol),
        (coalesce(col("__n_b"), lit(0L)) + coalesce(col("__n_a"), lit(0L)))
          .as("n_rows_expected"),
        (coalesce(col("__s_b"), zero) + coalesce(col("__s_a"), zero))
          .cast("decimal(38,0)").cast("string").as("content_sum_expected"))
    fullJoinNullSafe(expected,
        afterM.select(col(partitionCol), col("n_rows").as("n_rows_after"),
          col("content_sum").as("content_sum_after")),
        partitionCol)
      .withColumn("matched",
        coalesce(col("n_rows_expected") === col("n_rows_after") &&
          col("content_sum_expected") === col("content_sum_after"),
          lit(false)))
  }

  /** P13b: small-file COMPACTION of an existing release — the
    * maintenance half of the writer: incremental appends leave each
    * partition littered with batch-sized fragments, and at 100 TB the
    * per-file scheduling/open cost of a million tiny parquet files
    * dominates reads. Rewrites `srcDir` into `dstDir` bin-packed
    * toward `targetRecordsPerFile`, and returns the per-partition
    * verification frame: before/after row counts, content checksums
    * (the P13 manifest — order-independent by construction, so the
    * rewrite MUST reproduce it string-for-string), file counts, and a
    * `matched` flag. A lost/duplicated/mangled row flips `matched`
    * false; callers gate the swap on `matched` being all-true.
    *
    * Packing: per-partition target file counts come from one
    * vocabulary-sized count aggregate joined back by broadcast (never
    * a driver collect), each row takes a DETERMINISTIC file index
    * `hash(id) mod k`, and the pre-write shuffle keys on
    * (partition, index) so each task holds whole output files. No
    * row_number / per-partition sort anywhere — the hash spread is
    * binomially even, which is what compaction needs; the
    * `maxRecordsPerFile` bound backstops any hash-collision merge of
    * two index groups into one task. Writes to a NEW directory:
    * rewriting a parquet dir that a live plan is lazily reading is a
    * self-overwrite corruption class Spark cannot guard, and the
    * atomic swap (rename / catalog pointer flip) is the caller's
    * transaction anyway.
    */
  /** Equal OR nested either way is refused: a dst inside src would
    * surface the half-written copy to src's own lazy re-read
    * (partition discovery walks the tree), and a src inside dst would
    * be deleted by the overwrite — all three are the same corruption
    * class. Compared on Hadoop-QUALIFIED URIs, not java.io.File: Spark
    * accepts URI spellings, and 'file:///data/rel' vs '/data/rel' name
    * the same location while canonicalizing differently as local files
    * — a java.io.File guard would wave the self-overwrite through (the
    * same qualification appendIncremental's file listing uses).
    */
  private def requireDisjointDirs(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, dstDir: String, op: String): Unit = {
    val hConf = spark.sessionState.newHadoopConf()
    def qualified(d: String): String = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hConf).makeQualified(p).toUri.toString
    }
    val (srcQ, dstQ) = (qualified(srcDir), qualified(dstDir))
    require(srcQ != dstQ &&
      !srcQ.startsWith(dstQ + "/") && !dstQ.startsWith(srcQ + "/"),
      s"$op must write to a new directory outside the source tree " +
        "(self-overwrite of a lazily-read parquet dir corrupts the " +
        s"release); got src=$srcQ dst=$dstQ; swap after gating")
  }

  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, partitionCol: String, idCol: String, textCol: String,
      targetRecordsPerFile: Long): DataFrame = {
    require(targetRecordsPerFile >= 1L,
      s"targetRecordsPerFile must be >= 1, got $targetRecordsPerFile")
    requireDisjointDirs(spark, srcDir, dstDir, "compact")
    val src = spark.read.parquet(srcDir)
    val sizes = src.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(partitionCol),
        expr(s"(__n + ${targetRecordsPerFile - 1}) div $targetRecordsPerFile")
          .cast("int").as("__k"))
    // NULL-SAFE size lookup: a plain usingColumns equi-join would
    // silently DROP every null-partition row from the rewrite (nulls
    // never match) — the verification would catch it as a mismatch,
    // but the op must handle the legitimate null dimension, not just
    // detect its own loss of it
    src.join(broadcast(sizes.withColumnRenamed(partitionCol, "__pc")),
        col(partitionCol) <=> col("__pc"))
      .withColumn("__f", pmod(hash(col(idCol)), greatest(col("__k"), lit(1))))
      .repartition(col(partitionCol), col("__f"))
      .drop("__pc", "__k", "__f")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dstDir)
    val dst = spark.read.parquet(dstDir)
    // ONE scan per side: checksum and file count fused into the same
    // aggregate (a separate file-count pass would re-read the corpus —
    // at 100 TB the verification's cost is these two scans, period).
    // Files counted via the file-source _metadata column (a real,
    // deterministic column — input_file_name() is rejected inside
    // aggregates as non-deterministic).
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col(partitionCol), rowChecksum(idCol, textCol).as("__cs"),
          col("_metadata.file_path").as("__fp"))
        .groupBy(col(partitionCol))
        .agg(count(lit(1)).as(s"n_rows_$tag"),
          sum(col("__cs")).cast("string").as(s"content_sum_$tag"),
          countDistinct(col("__fp")).as(s"files_$tag"))
    fullJoinNullSafe(side(src, "before"), side(dst, "after"), partitionCol)
      .withColumn("matched",
        // a partition present on only one side is a loss/invention —
        // the full join's nulls must read as mismatch, never null
        coalesce(col("n_rows_before") === col("n_rows_after") &&
          col("content_sum_before") === col("content_sum_after"),
          lit(false)))
  }

  /** The pure reconciliation behind [[deleteAndManifest]] — P13c's
    * algebra in REVERSE (the checksum is an order-independent decimal
    * SUM, so deletion subtracts exactly the way append adds): per
    * partition, expected = before − removed on both row counts and
    * content sums, compared against the rewritten artifact's actual
    * manifest. Full-joined null-safely so a partition lost by the
    * rewrite, invented by it, or fully deleted (legitimately absent
    * from `after`) reads as an explicit verdict, never a null: a fully
    * deleted partition matches iff expected lands on exactly 0/0, and
    * a partition present in `after` but absent from `before` can never
    * match. Exposed so the loss/invention/mangling arms are
    * unit-testable without corrupting a real write.
    */
  def reconcileDelete(beforeM: DataFrame, removedM: DataFrame,
      afterM: DataFrame, partitionCol: String): DataFrame = {
    val zero = lit(0L).cast("decimal(38,0)")
    def arm(m: DataFrame, tag: String): DataFrame =
      m.select(col(partitionCol), col("n_rows").as(s"__n_$tag"),
        col("content_sum").cast("decimal(38,0)").as(s"__s_$tag"))
    val expected = fullJoinNullSafe(arm(beforeM, "b"), arm(removedM, "r"),
        partitionCol)
      .select(col(partitionCol),
        (coalesce(col("__n_b"), lit(0L)) - coalesce(col("__n_r"), lit(0L)))
          .as("n_rows_expected"),
        (coalesce(col("__s_b"), zero) - coalesce(col("__s_r"), zero))
          .cast("decimal(38,0)").cast("string").as("content_sum_expected"),
        coalesce(col("__n_r"), lit(0L)).as("n_removed"))
    fullJoinNullSafe(expected,
        afterM.select(col(partitionCol), col("n_rows").as("n_rows_after"),
          col("content_sum").as("content_sum_after")),
        partitionCol)
      .withColumn("matched",
        // an after-partition with no expectation row can never match
        // (coalesce(null === …) → false); a fully deleted partition
        // has no after row and matches iff the expectation is 0/"0"
        coalesce(col("n_rows_expected") ===
            coalesce(col("n_rows_after"), lit(0L)) &&
          col("content_sum_expected").cast("decimal(38,0)") ===
            coalesce(col("content_sum_after").cast("decimal(38,0)"), lit(0L)
              .cast("decimal(38,0)")),
          lit(false)))
  }

  /** P13d (audit form): manifest-reconciled DELETE — the release
    * lifecycle's takedown/GDPR/retention leg (write P13, compact P13b,
    * append P13c, delete P13d). `removeIds` is a frame of id values to
    * purge; the surviving corpus is rewritten to `dstDir` (NEVER in
    * place — same [[requireDisjointDirs]] guard and caller-owned
    * atomic-swap transaction as [[compact]]), and the returned frame
    * proves per partition that exactly the targeted rows left:
    * expected = before − removed, compared against the re-read
    * artifact. Ids absent from the release remove nothing and still
    * reconcile — re-running a delete is idempotent by construction
    * (the removed-manifest is computed from the release rows the ids
    * actually HIT, materialized EAGERLY before the rewrite, for the
    * same lazy-relist reasons as [[appendAndManifest]]).
    *
    * This form re-scans the whole release (before-manifest + rewrite)
    * — audit-grade; [[deleteIncremental]] is the production path that
    * touches only affected partitions.
    */
  def deleteAndManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, dstDir: String, removeIds: DataFrame,
      partitionCol: String, idCol: String, textCol: String,
      maxRecordsPerFile: Long = 1000000L): DataFrame = {
    requireDisjointDirs(spark, dir, dstDir, "delete")
    val mat = Materializer.of(spark)
    val rm = broadcast(
      removeIds.select(col(idCol).as("__rm_id")).distinct())
    val src = spark.read.parquet(dir)
    val before = mat.eager(manifest(src, partitionCol, idCol, textCol))
    val removed = mat.eager(manifest(
      src.join(rm, col(idCol) === col("__rm_id"), "leftsemi"),
      partitionCol, idCol, textCol))
    src.join(rm, col(idCol) === col("__rm_id"), "leftanti")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(dstDir)
    // an all-rows delete writes an empty artifact parquet cannot
    // re-infer a schema from — that is a legitimate outcome, not an
    // error: every expectation row must then be 0/"0"
    val after =
      try manifest(spark.read.parquet(dstDir), partitionCol, idCol, textCol)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        before.limit(0) }
    reconcileDelete(before, removed, after, partitionCol)
  }

  /** P13d's PRODUCTION path: the same delete, O(touched partitions)
    * instead of O(release). The audit form's two full-corpus scans are
    * the op's own scale killer at 100 TB when a takedown touches a
    * handful of rows; here the caller passes the release's STORED
    * manifest (the frame the previous writer op returned — the same
    * trust chain as [[appendIncremental]]) and only partitions that
    * can contain a targeted id are ever read:
    *
    *   1. candidate partitions come from metadata alone — if
    *      `removeIds` carries the partition column (a takedown that
    *      knows its shard) its distinct values are exact; otherwise
    *      the stored manifest's per-partition [min_id, max_id] ranges
    *      prune to the partitions whose id span can contain a target
    *      (exact when the release is id-partitioned/sorted; a safe
    *      superset otherwise). Both are vocabulary-sized broadcasts.
    *   2. ONE partition-pruned read of the candidates finds the rows
    *      the ids actually hit; their manifest materializes EAGERLY
    *      (the removed-arm of the algebra, and the TOUCHED set —
    *      candidates nothing hit are never rewritten, which is what
    *      makes re-running a delete O(metadata), not O(delta)).
    *   3. survivors of ONLY the touched partitions are rewritten to
    *      `stagingDir` ([[requireDisjointDirs]]-guarded; the release
    *      itself is never written — a before/after file listing RAISES
    *      if anything mutated it mid-op), landed bytes are re-read and
    *      verified per partition against expected = stored − removed.
    *   4. the composed next-manifest folds landed values over stored
    *      rows (untouched partitions keep their attested row; a fully
    *      deleted partition composes to 0 rows) — zero reads of
    *      untouched data anywhere.
    *
    * Caller's swap: replace each touched partition directory with
    * staging's (drop directories of partitions composing to 0 rows),
    * gated on `matched` all-true; the returned frame (minus its
    * verdict columns, n_rows > 0) is the stored manifest for the next
    * call.
    */
  def deleteIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String, stagingDir: String, storedManifest: DataFrame,
      removeIds: DataFrame, partitionCol: String, idCol: String,
      textCol: String, maxRecordsPerFile: Long = 1000000L): DataFrame = {
    requireDisjointDirs(spark, dir, stagingDir, "delete")
    val mat = Materializer.of(spark)
    val stored = mat.eager(storedManifest
      .select(col(partitionCol), col("n_rows"), col("content_sum"),
        col("min_id"), col("max_id")))
    val rm = broadcast(removeIds.select(
      (col(idCol).as("__rm_id") +:
        (if (removeIds.columns.contains(partitionCol))
          Seq(col(partitionCol).as("__rm_pc")) else Seq.empty)): _*)
      .distinct())
    // step 1: candidate partitions from metadata alone
    val candDf =
      if (removeIds.columns.contains(partitionCol))
        rm.select(col("__rm_pc").as(partitionCol)).distinct()
      else stored.join(rm,
          col("__rm_id") >= col("min_id") && col("__rm_id") <= col("max_id"),
          "leftsemi")
        .select(col(partitionCol))
    // vocabulary-sized by construction (bounded by the partition
    // dimension's cardinality) — same config-sized-collect class as
    // the IVF/BPE/moments driver collects
    val cand = candDf.collect().map(_.get(0)).toSeq
    def partIn(vals: Seq[Any]): Column = {
      val nonNull = vals.filter(_ != null)
      val in =
        if (nonNull.isEmpty) lit(false)
        else col(partitionCol).isInCollection(nonNull)
      if (vals.contains(null)) in || col(partitionCol).isNull else in
    }
    def trivially(m: DataFrame): DataFrame =
      m.select(col(partitionCol), col("n_rows"), col("content_sum"),
        col("min_id"), col("max_id"))
        .withColumn("n_removed", lit(0L))
        .withColumn("touched", lit(false))
        .withColumn("matched", lit(true))
    if (cand.isEmpty) return trivially(stored)
    // step 2: one partition-pruned read; the removed-arm manifest
    val rmJoin = (l: DataFrame, how: String) => {
      val cond =
        if (removeIds.columns.contains(partitionCol))
          col(idCol) === col("__rm_id") &&
            col(partitionCol) <=> col("__rm_pc")
        else col(idCol) === col("__rm_id")
      l.join(rm, cond, how)
    }
    val pruned = spark.read.parquet(dir).filter(partIn(cand))
    val removed = mat.eager(manifest(rmJoin(pruned, "leftsemi"),
      partitionCol, idCol, textCol))
    val touched = removed.select(col(partitionCol)).collect()
      .map(_.get(0)).toSeq
    if (touched.isEmpty) return trivially(stored)
    // step 3: rewrite ONLY the touched partitions' survivors
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(hPath)
    def listRelease(): Set[String] = {
      val it = fs.listFiles(qualified, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().getPath.toString
      b.result()
    }
    val files0 = listRelease()
    rmJoin(pruned.filter(partIn(touched)), "leftanti")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(stagingDir)
    val drift = {
      val files1 = listRelease()
      (files0 diff files1) ++ (files1 diff files0)
    }
    if (drift.nonEmpty) throw new IllegalStateException(
      s"deleteIncremental: the release itself changed during the staged " +
        s"rewrite (${drift.size} file(s), e.g. ${drift.head}) — the stored " +
        "manifest no longer attests it; halt and re-attest before swapping")
    val landed =
      try manifest(spark.read.parquet(stagingDir), partitionCol, idCol,
        textCol)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        stored.limit(0) } // every touched partition fully deleted
    // step 4: verify landed = stored − removed per touched partition,
    // compose the next manifest (landed folds over stored)
    val zero = lit(0L).cast("decimal(38,0)")
    def arm(m: DataFrame, tag: String): DataFrame =
      m.select(col(partitionCol), col("n_rows").as(s"__n_$tag"),
        col("content_sum").cast("decimal(38,0)").as(s"__s_$tag"),
        col("min_id").as(s"__lo_$tag"), col("max_id").as(s"__hi_$tag"))
    fullJoinNullSafe(
        fullJoinNullSafe(arm(stored, "b"), arm(removed, "r"), partitionCol),
        arm(landed, "l"), partitionCol)
      .withColumn("touched", col("__n_r").isNotNull)
      .select(col(partitionCol),
        when(col("touched"), coalesce(col("__n_l"), lit(0L)))
          .otherwise(col("__n_b")).as("n_rows"),
        when(col("touched"), coalesce(col("__s_l"), zero))
          .otherwise(col("__s_b")).cast("decimal(38,0)").cast("string")
          .as("content_sum"),
        when(col("touched"), col("__lo_l")).otherwise(col("__lo_b"))
          .as("min_id"),
        when(col("touched"), col("__hi_l")).otherwise(col("__hi_b"))
          .as("max_id"),
        coalesce(col("__n_r"), lit(0L)).as("n_removed"),
        col("touched"),
        when(col("touched"),
          // the landed bytes must be exactly the survivors: counts and
          // sums subtract; a vanished/invented/mangled staging row
          // breaks one of the two equalities (nulls → false)
          coalesce(coalesce(col("__n_l"), lit(0L)) ===
              col("__n_b") - col("__n_r") &&
            coalesce(col("__s_l"), zero).cast("decimal(38,0)") ===
              (col("__s_b") - col("__s_r")).cast("decimal(38,0)"),
            lit(false)))
        .otherwise(
          // an untouched partition must not appear in staging, and a
          // staged partition unknown to the stored manifest is an
          // invention — both read false, everything else true
          col("__n_l").isNull && col("__n_b").isNotNull)
        .as("matched"))
  }

  /** P13e: RETENTION — whole-partition takedown by PREDICATE (drop
    * every partition whose VALUE satisfies `dropPredicate`: age
    * cutoffs, deprecated sources, jurisdiction sunsets), the
    * partition-granular sibling of the row-granular [[deleteIncremental]].
    * At partition granularity nothing needs rewriting — the op is a
    * metadata plan plus an ARCHIVE MOVE (never a destructive delete:
    * each dropped partition directory is renamed into `archiveDir`,
    * the caller's retention policy disposes of the archive on its own
    * clock), reconciled three ways:
    *
    *   1. dropped-partition directories are located by re-deriving
    *      Spark's own Hive path encoding (`getPartitionPathString` —
    *      escaped values and the null partition's default dir
    *      included); a dropped partition whose directory is MISSING
    *      raises (the stored manifest attests rows there), as does an
    *      archive collision (refuse overwrite) or a failed rename;
    *   2. the release's file listing after the moves must equal
    *      before-minus-moved exactly — kept partitions provably
    *      untouched, byte for byte;
    *   3. the archived bytes are re-read (O(dropped) — the delta,
    *      never the release) and their manifest compared per
    *      partition against the stored rows that left: `matched`
    *      false on any loss/invention/mangling in flight.
    *
    * A NULL partition value is dropped only when the predicate is
    * TRUE on null (e.g. `isNull`); a predicate evaluating to NULL
    * KEEPS the partition (retention must be explicit, never a
    * three-valued-logic accident). Returns every stored partition
    * with `dropped` + `matched` verdicts; the caller's next stored
    * manifest is the `!dropped` rows minus the verdict columns.
    */
  def retainAndManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, archiveDir: String, storedManifest: DataFrame,
      dropPredicate: Column, partitionCol: String, idCol: String,
      textCol: String): DataFrame = {
    requireDisjointDirs(spark, dir, archiveDir, "retention")
    val mat = Materializer.of(spark)
    val stored = mat.eager(storedManifest
      .select(col(partitionCol), col("n_rows"), col("content_sum"),
        col("min_id"), col("max_id")))
    val dropped = stored.filter(coalesce(dropPredicate, lit(false)))
    val droppedVals = dropped.select(col(partitionCol)).collect()
      .map(_.get(0)).toSeq
    if (droppedVals.isEmpty)
      return stored.withColumn("dropped", lit(false))
        .withColumn("matched", lit(true))
    val hConf = spark.sessionState.newHadoopConf()
    val relPath = new org.apache.hadoop.fs.Path(dir)
    val fs = relPath.getFileSystem(hConf)
    val relQ = fs.makeQualified(relPath)
    val arcQ = fs.makeQualified(new org.apache.hadoop.fs.Path(archiveDir))
    fs.mkdirs(arcQ)
    def listAll(root: org.apache.hadoop.fs.Path): Set[String] = {
      if (!fs.exists(root)) return Set.empty
      val it = fs.listFiles(root, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().getPath.toString
      b.result()
    }
    val before = listAll(relQ)
    // Spark's own Hive path encoding, value escaping and the null
    // partition's __HIVE_DEFAULT_PARTITION__ directory included
    def dirNameOf(v: Any): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partitionCol,
          Option(v).map(_.toString).getOrElse(""))
    var moved = Set.empty[String]
    val movedDirs = droppedVals.map { v =>
      val name = dirNameOf(v)
      val src = new org.apache.hadoop.fs.Path(relQ, name)
      val dst = new org.apache.hadoop.fs.Path(arcQ, name)
      if (!fs.exists(src)) throw new IllegalStateException(
        s"retention: partition directory $src is missing but the stored " +
          "manifest attests rows there — re-attest before retiring")
      if (fs.exists(dst)) throw new IllegalStateException(
        s"retention: archive already contains $dst — refusing to " +
          "overwrite a previous retirement; choose a fresh archive dir")
      moved ++= listAll(src)
      if (!fs.rename(src, dst)) throw new IllegalStateException(
        s"retention: rename $src -> $dst failed; release is untouched " +
          "for this partition, halt and inspect the filesystem")
      dst.toString
    }
    val after = listAll(relQ)
    val drift = (after diff (before diff moved)) ++ ((before diff moved) diff after)
    if (drift.nonEmpty) throw new IllegalStateException(
      s"retention: kept partitions changed during the archive moves " +
        s"(${drift.size} file(s), e.g. ${drift.head}) — the stored " +
        "manifest no longer attests the release; halt and re-attest")
    // O(dropped) verification: the archived bytes must BE the stored
    // rows that left
    val archivedM = manifest(
      spark.read.option("basePath", arcQ.toString).parquet(movedDirs: _*),
      partitionCol, idCol, textCol)
    val zero = lit(0L).cast("decimal(38,0)")
    def arm(m: DataFrame, tag: String): DataFrame =
      m.select(col(partitionCol), col("n_rows").as(s"__n_$tag"),
        col("content_sum").cast("decimal(38,0)").as(s"__s_$tag"))
    val verdicts = fullJoinNullSafe(arm(dropped, "d"), arm(archivedM, "a"),
        partitionCol)
      .select(col(partitionCol),
        coalesce(col("__n_d") === col("__n_a") &&
            coalesce(col("__s_d"), zero) === coalesce(col("__s_a"), zero),
          lit(false)).as("__arch_ok"))
    stored
      .withColumn("dropped", coalesce(dropPredicate, lit(false)))
      .join(verdicts.withColumnRenamed(partitionCol, "__vp"),
        col(partitionCol) <=> col("__vp"), "left")
      .withColumn("matched",
        when(col("dropped"), coalesce(col("__arch_ok"), lit(false)))
          .otherwise(lit(true)))
      .drop("__vp", "__arch_ok")
  }
}
