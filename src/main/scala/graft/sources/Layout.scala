package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering at write
  * time so selective multi-column predicates skip files and row groups.
  *
  * Range-partitioning by ONE column gives perfect pruning on that column
  * and none on any other; interleaving the bits of several columns into
  * one Morton key and range-partitioning by THAT bounds every listed
  * column's span within each file. Parquet keeps per-column min/max on
  * every file footer and row group, so a 2-D box predicate over a
  * z-ordered table reads only the files whose bounding boxes intersect
  * the box — at 100 TB the difference between scanning the table and
  * scanning a few percent of it (the layout trick of Delta/Iceberg
  * OPTIMIZE ZORDER, built from public Spark primitives).
  *
  * The key is pure integer bit arithmetic (shifts/masks — identical in
  * any engine, no float boundary) and the write is one range exchange;
  * clustering quality is asserted by measured per-file bounding boxes in
  * ScaleOpsSpec. */
object Layout {

  /** The Morton key: interleave the low `bits` bits of each column,
    * column j contributing bit i to output position `i·N + j` (lower
    * columns get the lower positions at each level). Inputs must be
    * non-negative and < 2^bits — out-of-range inputs would silently
    * alias distant keys, so cap `bits` per the data's range.
    *
    * Columns with very different ranges interleave unevenly: the wider
    * column's high bits dominate the ordering and the narrow column
    * clusters only weakly (measured in the verify drive: a 200-value ×
    * 10-value pair bounds the first dimension 6× and the second not at
    * all). For balanced pruning, pre-scale each column to a comparable
    * range (e.g. its range-bucket id) before interleaving — the
    * Delta/Iceberg OPTIMIZE ZORDER preprocessing. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` z-order-clustered on `zCols` into `numFiles` parquet
    * files under `path`: one range exchange on the Morton key, a
    * per-file sort so row groups INSIDE a file cluster too, and the key
    * itself is dropped — the layout lives in the file/row-group min/max
    * stats, not in a column. */
  def zOrderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` with parquet BLOOM FILTERS on `bloomCols` — the
    * point-lookup complement to [[zOrderWrite]]'s range clustering:
    * min/max stats skip row groups for RANGE predicates on clustered
    * columns, while bloom filters skip them for EQUALITY predicates on
    * high-cardinality columns that no sort order helps (the id-lookup /
    * needle-in-100TB case). Spark's vectorized parquet reader consults
    * the filters automatically on `col = literal` pushdown; `fpp` and
    * `ndv` size each filter (parquet's split-block bloom,
    * ~1.2 bytes/value at 1% fpp). Footer-verified in SourcesSpec via
    * the parquet-hadoop API that ships with Spark. */
  def bloomFilteredWrite(df: DataFrame, bloomCols: Seq[String],
                         path: String, ndv: Long = 100000L,
                         fpp: Double = 0.01): Unit = {
    require(bloomCols.nonEmpty, "bloomFilteredWrite needs >= 1 column")
    val w = df.write.mode("overwrite")
    val configured = bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.bloom.filter.fpp#$c", fpp.toString)
    }
    configured.parquet(path)
  }

  /** Compact a parquet directory's files toward `targetBytes` outputs —
    * the maintenance pass every streaming/incremental sink needs:
    * micro-batch and per-task writes accumulate thousands of small
    * files, and at 100 TB the scan's task-per-file scheduling plus
    * footer reads dominate long before the data does (the
    * Delta/Iceberg OPTIMIZE role, from public Spark primitives).
    *
    * The output file count derives from the LIVE byte total (one
    * driver-side file listing — bounded metadata), never a config:
    * ⌈Σbytes / targetBytes⌉ files. Without `sortCol` the rewrite is a
    * `coalesce` — narrow, zero-shuffle bin-packing of existing
    * partitions. With `sortCol` it is one range exchange that also
    * re-establishes clustering (re-tightening min/max pruning the way
    * [[zOrderWrite]] does at first write).
    *
    * Swap protocol: write to a sibling temp dir, rename the original
    * aside, rename the rewrite in, delete the original — a failed
    * swap-in restores the original and throws. Not atomic (HDFS
    * renames are; object-store renames are not) — concurrent readers
    * mid-swap see the old OR new listing, both complete; concurrent
    * WRITERS to the directory are the caller's exclusion to hold.
    * Returns (files_before, files_after). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L << 20,
              sortCol: Option[String] = None): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"compact: no parquet files under $path")
    val total = files.map(_.getLen).sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val rewrite = sortCol match {
      case Some(c) =>
        df.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case None =>
        // coalesce is the zero-shuffle path, but it can only REDUCE the
        // scan's partition count — and a small-file scan packs many
        // files into few input partitions (maxPartitionBytes), so when
        // the scan under-partitions the target, fall back to a
        // round-robin shuffle (cheap by definition: the total is small
        // enough that more files were wanted)
        if (df.rdd.getNumPartitions >= nOut) df.coalesce(nOut)
        else df.repartition(nOut)
    }
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "__compact_old")
    rewrite.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old)) throw new IllegalStateException(
      s"compact: could not move $path aside — directory left untouched")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore; the rewrite stays in tmp for debugging
      throw new IllegalStateException(
        s"compact: swap-in failed — original restored, rewrite at $tmp")
    }
    fs.delete(old, true)
    val after = fs.listStatus(p)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Snapshot diff between two versions of a keyed dataset: which rows
    * were added, removed, or changed (and in which columns) — the
    * dataset-versioning primitive behind "what moved between crawl N
    * and crawl N+1", audit trails for a training-mix freeze, and
    * incremental downstream refresh (only re-embed the changed docs).
    *
    * Scale shape: ONE key-partitioned full-outer join is the whole
    * cost; both sides pre-project to key + compared columns only, and
    * unchanged rows — the overwhelming majority between adjacent
    * snapshots — are filtered out BEFORE anything is emitted, so the
    * output is proportional to the churn, not the corpus. To diff wide
    * rows cheaply, pass a single precomputed fingerprint column (e.g.
    * `TextAnalysis.fingerprint`) as the compare set: the join then
    * carries one hash per side instead of the full payload.
    * Change detection is null-safe (`<=>`): null→value and value→null
    * are changes, null→null is not. Output: (keyCols..., status ∈
    * added|removed|changed, changed_cols — comma-joined in `compareCols`
    * order, empty for added/removed — and n_changed). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select(keyCols.map(col) ++
      (lit(true).as("__old") +:
        compareCols.map(c => col(c).as(s"__o_$c"))): _*)
    val n = newDf.select(keyCols.map(col) ++
      (lit(true).as("__new") +:
        compareCols.map(c => col(c).as(s"__n_$c"))): _*)
    val j = o.join(n, keyCols, "full_outer")
    def diff(c: String): Column = !(col(s"__o_$c") <=> col(s"__n_$c"))
    val anyDiff = compareCols.map(diff).reduce(_ || _)
    val changed = col("status") === "changed"
    j.withColumn("status",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(anyDiff, "changed"))
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(changed, concat_ws(",",
          compareCols.map(c => when(diff(c), lit(c))): _*))
          .otherwise(lit("")))
      .withColumn("n_changed",
        when(changed, compareCols.map(c =>
            when(diff(c), lit(1)).otherwise(lit(0))).reduce(_ + _))
          .otherwise(lit(0)))
      .select(keyCols.map(col) ++ Seq(col("status"),
        col("changed_cols"), col("n_changed")): _*)
  }
}
