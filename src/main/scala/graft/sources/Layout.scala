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
}
