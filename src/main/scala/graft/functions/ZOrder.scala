package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data
  * clustering — the file-layout tool that makes min/max pruning work
  * on MORE than one column. Range-partitioning a table by one key
  * gives perfect file stats on that key and useless stats on every
  * other; interleaving the bits of k normalized keys gives each file
  * a small hyper-rectangle of the key space, so a predicate on ANY
  * of the k columns rules out most files by footer stats alone. At
  * 100 TB this is the difference between "point lookup on the
  * secondary column scans the table" and "scans a handful of files"
  * (Morton 1966; the standard lakehouse OPTIMIZE ZORDER BY design).
  *
  * All expressions are Spark built-ins (shifts and masks on longs) —
  * fully codegen'd, no UDF: normalization is
  * `(v - min) / span * (2^bits - 1)` per column (driver supplies
  * min/max from a one-row stats aggregate), then the classic
  * spread-and-or bit interleave.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so consecutive bits land 2 apart
    * (x15..x0 → 0x15 0x14 … 0x0). */
  private def spread2(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Spread the low 10 bits of `c` 3 apart (for 3-way interleave). */
  private def spread3(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x3FFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x030000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x0300F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x030C30C3L))
    x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x09249249L))
  }

  /** Normalize `c` from [min, max] to an integer bucket in
    * [0, 2^bits). NULLs map to bucket 0 (sort first — same choice as
    * NULLS FIRST range partitioning). */
  private def bucket(c: Column, min: Long, max: Long, bits: Int): Column = {
    val top = (1L << bits) - 1
    if (max <= min) lit(0L)
    else least(lit(top), greatest(lit(0L),
      round((coalesce(c.cast("double"), lit(min.toDouble)) - min)
        / (max - min).toDouble * top, 0).cast("long")))
  }

  /** Morton z-value of 2 or 3 integer columns, each normalized to its
    * [min, max]. `stats` supplies (min, max) per column in order —
    * one driver-side stats row, so the expression itself is pure
    * column arithmetic. 2 columns use 16 bits each (32-bit z), 3 use
    * 10 bits each (30-bit z) — plenty for FILE-level clustering,
    * where buckets only need to outnumber files. */
  def zvalue(cols: Seq[Column], stats: Seq[(Long, Long)]): Column = {
    require(cols.size == stats.size, "one (min,max) per z-order column")
    require(cols.size == 2 || cols.size == 3,
      s"z-order supports 2 or 3 columns, got ${cols.size}")
    if (cols.size == 2) {
      val bs = cols.zip(stats).map { case (c, (mn, mx)) => bucket(c, mn, mx, 16) }
      spread2(bs(0)).bitwiseOR(shiftleft(spread2(bs(1)), 1))
    } else {
      val bs = cols.zip(stats).map { case (c, (mn, mx)) => bucket(c, mn, mx, 10) }
      spread3(bs(0))
        .bitwiseOR(shiftleft(spread3(bs(1)), 1))
        .bitwiseOR(shiftleft(spread3(bs(2)), 2))
    }
  }
}
