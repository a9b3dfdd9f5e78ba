package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the 2-dimensional layout key behind
  * multi-column data skipping (Delta's OPTIMIZE ZORDER, Hudi clustering):
  * sorting by the interleaved bits of (x, y) makes any contiguous key
  * range a union of small (x, y) rectangles, so range-partitioned shards
  * get TIGHT min/max stats on BOTH columns — where a lexicographic sort
  * is tight on the first column only.
  *
  * Built from plain integer shift/and/add Columns (whole-stage codegen,
  * no UDF), and arithmetically identical to a div/mod formulation, so a
  * DuckDB CTE replays it exactly (q64).
  */
object ZOrder {

  /** 32-bit Morton code of two NON-NEGATIVE ints that fit in 16 bits
    * (caller normalizes — e.g. `pmod(key, 65536)` or a rank). Bit i of x
    * lands at position 2i, bit i of y at 2i+1. Computed in LONG: y's bit
    * 15 lands at position 31, which overflows (wraps negative) in 32-bit
    * arithmetic and would break the z ordering for the top quarter of the
    * y domain. */
  def morton16(x: Column, y: Column): Column = {
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until 16).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
