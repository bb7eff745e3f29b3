package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data layout — the lakehouse
  * clustering trick (Delta OPTIMIZE ZORDER, Iceberg sort orders): sorting a
  * table by the bit-interleaved key of two columns gives every file a TIGHT
  * min/max envelope in BOTH dimensions, so parquet row-group stats prune
  * scans filtered on either column (a plain sort gives that for the leading
  * column only). At 100 TB this is the difference between reading one
  * z-tile and reading every file for the second predicate.
  *
  * Usage at write time: `df.repartitionByRange($"zkey")
  * .sortWithinPartitions($"zkey").write.parquet(...)` — the key never needs
  * to be stored; pruning comes from the natural columns' stats.
  *
  * Pure integer bit arithmetic (shift / mask / add), exact on any engine —
  * q40b's oracle computes the identical key with literal multipliers.
  */
object ZOrder {

  /** Bit-interleaved Morton key of two columns reduced to `bits` bits each
    * (caller masks/mods non-negative values into range; 2·bits ≤ 62).
    * Bit j of `a` lands at position 2j, bit j of `b` at 2j+1.
    */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    (0 until bits).map { j =>
      (shiftright(a.cast("long"), j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(b.cast("long"), j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)
  }
}
