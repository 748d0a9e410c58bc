package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving for multi-dimensional data clustering.
  *
  * Sorting a rewrite by `morton2(a, b)` gives every output file a tight
  * bounding box in BOTH dimensions, so parquet min/max stats prune files
  * for predicates on either column — a single-column sort only narrows its
  * own column. This is the clustering trick behind every lakehouse
  * OPTIMIZE ZORDER; here it feeds StageCompactor so per-device AND
  * per-time queries both skip files.
  *
  * Built entirely from codegen'd bit-twiddling built-ins (shifts, masks,
  * or) — the classic magic-number bit spread, no UDF.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` so bit i lands at position 2i. */
  private def spread(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xffffffffL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of two non-negative 32-bit values (a in even bits, b in
    * odd). Inputs are masked to 32 bits; callers with wider domains should
    * quantize first (e.g. epoch seconds → minutes). */
  def morton2(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Reference implementation for tests. */
  def morton2Ref(a: Int, b: Int): Long = {
    def spreadRef(x: Long): Long = {
      var v = x & 0xffffffffL
      v = (v | (v << 16)) & 0x0000ffff0000ffffL
      v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v << 2)) & 0x3333333333333333L
      (v | (v << 1)) & 0x5555555555555555L
    }
    spreadRef(a.toLong & 0xffffffffL) | (spreadRef(b.toLong & 0xffffffffL) << 1)
  }
}
