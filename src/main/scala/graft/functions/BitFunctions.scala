package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bitstring scalar functions — reference
  * /root/reference/extension/core_functions/scalar/bit/bitstring.cpp.
  *
  * Spark has no BIT type; graft's bitstring representation is a '0'/'1'
  * character string (the same encoding `bitstring_agg` emits — see
  * Extensions.scala). Semantics mirror the reference: `get_bit` indexes
  * from the LEFT starting at 0; `set_bit` returns a new bitstring;
  * `bit_position` returns the 1-based index of the first occurrence of
  * the bit substring, 0 when absent. All are pure column algebra —
  * codegen'd, no UDFs.
  */
object BitFunctions {

  /** Bit at `pos` (0-based from the left), as 0/1. */
  def get_bit(bits: Column, pos: Column): Column =
    substr(bits, pos + lit(1), lit(1)).cast("long")

  /** Copy of `bits` with the bit at `pos` (0-based) set to `value`. */
  def set_bit(bits: Column, pos: Column, value: Column): Column =
    concat(
      substr(bits, lit(1), pos),
      value.cast("string"),
      substr(bits, pos + lit(2), length(bits) - pos - lit(1)))

  /** 1-based index of the first occurrence of `sub` in `bits`; 0 if absent. */
  def bit_position(sub: Column, bits: Column): Column =
    call_function("instr", bits, sub).cast("long")
}
