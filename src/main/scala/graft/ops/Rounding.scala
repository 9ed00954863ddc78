package graft.ops

import org.apache.spark.sql.Column

/** Binary-consistent decimal rounding: half away from zero computed on
  * the binary double — `sign(x) * floor(|x| * 10^d + 0.5) / 10^d`.
  *
  * Spark's `functions.round` goes through `BigDecimal.valueOf(double)`,
  * i.e. the SHORTEST DECIMAL STRING of the double, so a value whose
  * decimal expansion sits exactly on a rounding boundary (common when
  * inputs are finite-decimal: 51.51125 stored as 51.511249999…) rounds
  * UP while engines that round the binary value (DuckDB, and this
  * helper) round DOWN. Query entries import this as `round` so every
  * rounded column is bit-identical to the DuckDB oracle at any scale
  * factor, not just where no group lands on a boundary.
  */
object Rounding {
  // floor via `f - f % 1.0` stays in DOUBLE: floor() would return LONG
  // and saturate for |x|*10^d beyond Long range (and mangle ±Infinity),
  // where both functions.round and DuckDB return the input unchanged.
  // For f >= 2^52 the modulo is exactly 0, so huge values round to
  // themselves — matching both engines. Implemented as one native
  // expression (graft.functions.BinaryRoundExpression) so the input
  // evaluates once, not once per textual reference.
  def round(c: Column, digits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BinaryRoundExpression(
        org.apache.spark.sql.graftbridge.Bridge.expression(c.cast("double")), digits))
  def round(c: Column): Column = round(c, 0)
}
