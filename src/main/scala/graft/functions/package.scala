package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared by operators.
  *
  * Cross-engine determinism: the driver hash-compares our parquet output
  * against DuckDB executing the same SQL. Floating-point SUMs are
  * order-dependent in the last bits, so any aggregate over doubles goes
  * through an exact decimal: each input value is cast to DECIMAL (per-value
  * cast is deterministic — exact decimal ties are not representable in
  * binary doubles at scale 4), summed exactly, then cast back to double
  * (correctly-rounded in both engines). Mirror the same casts in oracle SQL.
  */
package object functions {

  /** Order-independent, cross-engine-exact sum of a double column. */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(s"decimal($precision,$scale)")).cast("double")

  /** Matching exact average: exact decimal sum / count. */
  def davg(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(s"decimal($precision,$scale)")).cast("double") / count(c)

  /** DuckDB oracle fragment equivalent to [[dsum]]. */
  def dsumSql(col: String, precision: Int = 18, scale: Int = 4): String =
    s"CAST(SUM(CAST($col AS DECIMAL($precision,$scale))) AS DOUBLE)"

  /** DuckDB oracle fragment equivalent to [[davg]]. */
  def davgSql(col: String, precision: Int = 18, scale: Int = 4): String =
    s"CAST(SUM(CAST($col AS DECIMAL($precision,$scale))) AS DOUBLE) / COUNT($col)"
}
