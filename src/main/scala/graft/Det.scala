package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every graded query (SURVEY.md §2.0).
  *
  * Core rule: never cast a COMPUTED double to decimal — Spark rounds the
  * double's shortest decimal string, DuckDB the exact binary value, and
  * they disagree at scale boundaries. All fixture doubles carry <=2
  * fractional digits (FIXTURES.md), so casting the RAW column to
  * DECIMAL(12,2) is unambiguous in both engines; derived arithmetic then
  * stays in exact decimal.
  *
  * Output-type rule (§2.0.8, round 2): exact decimal is for the MATH
  * only — the FINAL projected column must be cast to DOUBLE on both
  * engines (decimal->double is correctly rounded in both, so equal
  * decimals render identically through the gate's asymmetric
  * pandas/duckdb read paths, which a decimal output does not).
  */
object Det {
  /** Raw fixture double column -> exact decimal. */
  def dec2(c: String): Column = col(c).cast("decimal(12,2)")
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact decimal ONE for (1 - x) / (1 + x) factors. */
  val one: Column = lit(1).cast("decimal(12,2)")

  /** lineitem revenue term: extendedprice * (1 - discount), exact. */
  def revenue: Column = dec2("l_extendedprice") * (one - dec2("l_discount"))

  /** Timestamp literal from a yyyy-MM-dd string (fixture dates are
    * midnight UTC timestamps). */
  def ts(s: String): Column = to_timestamp(lit(s))
}
