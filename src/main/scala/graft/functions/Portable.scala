package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, cross-engine-portable building blocks.
  *
  * Every query in `SparkEntry.queries` is verified against a DuckDB oracle
  * by exact value comparison, so anything numeric that feeds a result
  * column must evaluate to bit-identical values in both engines:
  *
  *  - money / quantity aggregation goes through DECIMAL(18,2) so sums are
  *    exact (order-independent) and the final `CAST(AS DOUBLE)` is the
  *    same nearest-double on both sides;
  *  - string hashing uses the first 60 bits of MD5 (`phash64`), the one
  *    hash primitive expressible in both Spark (`conv(substr(md5),16,10)`)
  *    and DuckDB (`('0x' || substr(md5,1,15))::BIGINT`).
  *
  * At cluster scale these choices also matter for correctness: double
  * summation is order-dependent and Spark's partial aggregation order is
  * nondeterministic, so exact decimal aggregation is what you'd use for
  * financial rollups on 100 TB anyway.
  */
object Portable {
  /** Exact 2-decimal view of a double column (inputs are 2-dp by data contract). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double: deterministic in both engines. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** sum(price * (1 - discount)) with exact decimal arithmetic. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1).cast(DecimalType(18, 2)) - dec2(discount))).cast("double")

  /** Order-independent sum of a double expression, rounded to 6 decimals
    * first: the rounded values are exact DECIMAL(28,6), so the aggregate
    * is associative and engine-portable even when the addends come from
    * transcendental math (ln in BM25 idf may differ between libm
    * implementations in the last ulp — far below the 6-dp quantum).
    * DuckDB equivalent: CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE).
    */
  def detSum6(c: Column): Column =
    sum(round(c, 6).cast(DecimalType(28, 6))).cast("double")

  /** Portable 60-bit hash of a string: first 15 hex chars of MD5 as a long.
    * DuckDB equivalent: ('0x' || substr(md5(x),1,15))::BIGINT
    *
    * Evaluated by the native codegen'd [[graft.plans.Phash64]] expression
    * (one digest, no hex/decimal string round-trips — this is the hottest
    * scalar in the dedup/text family); [[phash64Legacy]] keeps the
    * function-composition form the PropertySpec equivalence law compares
    * against.
    */
  def phash64(c: Column): Column = graft.plans.Phash64(c)

  /** The original builtin-composition form of [[phash64]] (hex string →
    * substring → base-16 parse) — retained as the law-test reference.
    */
  private[graft] def phash64Legacy(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** SQL fragment of [[phash64]] for DuckDB oracle strings. */
  def phash64Sql(expr: String): String =
    s"CAST(('0x' || substr(md5(CAST($expr AS VARCHAR)),1,15)) AS BIGINT)"
}
