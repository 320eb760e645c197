package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the query inventory (SURVEY.md §2).
  *
  * Determinism contract (SURVEY.md §2 preamble): every query ends with a
  * total ordering; money/quantity doubles are cast to DECIMAL(18,2) BEFORE
  * aggregation (values are exact 2dp in the fixtures — verified, FIXTURES.md);
  * averages are expressed as exact-decimal-sum cast to double divided by a
  * count (one IEEE op, identical in Spark and DuckDB).
  */
object T {
  /** Read a fixture table: one parquet per table under the sf dir.
    *
    * `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). We read it as raw nanos via
    * the legacy flag and truncate to microseconds — exactly what DuckDB does
    * when it reads the same file, so oracle values align bit-for-bit. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts DIV 1000) as timestamp_ntz)"))
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  val dec: DecimalType = DecimalType(18, 2)

  /** Exact decimal sum, result re-cast to DECIMAL(18,2) so Spark's
    * sum-widening (28,2) matches DuckDB's (38,2) after the final cast. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast(dec)

  /** Exact average as double: decimal-sum (exact) / count — a single
    * IEEE division of bit-identical operands in both engines. */
  def davg(c: Column): Column = sum(c.cast(dec)).cast(DoubleType) / count(c)

  /** One query definition: key, DataFrame builder, optional DuckDB oracle. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.stripMargin.trim))

  /** Non-SQL-expressible op: driver records a rows-only check. */
  def qNoOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
