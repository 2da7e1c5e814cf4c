package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated star schema
  * (see TESTDATA.md / FIXTURES.md §1). One parquet file per table;
  * schemas are declared by the files themselves (parquet footer), so no
  * inference cost and full filter/column pushdown apply.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as INT64 TIMESTAMP(NANOS) parquet (which Spark's
    * vectorized reader rejects — read as raw nanos via the legacy conf and
    * narrow with lossless integer division; the generator emits
    * micro-precision values), and as TIMESTAMP(MICROS) without timezone
    * (→ TIMESTAMP_NTZ). Normalize every generation of the fixture to
    * session-tz TIMESTAMP — sessions pin UTC, so the NTZ cast is an
    * identity on the stored micros, matching DuckDB's naive read.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Register temp views for SQL-form queries, then run the SQL. */
  def sql(spark: SparkSession, dir: String, q: String, tables: String*): DataFrame = {
    tables.foreach(t => apply(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(q)
  }
}

/** Determinism conventions shared by every query (SURVEY §5.3).
  *
  * D1: no floating aggregation — sums go through DECIMAL(18,6) casts of
  *     row-level (IEEE-deterministic) double expressions; decimal addition
  *     is exact and order-independent, so shuffle/partial-agg order cannot
  *     change results.
  * D3/D4: final numeric display = ROUND(..., n) then CAST AS DOUBLE in
  *     BOTH engines — a decimal with <= n fractional digits converts to
  *     the nearest double identically everywhere, and it sidesteps
  *     Spark-vs-DuckDB decimal precision/scale widening differences.
  */
object Conv {
  val D186: DecimalType = DecimalType(18, 6)

  def dec6(c: Column): Column = c.cast(D186)

  /** Exact, order-independent SUM of a row-level double expression. */
  def sumDec6(c: Column): Column = sum(dec6(c))

  /** Final display rounding: ROUND(x, 4) AS DOUBLE (both engines). */
  def r4(c: Column): Column = round(c, 4).cast(DoubleType)

  def r6(c: Column): Column = round(c, 6).cast(DoubleType)

  /** Exact integer FLOOR division (Math.floorDiv semantics) in pure
    * long arithmetic: Spark's `div` AND DuckDB's integer `//` BOTH
    * truncate toward zero (measured: -7 // 2 = -3 in DuckDB), while the
    * streaming folds' Math.floorDiv floors — so on negative numerators
    * (pre-1970 epoch micros) a bare `div`/`//` pair agrees with itself
    * but diverges from the stateful folds; an oracle replaying a
    * negative-numerator floor must use this same pmod identity inline
    * (q132 does). pmod(n, d) is always
    * in [0, d) for d > 0, so (n - pmod(n, d)) is the largest multiple
    * of d <= n; integer `div` of that exact multiple is then the floor
    * quotient with no IEEE rounding anywhere (valid for ALL longs). */
  def floorDiv(n: Column, d: Long): Column = {
    require(d > 0, s"floorDiv divisor must be positive, got $d")
    call_function("div", n - pmod(n, lit(d)), lit(d))
  }
}
