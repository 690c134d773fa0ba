package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Harness-table access: one parquet dir per table (see /root/repo/TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst's vectorized parquet
  * reader, predicate pushdown and column pruning apply — callers should
  * `.select`/`.filter` early so the scan only materializes what it needs.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations, normalized here to a session-TZ TIMESTAMP so every
    * downstream query sees one type:
    *  - TIMESTAMP(NANOS): Spark only reads it with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in our sessions);
    *    it arrives as a long and we truncate ns → µs with INTEGER division
    *    (`div`) — float division would lose precision above 2^53 ns —
    *    matching DuckDB's own ns→µs truncation.
    *  - TIMESTAMP_MICROS without isAdjustedToUTC: Spark reads TIMESTAMP_NTZ,
    *    which `unix_micros`/window ranges reject. The cast to TIMESTAMP
    *    interprets the wall-clock value in the session time zone — UTC in
    *    every graft session — so it is numerically a no-op and matches
    *    DuckDB, which reads the same file as a plain TIMESTAMP. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                  => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
