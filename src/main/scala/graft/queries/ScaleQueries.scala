package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{SkewJoin, StreamingAggregates}

/** Scale-path operators whose results must be IDENTICAL to their naive
  * forms — the oracle runs the naive SQL, the Spark side runs the
  * scale-hardened implementation, and the driver's hash compare proves the
  * rewrite is semantics-preserving.
  */
object ScaleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Salted skew join == plain equi-join (salting is internal).
    "q25_skew_join_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
      val o  = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      SkewJoin.saltedJoin(li, o, "l_orderkey", "o_orderkey", saltFactor = 8)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          round(sum(col("l_extendedprice")), 2).as("total_price"),
          count(lit(1)).as("n_items"))
    }),

    // Tumbling-window aggregation (batch form of the streaming plan).
    "q26_tumbling_window" -> ((s, d) =>
      StreamingAggregates.tumbling(Tables.events(s, d), watermark = None)),
  )

  val oracle: Map[String, String] = Map(
    "q25_skew_join_salted" ->
      """SELECT o_orderpriority AS priority,
        |  round(sum(l_extendedprice), 2) AS total_price, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q26_tumbling_window" -> StreamingAggregates.tumblingOracleSql(),
  )
}
