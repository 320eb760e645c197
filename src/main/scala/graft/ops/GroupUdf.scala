package graft.ops

import graft.T
import graft.T.{Q, q}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-J — the UDF / UDAF / UDTF extension surface.
  * The reference decodes coded catalog columns in Python [P2]; here each
  * extension mechanism is demonstrated once. Production guidance stays
  * "built-ins first" — scalar UDFs are opaque to Catalyst — so each UDF's
  * logic is also expressible as the oracle's plain SQL.
  */
object GroupUdf {

  /** Exact weighted mean of l_discount weighted by l_quantity. Buffer keeps
    * integer cents (both inputs are exact 2dp — FIXTURES.md), so the merge is
    * order-independent: Σ(disc_c·qty_c) and Σqty_c as longs, one double
    * division at finish. Round 6dp to absorb the final cast ulp.
    */
  private object WeightedDiscount
      extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val discC = Math.round(in._1 * 100) // exact: 2dp data
      val qtyC = Math.round(in._2 * 100)
      (b._1 + discC * qtyC, b._2 + qtyC)
    }
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Long, Long)): Double = {
      val wx = r._1.toDouble / 1e4 // Σ disc*qty, exact decimal scale 4
      val w = r._2.toDouble / 1e2  // Σ qty, exact decimal scale 2
      BigDecimal(wx / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Seq[Q] = Seq(
    q("udf_scalar",
      """SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS prank, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val priorityRank = udf { sp: String =>
        if (sp == null || sp.isEmpty || !sp.charAt(0).isDigit) -1
        else sp.charAt(0) - '0'
      }
      s.udf.register("priority_rank", priorityRank)
      T.t(s, dir, "orders")
        .withColumn("prank", priorityRank(col("o_orderpriority")))
        .groupBy("prank")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("prank")
    },

    q("udaf_typed_aggregator",
      """SELECT l_returnflag,
        |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS wavg_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val wm = udaf(WeightedDiscount)
      T.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wm(col("l_discount"), col("l_quantity")).as("wavg_disc"))
        .orderBy("l_returnflag")
    },

    // Expression-level UDTF: the codegen'd `bigrams` collection expression
    // (graft.functions.TokenBigrams) exploded through Catalyst's own
    // Generate — the whole pipeline stays inside one WholeStageCodegen
    // span (PlanShapeSpec pin). Round 7 used a Dataset.flatMap closure
    // here, which broke the codegen span and paid an Encoder round-trip
    // per row; a bespoke Generator subclass would only re-implement the
    // iteration Explode already provides.
    q("udtf_generator",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |b AS (SELECT unnest(list_transform(range(len(arr)-1), i -> arr[i+1] || ' ' || arr[i+2])) AS bigram
        |      FROM d)
        |SELECT bigram, count(*) AS cnt FROM b
        |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""") { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      T.t(s, dir, "documents")
        .select(explode(call_function("bigrams", col("text"))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    }
  )
}
