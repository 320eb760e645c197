package graft.ops

import graft.T
import graft.T.{Q, q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-B — projection, filter, predicates.
  * Catalog queries filter by schema/type flags (dbsuite input plugins [P2]);
  * all predicates here are Catalyst-pushable built-ins.
  */
object GroupFilter {

  val defs: Seq[Q] = Seq(
    // (l_orderkey, l_linenumber) is NOT unique in the fixtures — ordering by
    // every projected column makes remaining ties identical rows.
    q("filter_pred_simple",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""") { (s, dir) =>
      T.t(s, dir, "lineitem")
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    },

    q("filter_pred_compound",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |WHERE (l_returnflag IN ('A','R') OR NOT (l_linestatus = 'O')) AND l_tax > 0.02
        |GROUP BY 1,2 ORDER BY 1,2""") { (s, dir) =>
      T.t(s, dir, "lineitem")
        .filter((col("l_returnflag").isin("A", "R") || !(col("l_linestatus") === "O"))
          && col("l_tax") > 0.02)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Common-subset regex only (Java and RE2 agree): no backrefs/lookaround.
    q("filter_like_regex",
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'PROMO%' OR regexp_matches(p_name, '^(green|red) ')
        |ORDER BY p_partkey""") { (s, dir) =>
      T.t(s, dir, "part")
        .filter(col("p_type").like("PROMO%") || col("p_name").rlike("^(green|red) "))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },

    // Three-valued logic over outer-join nulls + null-safe equality (<=>).
    q("filter_null_semantics",
      """SELECT CASE WHEN l.l_orderkey IS NULL THEN 'no_items' ELSE 'has_items' END AS cls,
        |  count(*) AS cnt, count(l.l_quantity) AS nonnull_qty,
        |  CAST(SUM(CASE WHEN l.l_returnflag IS NOT DISTINCT FROM 'A' THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_a
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      T.t(s, dir, "orders")
        .join(T.t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          when(col("l_orderkey").isNull, "no_items").otherwise("has_items").as("cls"),
          col("l_quantity"), col("l_returnflag"))
        .groupBy("cls")
        .agg(
          count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("nonnull_qty"),
          sum(when(col("l_returnflag") <=> "A", 1).otherwise(0)).cast(LongType).as("nullsafe_a"))
        .orderBy("cls")
    },

    q("project_expressions",
      """WITH r AS (SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS revenue
        |  FROM lineitem)
        |SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS line_id,
        |  CAST(revenue AS DOUBLE) AS revenue,
        |  CASE WHEN revenue < 1000 THEN 'low'
        |       WHEN revenue < 10000 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  l_orderkey, l_linenumber
        |FROM r ORDER BY l_orderkey, l_linenumber, revenue LIMIT 500""") { (s, dir) =>
      T.t(s, dir, "lineitem")
        .withColumn("revenue",
          (col("l_extendedprice").cast(T.dec) * (lit(1).cast(T.dec) - col("l_discount").cast(T.dec)))
            .cast(T.dec))
        .withColumn("band",
          when(col("revenue") < 1000, "low")
            .when(col("revenue") < 10000, "mid")
            .otherwise("high"))
        .withColumn("revenue", col("revenue").cast(DoubleType))
        .withColumn("line_id",
          concat(col("l_orderkey").cast(StringType), lit("-"), col("l_linenumber").cast(StringType)))
        .select("line_id", "revenue", "band", "l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber", "revenue")
        .limit(500)
    }
  )
}
