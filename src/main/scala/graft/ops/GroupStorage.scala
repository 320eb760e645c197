package graft.ops

import graft.T
import graft.T.{Q, q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-layout & shuffle-avoidance operators beyond §2-A: the techniques
  * that decide whether a 100 TB join shuffles 100 TB or nothing —
  * columnar-format interchange (ORC), bucketed co-located joins, and
  * salt-replicated joins for skewed keys.
  */
object GroupStorage {

  val defs: Seq[Q] = Seq(
    q("source_orc_roundtrip",
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_custkey""") { (s, dir) =>
      val out = T.staged("orc", dir) { o =>
        T.t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
          .write.mode("overwrite").orc(o) }
      s.read.orc(out).orderBy("c_custkey")
    },

    // Avro interchange without the spark-avro connector (absent from this
    // environment — see sources/AvroIO.scala): per-partition container-file
    // writers + file-parallel streaming readers over the avro core jar.
    q("source_avro_roundtrip",
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_custkey""") { (s, dir) =>
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_mktsegment", StringType)))
      val out = T.staged("avro", dir) { o =>
        val n = graft.sources.AvroIO.writeAvro(
          T.t(s, dir, "customer")
            .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
          o, "c_custkey", 4)
        require(n > 0, "avro write produced no rows")
      }
      graft.sources.AvroIO.readAvro(s, out, schema).orderBy("c_custkey")
    },

    q("source_text_lines",
      """SELECT count(*) AS n_lines, CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM documents""") { (s, dir) =>
      val out = T.staged("text", dir) { o =>
        T.t(s, dir, "documents").select("text").write.mode("overwrite").text(o) }
      s.read.text(out)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).cast(LongType).as("n_chars"))
    },

    // Both sides bucketed by the join key into the same bucket count ⇒ the
    // join is co-located: no exchange on either input (asserted by
    // PlanShapeSpec). At 100 TB this is the difference between shuffling
    // the fact table on every join and shuffling it once at load time.
    q("bucketed_join_colocated",
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      // table names carry the sfDir hash: the staged-once memo is keyed by
      // (tag, sfDir), so the catalog tables must be per-sfDir too — shared
      // names would let a second sfDir in the same JVM poison the first
      val suffix = (dir.hashCode & Int.MaxValue).toString
      val ordersTbl = s"graft_orders_b_$suffix"
      val custTbl = s"graft_customer_b_$suffix"
      T.staged("bucketed", dir) { _ =>
        s.sql(s"DROP TABLE IF EXISTS $ordersTbl")
        s.sql(s"DROP TABLE IF EXISTS $custTbl")
        // repartition(8, key) before the bucketed write: repartition and
        // bucketing share the murmur3-pmod placement, so with numPartitions
        // = bucket count every task holds exactly one bucket → ONE file per
        // bucket. That's the condition under which the scan reports the
        // sortBy order back to the planner and an SMJ read needs neither
        // Exchange NOR Sort (pinned by PlanShapeSpec); multi-file buckets
        // would silently re-sort on every read.
        T.t(s, dir, "orders").repartition(8, col("o_custkey"))
          .write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable(ordersTbl)
        T.t(s, dir, "customer").repartition(8, col("c_custkey"))
          .write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable(custTbl)
      }
      s.table(ordersTbl)
        .join(s.table(custTbl), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), T.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    },

    // Transitive closure of the containment hierarchy (customer/supplier →
    // nation → region) by iterative join-until-fixpoint — the Spark shape of
    // the reference's dependency-graph traversal (view→table→tablespace
    // edges in the dbsuite object model [P2]; SURVEY.md §7 candidate).
    // Each iteration is one distributed self-join; the driver only checks
    // the (tiny) new-pair count for termination.
    q("graph_transitive_closure",
      """WITH RECURSIVE e AS (
        |  SELECT n_name AS src, r_name AS dst FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        |tc AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT tc.src, e.dst FROM tc JOIN e ON tc.dst = e.src)
        |SELECT src, dst FROM tc ORDER BY src, dst""") { (s, dir) =>
      val nation = T.t(s, dir, "nation")
      val edges = T.t(s, dir, "region")
        .join(nation, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("src"), col("r_name").as("dst"))
        .unionByName(T.t(s, dir, "customer").join(nation, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_name").as("src"), col("n_name").as("dst")))
        .unionByName(T.t(s, dir, "supplier").join(nation, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name").as("src"), col("n_name").as("dst")))
      // Eager localCheckpoint per iteration: without it every `count()` and
      // the final sort re-derive the ENTIRE iteration lineage from the
      // parquet scans (measured 9 s steady-state; ~2.5 s with truncation).
      // On a real cluster this would be `checkpoint()` to durable storage —
      // same plan shape, executor-local blocks suffice in local mode.
      // Checkpoints are LAZY (r16): truncation is what matters (the 9 s →
      // 2.5 s note above); materialization rides the next consuming job
      // (the limit-probe / next round's except) instead of a dedicated
      // caching job per generation — 2 fewer jobs per iteration.
      val e = edges.distinct().localCheckpoint(false)
      var closure = e
      var frontier = e
      var grew = true
      var iter = 0
      while (grew && iter < 10) {
        val next = frontier
          .join(e.select(col("src").as("m"), col("dst").as("d2")), col("dst") === col("m"))
          .select(col("src"), col("d2").as("dst"))
          .except(closure)
          .localCheckpoint(false)
        grew = next.limit(1).count() > 0
        if (grew) {
          closure = closure.union(next).distinct().localCheckpoint(false)
          frontier = next
        }
        iter += 1
      }
      closure.orderBy("src", "dst")
    },

    // Salting for skewed keys: the fact side gets a deterministic salt,
    // the dim side is replicated across all salt values, and the join key
    // becomes (key, salt) — a hot key now spreads over 8 partitions.
    // Result is provably identical to the unsalted join (the oracle).
    q("join_skew_salted",
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val salts = 8
      val fact = T.t(s, dir, "lineitem")
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")), lit(salts)).cast(IntegerType))
      val dim = T.t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .crossJoin(s.range(salts).select(col("id").cast(IntegerType).as("salt")))
      fact.join(dim, col("l_orderkey") === col("o_orderkey") && fact("salt") === dim("salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), T.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }
  )
}
