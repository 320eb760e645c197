package graft.ops

import graft.T
import graft.T.{Q, q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-U (round 8) — compositions and depth over the existing
  * artifact families: IVF-PQ approximate nearest neighbor (the production
  * ANN serving shape: coarse cell pruning + product-quantized ADC scoring
  * against one persisted index), and weighted single-source shortest paths
  * (the third iterative-graph shape after pagerank and label propagation).
  *
  * Design rules follow the proven §2-T patterns: every float is rounded at
  * a deterministic 6dp boundary shared with the oracle, ranks break ties
  * on ids, and integer outputs are CAST AS BIGINT in the oracle (DuckDB
  * HUGEINT never reaches an output column — SURVEY §2 determinism rule 6).
  */
object GroupEight {

  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  val defs: Seq[Q] = Seq(

    // IVF-PQ ANN — the composition of the two persisted index artifacts
    // (vector_ivf_topk's cell-partitioned corpus, vector_pq_topk's
    // codebook+codes) into the shape production ANN engines actually
    // serve: ONE staged index holding (a) the PQ codebook (32 sub-
    // centroids: 4 subspaces × 8 candidates) and (b) each candidate's
    // 4-byte PQ code stored PARTITIONED BY its coarse IVF cell. A query
    // probes nprobe=2 cells — dynamic partition pruning opens only those
    // cell directories — and ADC-scores the codes there against its own
    // broadcast per-(m,cid) distance table. At 100 TB: the corpus is
    // never rescanned (codes are the index), the scan is cell-pruned,
    // and everything joined to it is broadcast-sized.
    q("vector_ivfpq_topk",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cent_id, e AS cent FROM v WHERE vec_id < 8),
        |cents AS (SELECT CAST(c.vec_id AS INT) AS cid, t.m,
        |    c.e[(t.m*16+1):(t.m*16+16)] AS cvec
        |  FROM v c, generate_series(0, 3) t(m) WHERE c.vec_id < 8),
        |assign AS (SELECT c_id, ce, cent_id AS cell FROM (
        |    SELECT c_id, ce, cent_id, row_number() OVER (
        |      PARTITION BY c_id ORDER BY round(list_dot_product(ce, cent), 6) DESC, cent_id) AS rn
        |    FROM (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id >= 20)
        |    CROSS JOIN cent) WHERE rn = 1),
        |code AS (SELECT c_id, cell, m, cid FROM (
        |    SELECT c_id, cell, csub.m, cid, row_number() OVER (
        |      PARTITION BY c_id, csub.m ORDER BY
        |        round(list_dot_product(sub, cvec) - 0.5 * list_dot_product(cvec, cvec), 6) DESC,
        |        cid) AS rn
        |    FROM (SELECT c_id, cell, t.m, ce[(t.m*16+1):(t.m*16+16)] AS sub
        |          FROM assign, generate_series(0, 3) t(m)) csub
        |    JOIN cents ON csub.m = cents.m) WHERE rn = 1),
        |probe AS (SELECT q_id, cent_id AS cell FROM (
        |    SELECT q_id, cent_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY round(list_dot_product(qe, cent), 6) DESC, cent_id) AS rn
        |    FROM (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 20)
        |    CROSS JOIN cent) WHERE rn <= 2),
        |qd AS (SELECT q_id, qsub.m, cid,
        |    CAST(round(list_dot_product(sub, cvec), 6) AS DECIMAL(10,6)) AS d
        |  FROM (SELECT vec_id AS q_id, t.m, e[(t.m*16+1):(t.m*16+16)] AS sub
        |        FROM v, generate_series(0, 3) t(m) WHERE vec_id < 20) qsub
        |  JOIN cents ON qsub.m = cents.m),
        |sim AS (SELECT probe.q_id, code.c_id, CAST(SUM(d) AS DOUBLE) AS sim
        |  FROM probe JOIN code ON probe.cell = code.cell
        |  JOIN qd ON qd.q_id = probe.q_id AND qd.m = code.m AND qd.cid = code.cid
        |  GROUP BY 1, 2)
        |SELECT q_id, rnk, c_id, sim FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rnk FROM sim)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""") { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = T.t(s, dir, "embeddings")
      val cent = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
      def subs(df: DataFrame, id: Column, idAs: String, vec: Column) =
        df.select(id.as(idAs), posexplode(array((0 until 4).map(m =>
          slice(vec, m * 16 + 1, 16)): _*)).as(Seq("m", "sub")))
      // ONE persisted artifact: codebook + cell-partitioned codes. Staged
      // once per dataset; later runs only read it (PqIndexSpec pattern).
      val idx = T.staged("ivfpq_index", dir) { o =>
        val cents0 = subs(e.filter(col("vec_id") < 8),
            col("vec_id").cast(IntegerType), "cid", col("embedding"))
          .select(col("cid"), col("m"), col("sub").as("cvec"))
        cents0.write.parquet(s"$o/cents")
        val assign0 = e.filter(col("vec_id") >= 20)
          .select(col("vec_id").as("c_id"), col("embedding").as("ce"))
          .crossJoin(broadcast(cent))
          .withColumn("d", round(dot(col("ce"), col("cent")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_id").orderBy(col("d").desc, col("cent_id"))))
          .filter(col("rn") === 1)
          .select(col("c_id"), col("ce"), col("cent_id").as("cell"))
        subs(assign0, col("c_id"), "c_id", col("ce"))
          .join(assign0.select("c_id", "cell"), "c_id")
          .join(broadcast(cents0), "m")
          .withColumn("score", round(dot(col("sub"), col("cvec"))
            - lit(0.5) * dot(col("cvec"), col("cvec")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_id", "m").orderBy(col("score").desc, col("cid"))))
          .filter(col("rn") === 1)
          .select("c_id", "m", "cid", "cell")
          .write.partitionBy("cell").parquet(s"$o/codes")
      }
      val cents = s.read.parquet(s"$idx/cents")
      val codes = s.read.parquet(s"$idx/codes")
        .select(col("c_id"), col("m"), col("cid"),
          col("cell").cast(LongType).as("cell"))
      val qs = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val probe = qs.crossJoin(broadcast(cent))
        .withColumn("d", round(dot(col("qe"), col("cent")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_id").orderBy(col("d").desc, col("cent_id"))))
        .filter(col("rn") <= 2)
        .select(col("q_id"), col("cent_id").as("cell"))
      val qd = subs(qs, col("q_id"), "q_id", col("qe"))
        .join(broadcast(cents), "m")
        .select(col("q_id"), col("m"), col("cid"),
          round(dot(col("sub"), col("cvec")), 6).cast(DecimalType(10, 6)).as("d"))
      // codes is the streamed side: broadcast probe triggers dynamic
      // partition pruning on the cell directories (PlanShapeSpec pin);
      // the ADC distance table qd is queries×32 rows — broadcast.
      codes.join(broadcast(probe), "cell")
        .join(broadcast(qd), Seq("q_id", "m", "cid"))
        .groupBy("q_id", "c_id")
        .agg(sum("d").cast(DoubleType).as("sim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id")))
          .cast(IntegerType))
        .filter(col("rnk") <= 5)
        .select("q_id", "rnk", "c_id", "sim")
        .orderBy("q_id", "rnk")
    },

    // Weighted single-source shortest paths on the nation trade graph —
    // the third iterative-graph shape (after pagerank's fixed-power loop
    // and label propagation's min-fold): BELLMAN-FORD FRONTIER RELAXATION.
    // Semantics are deliberately "shortest path using ≤ 6 hops" (six
    // relaxation layers), which is well-defined whether or not the graph
    // has converged — so the oracle is an exact unrolled-CTE ladder, not a
    // fixpoint claim. Edge cost is pure-integer 1 + 1000 div (1+trades):
    // heavier trade lanes are cheaper hops, every value is BIGINT, and no
    // SUM ever reaches an output column (rule 6). The Spark loop is the
    // pagerank shape: the big star join materializes ONCE
    // (localCheckpoint), then 6 iterations of edge ⋈ broadcast(dist) →
    // min-relax → rebuild. At 100 TB the dist table is node-sized — the
    // broadcast would become a keyed shuffle join; iteration count stays
    // the hop bound either way. EightSpec pins the loop against a
    // driver-side Bellman-Ford on the collected (tiny) edge list.
    q("graph_sssp_frontier", {
      // MATERIALIZED CTEs: each relaxation layer references its
      // predecessor twice (carry + relax); left inlined, DuckDB would
      // re-expand the whole ladder per reference — 2⁶ copies of the star
      // join. Materializing evaluates every layer exactly once. The relax
      // term is an uncorrelated aggregate LEFT JOIN, not a per-row
      // correlated subquery, for the same reason.
      val iter = (p: Int, c: Int) =>
        s"""d$c AS MATERIALIZED (SELECT p.node,
           |    least(p.d, coalesce(r.rd, 1000000000000000)) AS d
           |  FROM d$p p LEFT JOIN (
           |    SELECT e.dst AS nd, min(q.d + e.cost) AS rd
           |    FROM e JOIN d$p q ON q.node = e.src GROUP BY e.dst) r
           |  ON r.nd = p.node)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS cnt
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT src, dst, CAST(1 + 1000 // (1 + cnt) AS BIGINT) AS cost
         |  FROM e0 WHERE src <> dst),
         |n AS (SELECT n_nationkey AS node FROM nation),
         |d0 AS MATERIALIZED (SELECT node, CAST(CASE WHEN node = 0 THEN 0
         |    ELSE 1000000000000000 END AS BIGINT) AS d FROM n),
         |${iter(0, 1)},
         |${iter(1, 2)},
         |${iter(2, 3)},
         |${iter(3, 4)},
         |${iter(4, 5)},
         |${iter(5, 6)}
         |SELECT node, CASE WHEN d >= 1000000000000000 THEN NULL ELSE d END AS dist_6hop
         |FROM d6 ORDER BY node"""
    }) { (s, dir) =>
      val inf = 1000000000000000L
      val li = T.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = T.t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = T.t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = T.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      // one materialization of the star join (the pagerank pattern);
      // ≤ 25² weighted edges thereafter
      val e = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          expr("1L + 1000L DIV (1L + cnt)").as("cost"))
        .localCheckpoint()
      val n = T.t(s, dir, "nation").select(col("n_nationkey").as("node"))
      var dist = n.withColumn("d",
        when(col("node") === 0, lit(0L)).otherwise(lit(inf)))
      for (_ <- 1 to 6) {
        val relax = e.join(broadcast(dist), col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(min(col("d") + col("cost")).as("rd"))
        dist = n.join(broadcast(dist), "node")
          .join(broadcast(relax.withColumnRenamed("dst", "node")),
            Seq("node"), "left")
          .select(col("node"),
            least(col("d"), coalesce(col("rd"), lit(inf))).as("d"))
      }
      dist.select(col("node"),
          when(col("d") >= inf, lit(null).cast(LongType))
            .otherwise(col("d")).as("dist_6hop"))
        .orderBy("node")
    },

    // Arrival-order near-dup dedup — the batch declared form of the
    // streaming LSH dedup (graft.streaming.Streams.nearDupSurvivors +
    // sigDedup, proven replay-equal in StreamingSpec): a document SURVIVES
    // iff no earlier-arriving document (vec_id order = arrival order) is
    // within cosine 0.45 of it. Candidates ride the banded LSH equi-join
    // (recall 1.0 attested for this τ/fixture family in DedupSpec), each
    // exactly verified with the codegen'd vec_dot, so the oracle is plain
    // brute-force SQL. The survivor set is exactly what the streaming
    // state would retain: every seen signature suppresses later
    // neighbors, whether or not the seen document itself survived.
    q("stream_dedup_neardup",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings)
        |SELECT s.vec_id, s.label FROM v s
        |WHERE NOT EXISTS (SELECT 1 FROM v u WHERE u.vec_id < s.vec_id
        |  AND round(list_dot_product(u.e, s.e), 6) >= 0.45)
        |ORDER BY s.vec_id""") { (s, dir) =>
      // scoped session + small advisory partitions: the band join's output
      // is ~100× its shuffle input (see dedup_embedding_cosine's note)
      val sc = s.newSession()
      graft.functions.GraftFunctions.register(sc)
      sc.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      val e = T.t(sc, dir, "embeddings")
      val dups = graft.api.Pipelines.cosinePairsLSH(
          e, "vec_id", "embedding", threshold = 0.45)
        .select(col("ib").as("vec_id")).distinct()
      e.join(dups, Seq("vec_id"), "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    }
  )
}
