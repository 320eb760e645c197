package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory) and
  * the harness notes in §5/Appendix A. Every implemented §2 key is registered
  * in `queries`; SQL-expressible keys also in `oracleSql` (DuckDB dialect,
  * running against the same parquet tables registered as plain view names).
  */
object SparkEntry {

  /** All query groups, in SURVEY.md §2 order. */
  private val groups: Seq[Seq[T.Q]] = Seq(
    ops.Flagship.defs,
    ops.GroupScan.defs,     // §2-A scans, sources, sinks
    ops.GroupFilter.defs,   // §2-B projection, filter, predicates
    ops.GroupJoin.defs,     // §2-C joins
    ops.GroupAgg.defs,      // §2-D aggregation
    ops.GroupWindow.defs,   // §2-E window functions
    ops.GroupSortSet.defs,  // §2-F sort / limit / set ops
    ops.GroupScalar.defs,   // §2-G scalar functions
    ops.GroupText.defs,     // §2-H text analysis / dedup
    ops.GroupVector.defs,   // §2-I similarity search / vector ops
    ops.GroupUdf.defs,      // §2-J UDF / UDAF / UDTF surface
    ops.GroupStream.defs,   // §2-K streaming (batch-equivalent declared forms)
    ops.GroupPipeline.defs,   // LLM-pipeline extensions beyond §2 (driver mandate)
    ops.GroupStorage.defs,    // storage layout & shuffle-avoidance techniques
    ops.GroupRelational.defs, // §2-N relational depth (round 3)
    ops.GroupEtl.defs,        // §2-O ETL/maintenance surface (round 3)
    ops.GroupQuality.defs,    // §2-P data-quality constraint audits (round 4)
    ops.GroupAnalytics.defs,  // §2-Q analytics widening (round 5)
    ops.GroupScale.defs,      // §2-R pipeline-scale widening (round 6)
    ops.GroupDepth.defs,      // §2-S analytics depth (round 6)
    ops.GroupSeven.defs,      // §2-T statistics/mining/pipeline (round 7)
    ops.GroupEight.defs,      // §2-U compositions & graph depth (round 8)
    ops.GroupNine.defs,       // §2-V training-data pipeline depth (round 9)
    ops.GroupTen.defs         // §2-W observability/robust-stats/audits (round 10)
  )

  private val all: Seq[T.Q] = groups.flatten

  require(all.map(_.name).distinct.size == all.size, "duplicate query keys")

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** DuckDB-runnable ANSI SQL equivalent per oracle-checked key. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
