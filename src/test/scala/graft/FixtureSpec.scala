package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture drift guard (VERDICT r9 next-round #4).
  *
  * The round-9 testdata regen silently switched `events.ts` from INT64
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) after the last builder commit,
  * breaking 64 keys with nothing red in the repo. This spec pins the LOADED
  * Spark schema of all 10 fixture tables at all three scales, the per-scale
  * row counts, and the documented content invariants (FIXTURES.md: 8
  * exact-duplicate texts at sf0.1, 2,764 orphan orders at sf0.1, 1,500
  * distinct event users at sf0.1) so the next drift fails HERE with a
  * message naming the table and column, not as 64 silent absences in the
  * driver's correctness artifact.
  *
  * Type assertions are capability-based, not encoding-based: a column may
  * legitimately arrive under any parquet physical encoding the readers
  * handle (events.ts: legacy INT64-nanos loads as LongType via the
  * nanosAsLong flag, micros loads as a timestamp — T.t branches on both),
  * so each column pins a FAMILY of acceptable Spark types.
  */
class FixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private def isTimestampy(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
  // events.ts: both known encodings are fine — anything else is drift
  private def isEventsTs(dt: DataType): Boolean =
    dt == LongType || isTimestampy(dt)

  /** column -> acceptable-type predicate with a readable expectation label */
  private type ColPin = (String, DataType => Boolean, String)
  private def exact(n: String, dt: DataType): ColPin =
    (n, (d: DataType) => d == dt, dt.simpleString)
  private def key(n: String): ColPin =
    (n, integral.contains _, "int or bigint")
  private def ts(n: String): ColPin =
    (n, isTimestampy _, "timestamp or timestamp_ntz")

  private val pins: Map[String, Seq[ColPin]] = Map(
    "region" -> Seq(key("r_regionkey"), exact("r_name", StringType)),
    "nation" -> Seq(key("n_nationkey"), exact("n_name", StringType),
      key("n_regionkey")),
    "customer" -> Seq(key("c_custkey"), exact("c_name", StringType),
      key("c_nationkey"), exact("c_acctbal", DoubleType),
      exact("c_mktsegment", StringType)),
    "supplier" -> Seq(key("s_suppkey"), exact("s_name", StringType),
      key("s_nationkey"), exact("s_acctbal", DoubleType)),
    "part" -> Seq(key("p_partkey"), exact("p_name", StringType),
      exact("p_brand", StringType), exact("p_type", StringType),
      key("p_size"), exact("p_retailprice", DoubleType)),
    "orders" -> Seq(key("o_orderkey"), key("o_custkey"),
      exact("o_orderstatus", StringType), exact("o_totalprice", DoubleType),
      ts("o_orderdate"), exact("o_orderpriority", StringType)),
    "lineitem" -> Seq(key("l_orderkey"), key("l_partkey"), key("l_suppkey"),
      key("l_linenumber"), exact("l_quantity", DoubleType),
      exact("l_extendedprice", DoubleType), exact("l_discount", DoubleType),
      exact("l_tax", DoubleType), exact("l_returnflag", StringType),
      exact("l_linestatus", StringType), ts("l_shipdate")),
    "events" -> Seq(key("event_id"),
      ("ts", isEventsTs _, "bigint (legacy nanos) or timestamp"),
      key("user_id"), exact("event_type", StringType),
      exact("value", DoubleType), exact("props", StringType)),
    "documents" -> Seq(key("doc_id"), exact("text", StringType),
      exact("lang", StringType), exact("source", StringType),
      key("n_chars")),
    "embeddings" -> Seq(key("vec_id"),
      exact("embedding", ArrayType(FloatType)), key("label")))

  private val rowCounts: Map[String, Map[String, Long]] = Map(
    "sf0.001" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.01" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 1500L,
      "supplier" -> 100L, "part" -> 2000L, "orders" -> 15000L,
      "lineitem" -> 60000L, "events" -> 10000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.1" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 15000L,
      "supplier" -> 1000L, "part" -> 20000L, "orders" -> 150000L,
      "lineitem" -> 600000L, "events" -> 100000L, "documents" -> 5000L,
      "embeddings" -> 2000L))

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    val dir = s"/root/testdata/$sf"

    test(s"$sf: all 10 tables load with pinned schema families") {
      // raw read (not T.t) so the pin sees the file's own encoding; the
      // nanosAsLong flag mirrors T.t so a legacy-nanos events file loads
      // instead of throwing PARQUET_TYPE_ILLEGAL before we can name it
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      for ((table, cols) <- pins.toSeq.sortBy(_._1)) {
        val schema = spark.read.parquet(s"$dir/$table.parquet").schema
        val names = schema.fieldNames.toSeq
        val expected = cols.map(_._1)
        assert(names == expected,
          s"FIXTURE DRIFT [$sf/$table]: columns $names != documented $expected")
        for ((name, ok, want) <- cols) {
          val got = schema(name).dataType
          assert(ok(got),
            s"FIXTURE DRIFT [$sf/$table.$name]: loaded type " +
              s"${got.simpleString}, expected $want — update T.t/FIXTURES.md " +
              "and re-attest every consumer before trusting green")
        }
      }
    }

    test(s"$sf: row counts match FIXTURES.md") {
      for ((table, want) <- rowCounts(sf).toSeq.sortBy(_._1)) {
        val got = spark.read.parquet(s"$dir/$table.parquet").count()
        assert(got == want,
          s"FIXTURE DRIFT [$sf/$table]: $got rows, documented $want")
      }
    }

    test(s"$sf: events reader T.t yields timestamp_ntz under either encoding") {
      val df = T.t(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampNTZType,
        s"T.t(events).ts is ${df.schema("ts").dataType.simpleString}, " +
          "expected timestamp_ntz")
      assert(df.filter("ts IS NULL").count() == 0L,
        "T.t(events) produced NULL ts values — shim/encoding mismatch")
    }
  }

  test("sf0.1 content invariants: dup texts, orphan orders, event users") {
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dupTexts = docs.groupBy("text").count().filter("count > 1").count()
    assert(dupTexts == 8L,
      s"FIXTURE DRIFT [sf0.1/documents]: $dupTexts duplicated texts, " +
        "documented 8 — dedup oracles are fixture-anchored")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val orphans = orders.join(li,
      orders("o_orderkey") === li("l_orderkey"), "left_anti").count()
    assert(orphans == 2764L,
      s"FIXTURE DRIFT [sf0.1/orders]: $orphans orphan orders, documented 2764")
    val users = T.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(users == 1500L,
      s"FIXTURE DRIFT [sf0.1/events]: $users distinct users, documented 1500")
  }
}
