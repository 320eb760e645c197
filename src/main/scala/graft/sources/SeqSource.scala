package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A deterministic generated table as a full DataSource V2 implementation —
  * the extension surface a production connector uses (SURVEY.md §2-A,
  * `expression_custom_note` sibling for sources): `TableProvider` →
  * `ScanBuilder` with REAL column pruning (`SupportsPushDownRequiredColumns`)
  * and id-range filter pushdown (`SupportsPushDownFilters`) → one
  * `InputPartition` per planned split, so the scan parallelizes like a file
  * source and never materializes pruned columns or filtered-out id ranges.
  *
  * Schema (fixed): id BIGINT, val BIGINT, cat STRING with
  * val = (id · 2654435761) mod 1000000007 mod 1000 and cat = 'c' ∥ (id mod 7)
  * — pure integer arithmetic any engine can replay exactly, which is what
  * makes the source oracle-checkable from DuckDB's `range()`.
  *
  * Options: `rows` (total ids, default 1000), `parts` (splits, default 8).
  *
  * Pushdown contract: `id >= / > / < / <=` literals narrow the generated
  * [lo, hi) range at PLANNING time (accepted filters are consumed — Spark
  * drops the residual re-filter for them); everything else stays a
  * post-scan filter. Pruned columns are never computed: the reader emits
  * only the requested fields, in the requested order.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("cat", StringType, nullable = false)))

  def valOf(id: Long): Long = (id * 2654435761L) % 1000000007L % 1000L
  def catOf(id: Long): String = "c" + (id % 7L)
}

private class SeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts)
}

private class SeqScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SeqSource.schema
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Long) => { lo = math.max(lo, v + 1); true }
      case GreaterThanOrEqual("id", v: Long) => { lo = math.max(lo, v); true }
      case LessThan("id", v: Long) => { hi = math.min(hi, v); true }
      case LessThanOrEqual("id", v: Long) => { hi = math.min(hi, v + 1); true }
      case _ => false
    }
    pushed = accepted
    rejected // residual: Spark re-applies only these
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SeqScan(lo, hi, parts, required)
}

private class SeqScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqScan[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val p = math.max(1, parts)
    (0 until p).flatMap { i =>
      val s = lo + i * n / p
      val e = lo + (i + 1) * n / p
      if (e > s) Some(SeqPartition(s, e): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private case class SeqPartition(start: Long, end: Long) extends InputPartition

private class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "val" => SeqSource.valOf(id)
          case "cat" => UTF8String.fromString(SeqSource.catOf(id))
        })
      override def close(): Unit = ()
    }
  }
}
