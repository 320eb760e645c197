package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Batch SQL-script execution — the Spark realization of the reference's
  * `dbexec` entry point (sequential multi-statement scripts with
  * continue/abort error modes; dbsuite/main + tokenizer statement splitting
  * [P2] — reference mount empty, SURVEY.md Provenance Notice). Statements
  * run through `spark.sql`, so bulk loads are INSERT/CTAS over the
  * registered views/tables and inherit Catalyst planning.
  */
object Exec {

  sealed trait ErrorMode
  /** Stop at the first failing statement (dbexec default). */
  case object AbortOnError extends ErrorMode
  /** Record the failure and keep going (dbexec -c flag behavior). */
  case object ContinueOnError extends ErrorMode

  final case class StmtResult(
      index: Int,
      sql: String,
      ok: Boolean,
      rowCount: Long,
      error: Option[String])

  /** Split a script into statements on ';', honoring single/double-quoted
    * strings (with both `''` doubling and backslash escapes — Spark SQL's
    * default escape, `'it\'s'`), `--` line comments, and `/* */` block
    * comments (ADVICE r2: a semicolon after an escaped quote or inside a
    * block comment must not split the statement). */
  def splitStatements(script: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    val n = script.length
    var i = 0
    var quote: Char = 0
    var lineComment = false
    var blockComment = false
    while (i < n) {
      val c = script.charAt(i)
      if (lineComment) {
        if (c == '\n') { lineComment = false; cur.append(c) }
      } else if (blockComment) {
        if (c == '*' && i + 1 < n && script.charAt(i + 1) == '/') {
          // a comment is a token separator: emit one space so adjoining
          // tokens ("AS/*x*/y") don't merge into a new identifier
          blockComment = false; i += 1; cur.append(' ')
        }
      } else if (quote != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < n) { cur.append(script.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '-' if i + 1 < n && script.charAt(i + 1) == '-' =>
          lineComment = true; i += 1
        case '/' if i + 1 < n && script.charAt(i + 1) == '*' =>
          blockComment = true; i += 1
        case ';' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Execute a script statement by statement. SELECT-shaped statements
    * report their row count; DDL/DML report 0 rows. */
  def runScript(s: SparkSession, script: String,
                mode: ErrorMode = AbortOnError): Seq[StmtResult] = {
    val results = ArrayBuffer.empty[StmtResult]
    val stmts = splitStatements(script)
    var aborted = false
    stmts.zipWithIndex.foreach { case (sql, i) =>
      if (!aborted) {
        try {
          val df: DataFrame = s.sql(sql)
          val n = if (df.schema.nonEmpty) df.count() else 0L
          results += StmtResult(i, sql, ok = true, n, None)
        } catch {
          case e: Throwable =>
            results += StmtResult(i, sql, ok = false, 0L, Some(e.getMessage))
            if (mode == AbortOnError) aborted = true
        }
      }
    }
    results.toSeq
  }

  /** Execute several scripts CONCURRENTLY — the reference `dbexec`'s
    * multi-script parallelism ([P3], SURVEY §0; reference mount empty).
    * Each script stays internally sequential with its own error handling;
    * Spark's driver is thread-safe for concurrent job submission, so
    * independent scripts overlap their cluster work (FIFO scheduler by
    * default; set spark.scheduler.mode=FAIR for fair sharing). Scripts
    * share the session catalog — callers parallelize only scripts without
    * catalog write conflicts. Results return in input order. */
  def runScripts(s: SparkSession, scripts: Seq[String],
                 mode: ErrorMode = AbortOnError,
                 parallelism: Int = 4): Seq[Seq[StmtResult]] = {
    if (scripts.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, scripts.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = scripts.map(sc => scala.concurrent.Future(runScript(s, sc, mode)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }

  /** Catalog extraction — the `dbmakedoc` input-plugin analogue: the
    * SYSCAT-style metadata relation for everything visible in the session
    * catalog (database → table → column with types), as a DataFrame the
    * caller can query/join like any other relation. Rendering (HTML/TeX)
    * is out of scope per BASELINE.json. */
  def catalogColumns(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows = s.catalog.listTables().collect().flatMap { t =>
      val fq = Option(t.database).filter(_.nonEmpty).map(d => s"$d.${t.name}").getOrElse(t.name)
      s.catalog.listColumns(fq).collect().map { c =>
        (Option(t.database).getOrElse(""), t.name, t.tableType,
          c.name, c.dataType, c.nullable, c.isPartition, c.isBucket)
      }
    }
    rows.toSeq.toDF("database", "table_name", "table_type",
      "column_name", "data_type", "nullable", "is_partition", "is_bucket")
  }

  /** View→relation DIRECT dependency edges — the SYSCAT.VIEWDEP analogue of
    * the reference's dependency-graph extraction: for each view name, walk
    * its ANALYZED plan and collect the topmost `SubqueryAlias` nodes whose
    * name is a known catalog relation, without descending into them (so a
    * view-over-view reports the view it references, not the view's own
    * expansion). Expression subqueries (IN/EXISTS/scalar) are walked too.
    * Purely driver-side plan introspection — no data is read. */
  def viewDependencies(s: SparkSession, viewNames: Seq[String],
                       known: Set[String]): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    def direct(p: LogicalPlan): Seq[String] = p match {
      case SubqueryAlias(id, _) if known(id.name) => Seq(id.name)
      case other =>
        other.children.flatMap(direct) ++ other.subqueries.flatMap(direct)
    }
    viewNames.flatMap { v =>
      val analyzed = s.table(v).queryExecution.analyzed
      val body = analyzed match {
        case SubqueryAlias(id, c) if id.name == v => c
        case o => o
      }
      direct(body).distinct.sorted.map(d => (v, d))
    }
  }

  /** Column-level lineage of a view — the SYSCAT.COLDEP analogue: each
    * output column traced through the ANALYZED plan's alias graph down to
    * the base-relation attributes it derives from. Alias nodes map their
    * exprId to their child's attribute references; pass-through attributes
    * keep their exprId, so resolution terminates at the leaf
    * `SubqueryAlias` outputs of the named base relations. Literal-only
    * outputs (e.g. `count(*)`) have no lineage rows, by design. Purely
    * driver-side plan introspection — no data is read. */
  def columnLineage(s: SparkSession, viewName: String,
                    baseNames: Set[String]): Seq[(String, String, String)] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.catalyst.expressions.Alias
    val leafOwner = scala.collection.mutable.Map[Long, (String, String)]()
    def collectLeaves(p: LogicalPlan): Unit = p match {
      case sa @ SubqueryAlias(id, _) if baseNames(id.name) =>
        sa.output.foreach(a => leafOwner(a.exprId.id) = (id.name, a.name))
      case other =>
        other.children.foreach(collectLeaves)
        other.subqueries.foreach(collectLeaves)
    }
    val refs = scala.collection.mutable.Map[Long, Set[Long]]()
    val analyzed = s.table(viewName).queryExecution.analyzed
    collectLeaves(analyzed)
    analyzed.foreach { node =>
      node.expressions.foreach(_.foreach {
        case al: Alias =>
          refs(al.exprId.id) = al.child.references.map(_.exprId.id).toSet
        case _ => ()
      })
    }
    def resolve(id: Long, seen: Set[Long]): Set[Long] =
      if (leafOwner.contains(id)) Set(id)
      else refs.getOrElse(id, Set.empty).diff(seen)
        .flatMap(r => resolve(r, seen + id))
    analyzed.output.flatMap { a =>
      resolve(a.exprId.id, Set.empty).toSeq.map(leafOwner).map {
        case (t, c) => (a.name, t, c)
      }
    }.distinct.sorted
  }
}
