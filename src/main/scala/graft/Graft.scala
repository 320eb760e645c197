package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points: a tuned session builder and the SQL surface.
  *
  * The reference exposed its capabilities through CLI tools over a DB2
  * connection; this engine's equivalents are (1) the DataFrame registry in
  * `SparkEntry.queries` and (2) plain `spark.sql` over the registered views
  * below — a dbsuite user's catalog queries run verbatim-ish against them.
  */
object Graft {

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Recommended local session: UTC, AQE on (default), shuffle partitions
    * sized to cores — on a real cluster, size to 2-3x total executor cores
    * and let AQE coalesce. */
  def session(appName: String = "graft",
              cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    functions.GraftFunctions.register(s)
    s
  }

  /** Register every fixture table under its plain name as a temp view, so
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")` just works. */
  def registerTables(s: SparkSession, sfDir: String): Unit = {
    tables.foreach(t => T.t(s, sfDir, t).createOrReplaceTempView(t))
    functions.GraftFunctions.register(s)
  }

  /** SQL entry point over the registered views. */
  def sql(s: SparkSession, query: String): DataFrame = s.sql(query)
}
