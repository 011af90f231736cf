package graft.catalog

import org.apache.spark.sql.types.StructType

/** Changelog mode of a dynamic table (reference: append is the Kafka
  * default; upsert = `PRIMARY KEY ... NOT ENFORCED` tables,
  * `terraform/lab-aggregations/main.tf:396,463`; retract =
  * `WITH ('changelog.mode'='retract')`, `:530`). */
sealed trait ChangelogMode
object ChangelogMode {
  case object Append extends ChangelogMode
  case object Upsert extends ChangelogMode
  case object Retract extends ChangelogMode
}

/** Engine-owned table metadata — the pieces of the reference's DDL that
  * Spark SQL has no syntax for (primary key, buckets, changelog mode,
  * watermark), per SURVEY.md §1.2/§4. Schema may be None for tables
  * whose schema is inferred from the source (reference: Schema
  * Registry; here: parquet footer / registered view).
  */
final case class TableMeta(
    name: String,
    schema: Option[StructType] = None,
    primaryKey: Seq[String] = Nil,
    buckets: Option[Int] = None,
    changelogMode: ChangelogMode = ChangelogMode.Append,
    watermarkCol: Option[String] = None,
    watermarkDelay: String = "0 seconds",
    columnCasts: Map[String, String] = Map.empty, // ALTER ... MODIFY (col TYPE)
    options: Map[String, String] = Map.empty)

/** In-memory catalog: environment/cluster scoping in the reference
  * (`sql.current-catalog` / `sql.current-database`,
  * `terraform/lab-aggregations/main.tf:398-399`) reduces to a flat
  * namespace here; scoping is modelled by `database`. */
final class InMemoryCatalog {
  private val tables = scala.collection.mutable.LinkedHashMap.empty[String, TableMeta]
  @volatile var currentCatalog: String = "default_env"
  @volatile var currentDatabase: String = "default_cluster"

  def register(meta: TableMeta): Unit = synchronized { tables(meta.name) = meta }
  def get(name: String): Option[TableMeta] = synchronized { tables.get(name) }
  def getOrCreate(name: String): TableMeta = synchronized {
    tables.getOrElseUpdate(name, TableMeta(name))
  }
  def update(name: String)(f: TableMeta => TableMeta): TableMeta = synchronized {
    val m = f(getOrCreate(name)); tables(name) = m; m
  }
  def list: Seq[TableMeta] = synchronized { tables.values.toSeq }
}
