package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped snapshot catalog over Parquet + JSON manifests.
  *
  * The north rule requires each aggregation pass to land as a durable
  * snapshot carrying per-partition lineage + metrics so a killed job resumes
  * from the last pass. No Iceberg jar ships in this sandbox
  * (SURVEY.md §7 risk 2), so the catalog is a thin interface with a
  * Parquet backend; an Iceberg backend is a drop-in (same commit/read/
  * time-travel surface) when the runtime has the jar.
  *
  * Layout:  <root>/<table>/snap-<id>/<dataset dirs>  +  <root>/<table>/manifest-<id>.json
  * A snapshot is visible only once its manifest exists (manifest written
  * after the parquet commit -> crash-consistent resume).
  */
object Snapshots {

  case class PartitionMetric(partition: Int, rows: Long)
  case class Manifest(
      table: String,
      snapshotId: Long,
      parentId: Option[Long],
      datasets: Map[String, String],         // name -> relative path
      metrics: Map[String, String],          // free-form scalar metrics
      lineage: Map[String, Seq[PartitionMetric]]) // dataset -> per-partition rows

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  private def manifestJson(m: Manifest): String = {
    val ds = m.datasets.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val mx = m.metrics.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val ln = m.lineage.map { case (k, ps) =>
      s""""${esc(k)}":[${ps.map(p => s"""{"partition":${p.partition},"rows":${p.rows}}""").mkString(",")}]"""
    }.mkString("{", ",", "}")
    s"""{"table":"${esc(m.table)}","snapshotId":${m.snapshotId},"parentId":${m.parentId.getOrElse(-1L)},"datasets":$ds,"metrics":$mx,"lineage":$ln}"""
  }

  /** Per-partition row counts — the lineage record demanded by the north
    * rule. One cheap job over the data (count per partition id).
    */
  def partitionMetrics(df: DataFrame): Seq[PartitionMetric] =
    df.groupBy(spark_partition_id().as("p")).agg(count(lit(1)).as("rows"))
      .collect().map(r => PartitionMetric(r.getInt(0), r.getLong(1)))
      .sortBy(_.partition).toSeq

  /** Commit datasets as snapshot `id` of `table`. Parquet first, manifest
    * last (the commit point).
    */
  def commit(root: String, table: String, id: Long, parent: Option[Long],
             datasets: Map[String, DataFrame], metrics: Map[String, String],
             withLineage: Boolean = true): Manifest = {
    val base = Paths.get(root, table, s"snap-$id")
    Files.createDirectories(base)
    val rel = datasets.map { case (name, df) =>
      df.write.mode("overwrite").parquet(base.resolve(name).toString)
      name -> s"snap-$id/$name"
    }
    val lineage =
      if (withLineage)
        datasets.map { case (name, df) =>
          name -> partitionMetrics(df.sparkSession.read.parquet(base.resolve(name).toString))
        }
      else Map.empty[String, Seq[PartitionMetric]]
    val m = Manifest(table, id, parent, rel, metrics, lineage)
    val tmp = Paths.get(root, table, s".manifest-$id.json.tmp")
    Files.writeString(tmp, manifestJson(m))
    Files.move(tmp, Paths.get(root, table, s"manifest-$id.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    m
  }

  /** Ids of committed snapshots (manifest present), ascending. */
  def committed(root: String, table: String): Seq[Long] = {
    val dir = Paths.get(root, table)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  /** Read one dataset of a committed snapshot (time-travel by snapshot id). */
  def read(spark: SparkSession, root: String, table: String, id: Long, dataset: String): DataFrame =
    spark.read.parquet(Paths.get(root, table, s"snap-$id", dataset).toString)

  /** Raw manifest JSON (for tests / external inspection). */
  def manifestText(root: String, table: String, id: Long): String =
    Files.readString(Paths.get(root, table, s"manifest-$id.json"))
}
