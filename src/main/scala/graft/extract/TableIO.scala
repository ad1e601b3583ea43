package graft.extract

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Snapshot/manifest table layout for resumable batch runs (north rule:
 * "resumable from checkpoint"). Iceberg-shaped — a snapshot directory plus
 * a committed manifest pointer — behind a seam so a real Iceberg catalog is
 * a config swap (no Iceberg jar ships in this sandbox; see SURVEY.md §7.3).
 *
 * Commit protocol: write parquet to `snapshot=<id>/`, then atomically move
 * `_manifest.json.tmp` → `_manifest.json` pointing at it. A killed run
 * leaves either no manifest (stage recomputed) or a fully committed one
 * (stage skipped on resume) — never a half-read state.
 */
trait TableIO {
  def committedSnapshot(stage: String): Option[String]
  def read(spark: SparkSession, stage: String): DataFrame
  def commit(df: DataFrame, stage: String, snapshotId: String): Unit
}

final class LocalSnapshotIO(root: String) extends TableIO {

  private def stageDir(stage: String) = Paths.get(root, stage)
  private def manifest(stage: String) = stageDir(stage).resolve("_manifest.json")

  def committedSnapshot(stage: String): Option[String] = {
    val m = manifest(stage)
    if (Files.exists(m)) {
      val s = new String(Files.readAllBytes(m), "UTF-8")
      """"latest"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
    } else None
  }

  def read(spark: SparkSession, stage: String): DataFrame = {
    val snap = committedSnapshot(stage).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for stage $stage"))
    spark.read.parquet(stageDir(stage).resolve(s"snapshot=$snap").toString)
  }

  def commit(df: DataFrame, stage: String, snapshotId: String): Unit = {
    val dir = stageDir(stage)
    Files.createDirectories(dir)
    val snapDir = dir.resolve(s"snapshot=$snapshotId")
    df.write.mode(SaveMode.Overwrite).parquet(snapDir.toString)
    val tmp = dir.resolve("_manifest.json.tmp")
    Files.write(tmp,
      s"""{"latest": "$snapshotId", "stage": "$stage"}""".getBytes("UTF-8"))
    Files.move(tmp, manifest(stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
