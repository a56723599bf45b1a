package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the unglamorous operator every large-scale
  * ingest pipeline needs: streaming micro-batches and per-partition
  * appends leave thousands of KB-sized parquet files whose per-file
  * open/footer cost eventually dominates scans.
  *
  * Bin-packs a directory to ~`targetBytes` output files: measures real
  * input bytes via the filesystem (no guessing from row counts),
  * rewrites with that many partitions, then atomically swaps
  * directories. At cluster scale the same code runs per table
  * partition so compaction parallelizes and never rewrites cold data.
  */
object Compaction {

  case class Stats(filesBefore: Long, filesAfter: Long, bytes: Long)

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val tmp = new Path(dir + "__compacting")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(dir + "__old")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)

    val after = fs.listStatus(path).count(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    Stats(files.length.toLong, after.toLong, bytes)
  }
}
