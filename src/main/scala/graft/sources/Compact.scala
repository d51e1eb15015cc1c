package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs. Streaming sinks, incremental batch appends, and
  * over-parallel writers leave directories of kilobyte parquet files; each
  * file costs a scan task, a footer parse, and a metadata round-trip, so a
  * million-file table can spend longer planning than reading. Compaction
  * rewrites the directory into ~`targetFileBytes` files: content-identical
  * (the `data_compact` oracle is a plain SELECT of the source rows),
  * metadata-cheap.
  */
object Compact {

  /** Rewrites the parquet directory at `inDir` into `outDir` with file
    * count sized from the INPUT's on-disk bytes (the file-index statistic —
    * no data pass, and compressed in → compressed out of the same codec
    * keeps sizes comparable). With `sortCols` the rewrite range-partitions
    * and sorts, so the compacted files also carry tight min/max stats on
    * those columns (the poor man's clustering; use `GeoOps.writeZOrdered`
    * for 2-D). Returns the re-read compacted frame.
    */
  def compactFiles(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes >= (1L << 16), "targetFileBytes must be >= 64 KiB")
    val df = spark.read.parquet(inDir)
    val onDisk = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L,
      ((onDisk + targetFileBytes - 1) / targetFileBytes).toLong).toInt
    val shaped =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    shaped.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
