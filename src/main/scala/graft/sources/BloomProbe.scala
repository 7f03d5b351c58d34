package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession

/** The fork's bloom short-circuit (FastRowMayExistQueryFilter /
  * ColumnsMayExistQueryFilter — SURVEY §2.2): answer "may this
  * key exist?" from BLOOM METADATA ONLY — no data pages are read.
  *
  * CellStore.write enables parquet bloom filters on `key`; this probe
  * opens each file's footer, loads the key-column bloom of every row
  * group, and ORs the answers. False positives possible (bloom semantics,
  * identical to the reference: "may exist" ⊇ truth), false negatives not.
  * A `false` here lets a caller skip the exact semi-join entirely.
  *
  * Driver-side metadata iteration by design — the reference's check is a
  * local in-memory bloom lookup too; per-file footer reads are O(files),
  * not O(rows). For executor-distributed probes over very many files, ship
  * the same loop through `spark.range(files).mapPartitions`.
  */
object BloomProbe {

  /** May any row with this key exist in the store at `path`? */
  def keyMayExist(spark: SparkSession, path: String, key: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.exists { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getRowGroups.toArray.exists { b =>
          val block = b.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData]
          block.getColumns.toArray.exists { c =>
            val col = c.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]
            if (col.getPath.toDotString != "key") false
            else {
              val bf = reader.getBloomFilterDataReader(block).readBloomFilter(col)
              // no bloom written for this chunk ⇒ must assume it may exist
              bf == null || bf.findHash(bf.hash(Binary.fromString(key)))
            }
          }
        }
      } finally reader.close()
    }
  }
}
