package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-integrity validation — the maintenance surface an operator
  * reaches for after a bad deploy or an unclean shutdown at 100 TB:
  * scan a store's parquet runs, horizon sidecars, and manifests and
  * REPORT what is broken, orphaned, or inconsistent WITHOUT failing
  * (or being part of) the read path. The analog of the reference's
  * `tools/SSTableValidator.java:40-70` (scan data files, report broken
  * ones) + `tools/SSTableRepair.java` (quarantine guidance), mapped
  * onto the parquet-run conventions every graft store shares:
  *
  *  - DATA files (`*.parquet`): each file's FOOTER is opened — a
  *    truncated, zero-length, or corrupt file fails footer decode and
  *    reports `unreadable` with the cause. Footer decode is the
  *    cheapest per-file proof the file is scannable (schema + row
  *    groups + row count); pass `deep = true` to additionally decode
  *    every page of every column chunk (the SSTableValidator full-scan
  *    rule — catches mid-file corruption a footer read cannot).
  *    Validation is DISTRIBUTED: the file list parallelizes over
  *    executors, so a million-file store validates at cluster speed.
  *  - `graphcells/run=N` manifests ([[graft.streaming.PipelineStream]]
  *    kNN stores): a manifest whose `graph/run=N` is missing reports
  *    `orphaned` (the readout would join rows away silently); a graph
  *    run with no manifest reports `mismatch` (readKnnGraph will never
  *    surface it).
  *  - `_compacted_from` manifests ([[ZOrder]] z-run stores): a source
  *    run named by a PUBLISHED run's manifest but still on disk
  *    reports `mismatch` (double-count hazard — run
  *    [[ZOrder.healZRuns]]); an unparseable manifest reports
  *    `unreadable`.
  *  - Interrupted-compaction residue: `*__old` / `*__compact` /
  *    `.compacting-*` / `horizons_*_next` directories report
  *    `orphaned`, and a `*__old` with NO live sibling reports
  *    `mismatch` (the legacy pre-pointer swap's crash window — rename
  *    `__old` back).
  *  - Generation-pointer stores (`CURRENT.<gen>` — the atomic-publish
  *    protocol of compactKnnStore/compactBm25Store/reindexKnnStore):
  *    substore dirs of non-live generations, and plain legacy dirs
  *    once a generation is committed, report `orphaned` (crash-before-
  *    commit or incomplete post-commit GC — readers never open them,
  *    so they are reported, not footer-checked).
  *
  * Returns (store, path, kind, status, detail); `status = "ok"` rows
  * carry the footer row count so the report doubles as a run census.
  * Quarantine recipe (NOTES.md): move `unreadable` files into a
  * `_quarantine/` sibling (readers never list it), re-run the
  * validator, then restore the affected runs from snapshots or
  * re-fold the delta that produced them.
  */
object RunIntegrity {

  /** One report row. */
  private val Cols = Seq("store", "path", "kind", "status", "detail")

  /** Footer row-counts for a file set — the census substrate
    * [[graft.api.Keyspace.storeStats]] shares with [[validateStore]]:
    * one ParquetFileReader footer decode per file, DISTRIBUTED over
    * executors (a million-file store censuses at cluster speed), with
    * the real hadoop conf shipped (the object-store rule below). A file
    * whose footer fails decoding returns None — the caller counts it
    * unreadable instead of failing the census.
    */
  def footerRows(spark: SparkSession,
      files: Seq[String]): Seq[(String, Option[Long])] = {
    if (files.isEmpty) return Nil
    val slices = math.min(files.size,
      spark.sparkContext.defaultParallelism * 4)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext.parallelize(files, slices).map { f =>
      val res = scala.util.Try {
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), confBc.value.value))
        try rd.getRecordCount finally rd.close()
      }
      (f, res.toOption)
    }.collect().toSeq
  }

  /** Validate every store convention found under `basePath` (see object
    * doc). Never throws on broken content — broken content IS the
    * report. `label` names the store in the report (defaults to the
    * path itself).
    */
  def validateStore(spark: SparkSession, basePath: String,
      label: String = "", deep: Boolean = false): DataFrame = {
    import spark.implicits._
    val store = if (label.nonEmpty) label else basePath
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base))
      return Seq((store, basePath, "dir", "mismatch", "store path missing"))
        .toDF(Cols: _*)

    val rows = Seq.newBuilder[(String, String, String, String, String)]

    // ---- directory-shape checks (driver-side: metadata-scale) ----
    def ls(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      if (fs.exists(p)) fs.listStatus(p).toSeq else Nil
    val topDirs = ls(base).filter(_.isDirectory).map(_.getPath)
    val topNames = topDirs.map(_.getName).toSet
    topDirs.foreach { d =>
      val n = d.getName
      if (n.endsWith("__old")) {
        val live = n.stripSuffix("__old")
        if (topNames(live))
          rows += ((store, d.toString, "dir", "orphaned",
            "retired pre-swap copy left behind — safe to delete once the " +
              "live store is verified"))
        else
          rows += ((store, d.toString, "dir", "mismatch",
            s"no live '$live' sibling — interrupted legacy swap or " +
              "single-dir restore; rename this __old back"))
      } else if (n.endsWith("__compact") || n.startsWith(".compacting-") ||
        n.endsWith("_next")) {
        rows += ((store, d.toString, "dir", "orphaned",
          "interrupted-compaction residue — never published; safe to delete"))
      }
    }

    // ---- generation-pointer stores (the compactKnnStore/compactBm25Store
    // atomic-publish protocol): `CURRENT.<gen>` names the live
    // generation; substore dirs of OTHER generations — and the plain
    // legacy dirs once any generation is committed — are unreferenced
    // residue (crash before commit, or incomplete post-commit GC):
    // report them, never footer-check them (same rule as __old).
    val curGen = graft.streaming.PipelineStream.currentGen(fs, base)
    val GenDir = "^(.+)\\.g([0-9]+)$".r
    def genResidue(n: String): Boolean = n match {
      case GenDir(_, g) => g.toLong != curGen
      case _ => curGen > 0L // plain dir under a gen-committed store
    }
    topDirs.foreach { d =>
      val n = d.getName
      // hidden subtrees (quarantine, _temporary) are invisible to
      // readers and stay out of the generation classification too
      val residueAlready = n.endsWith("__old") || n.endsWith("__compact") ||
        n.endsWith("_next") || n.startsWith("_") || n.startsWith(".")
      if (!residueAlready) n match {
        case GenDir(_, g) if g.toLong > curGen =>
          rows += ((store, d.toString, "dir", "orphaned",
            s"unpublished generation $g residue (crash before its " +
              s"CURRENT.$g pointer commit) — safe to delete"))
        case GenDir(_, g) if g.toLong < curGen =>
          rows += ((store, d.toString, "dir", "orphaned",
            s"superseded generation $g (post-commit gc incomplete) — " +
              "safe to delete"))
        case GenDir(_, _) => () // the live generation
        case _ if curGen > 0L =>
          rows += ((store, d.toString, "dir", "orphaned",
            s"legacy pre-pointer dir superseded by generation $curGen — " +
              "safe to delete"))
        case _ => ()
      }
    }

    def runIds(sub: String): Set[Long] =
      ls(new Path(base, sub)).filter(_.isDirectory)
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("run=").toLong).toOption).toSet
    // kNN-store manifest agreement (graphcells names graph runs) — over
    // the LIVE generation's pair only (residue gens are reported above)
    val gSuffix = if (curGen == 0L) "" else s".g$curGen"
    val (gcDir, gDir) = (s"graphcells$gSuffix", s"graph$gSuffix")
    if (topNames(gcDir) || topNames(gDir)) {
      val manifests = runIds(gcDir)
      val graphs = runIds(gDir)
      (manifests -- graphs).toSeq.sorted.foreach { r =>
        rows += ((store, s"$basePath/$gcDir/run=$r", "manifest",
          "orphaned", s"names $gDir/run=$r which does not exist — the " +
            "latest-per-cell readout would silently drop its cells"))
      }
      (graphs -- manifests).toSeq.sorted.foreach { r =>
        rows += ((store, s"$basePath/$gDir/run=$r", "run", "mismatch",
          s"no $gcDir/run=$r manifest — readKnnGraph will never " +
            "surface this run"))
      }
    }

    // z-run _compacted_from manifests: published merges whose source
    // runs were resurrected (crash between publish and delete).
    // The walk sees exactly what a Spark reader would: hidden
    // ('_'/'.'-prefixed) subtrees are invisible to readers — including
    // the documented `_quarantine/` recipe and a crashed write's
    // `_temporary` attempt files — and retired/unpublished residue
    // (`__old`/`__compact`/`_next`) is already reported as a DIR
    // finding above; footer-checking their contents would report a
    // healthy live store as corrupt.
    def visible(p: Path): Boolean = {
      val n = p.getName
      graft.util.FsTrees.readerVisible(n) && !graft.util.FsTrees.residueName(n)
    }
    def walkDirs(p: Path): Seq[Path] =
      p +: ls(p).filter(_.isDirectory).map(_.getPath)
        .filter(visible).flatMap(walkDirs)
    // top level additionally drops non-live generations and (under a
    // committed pointer) the superseded legacy dirs — a reader resolves
    // through the pointer and never opens them
    val allDirs = base +: topDirs
      .filter(d => visible(d) && !genResidue(d.getName)).flatMap(walkDirs)
    allDirs.foreach { d =>
      val mf = new Path(d, "_compacted_from")
      if (fs.exists(mf)) {
        val parent = d.getParent
        scala.util.Try {
          val in = fs.open(mf)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).map(_.trim.toLong).toList
          finally in.close()
        } match {
          case scala.util.Failure(e) =>
            rows += ((store, mf.toString, "manifest", "unreadable",
              s"cannot parse: ${e.getMessage}"))
          case scala.util.Success(ids) =>
            ids.filter(sid => fs.exists(new Path(parent, s"run=$sid")))
              .foreach { sid =>
                rows += ((store, s"$parent/run=$sid", "run", "mismatch",
                  s"source run named by ${d.getName}'s _compacted_from " +
                    "still on disk — double-count hazard; run " +
                    "ZOrder.healZRuns"))
              }
        }
      }
    }

    // ---- data-file checks (distributed: one footer/page decode per
    // file, parallelized over executors) ----
    val dataFiles = allDirs
      .flatMap(d => ls(d).filter(_.isFile).map(_.getPath))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.toString)
    val kindOf = (p: String) =>
      if (p.contains("/horizons_")) "sidecar"
      else if (p.contains("/graphcells")) "manifest"
      else "data"
    val checked =
      if (dataFiles.isEmpty) Nil
      else {
        val slices = math.min(dataFiles.size,
          spark.sparkContext.defaultParallelism * 4)
        val doDeep = deep
        // ship the REAL hadoop conf to executors: an object-store FS
        // (s3a credentials, endpoints, kerberos) is configured via
        // spark.hadoop.* — a fresh Configuration() would fail every
        // open and report a healthy store as corrupt
        val confBc = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration))
        spark.sparkContext.parallelize(dataFiles, slices)
          .map { f =>
            val res = scala.util.Try {
              val conf = confBc.value.value
              val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(new Path(f), conf))
              try {
                val n = rd.getRecordCount
                if (doDeep) {
                  val cols = rd.getFooter.getFileMetaData.getSchema.getColumns
                  var rg = rd.readNextRowGroup()
                  while (rg != null) {
                    (0 until cols.size()).foreach { i =>
                      val pr = rg.getPageReader(cols.get(i))
                      var pg = pr.readPage()
                      while (pg != null) pg = pr.readPage()
                    }
                    rg = rd.readNextRowGroup()
                  }
                }
                n
              } finally rd.close()
            }
            res match {
              case scala.util.Success(n) => (f, "ok", s"rows=$n")
              case scala.util.Failure(e) =>
                (f, "unreadable", Option(e.getMessage).getOrElse(
                  e.getClass.getSimpleName).take(200))
            }
          }.collect().toSeq
      }
    checked.foreach { case (f, status, detail) =>
      rows += ((store, f, kindOf(f), status, detail))
    }
    rows.result().toDF(Cols: _*)
  }
}
