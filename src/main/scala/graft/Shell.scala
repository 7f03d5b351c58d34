package graft

import org.apache.spark.sql.SparkSession

import graft.api.{CassandraLens, JComparators}
import graft.model.ComparatorType
import graft.operators.{SliceByNames, SliceRange}
import graft.sources.CellEncodings

/** Interactive shell — the packaged analog of the reference's CLI
  * (`cli/CliClient.java`, grammar `cli/Cli.g`, entry `cli/CliMain.java`):
  * a line-based session answering the ad-hoc read/write surface over the
  * engine's column families. Grammar (0.6-CLI-flavored; single quotes
  * around keys/columns, LongType column literals are decimal):
  *
  * {{{
  *   show keyspaces                          -- list CFs + metadata
  *   get <cf>['<key>'] [limit <n>]           -- get_slice (first n columns,
  *                                              or supercolumns on a super CF)
  *   get <cf>['<key>']['<col>']              -- one column (standard CF)
  *   get <cf>['<key>']['<super>']            -- whole supercolumn (super CF)
  *   get <cf>['<key>']['<super>']['<col>']   -- one subcolumn (super CF)
  *   set <cf>['<key>']['<col>'] = '<v>'      -- insert/update (standard CF)
  *   set <cf>['<key>']['<s>']['<c>'] = '<v>' -- insert/update (super CF)
  *   del <cf>['<key>']                       -- delete a whole record
  *   del <cf>['<key>']['<col>']              -- delete a column (standard CF)
  *   del <cf>['<key>']['<super>']            -- delete a supercolumn (super CF)
  *   del <cf>['<key>']['<super>']['<col>']   -- delete a subcolumn (super CF)
  *   count <cf>['<key>']                     -- get_count
  *   count <cf>['<key>']['<super>']          -- subcolumn count (super CF)
  *   range <cf>['<start>':'<end>'] [limit n] -- get_range_slices key bounds
  *   describe splits <cf> <n>                -- describe_splits ring points
  *   stats <cf>                              -- cfstats-shaped census
  *   help | quit
  * }}}
  *
  * `eval` is the whole interpreter and is pure-ish (lens map in, output
  * lines out) so a scripted session is spec-testable without a TTY;
  * `main` wires stdin over the standard testdata keyspaces. Output rows
  * are rendered in the reference's `=> (column=…, value=…, timestamp=…)`
  * shape — supercolumns in the CLI's nested
  * `=> (super_column=…, (column=…, …), …)` shape (CliClient.java:125-134
  * super paths) — comparator-typed column names decoded like the CLI's
  * `AbstractType.getString`, and rows ordered by the COMPARATOR's sort
  * (JComparators), not the rendered string.
  */
object Shell {

  /** One openable column family: its lens plus how to parse/render
    * column names at the shell boundary (the comparator's getString /
    * fromString contract). `tsUnitPerMilli` converts the session clock's
    * epoch-millis into the CF's native cell-timestamp unit (1 = the CF
    * stores millis; the events fixtures store NANOS → 1,000,000): a
    * mutation stamped in the wrong unit silently loses LWW to existing
    * cells (a millis write can never shadow a nanos cell).
    */
  final case class ShellCf(lens: CassandraLens, comparator: ComparatorType.Value,
      tsUnitPerMilli: Long = 1L) {
    def isSuper: Boolean = lens.meta.isSuper
    def subComparator: ComparatorType.Value = lens.meta.subComparator
  }

  private def nameToBytes(s: String, cmp: ComparatorType.Value): Array[Byte] =
    cmp match {
      case ComparatorType.Long_ | ComparatorType.FreshTimestamp =>
        java.nio.ByteBuffer.allocate(8).putLong(s.trim.toLong).array()
      case _ => s.getBytes("UTF-8")
    }

  private def nameToString(b: Array[Byte], cmp: ComparatorType.Value): String =
    cmp match {
      case ComparatorType.Long_ | ComparatorType.FreshTimestamp
        if b.length == 8 => java.nio.ByteBuffer.wrap(b).getLong.toString
      case _ => new String(b, "UTF-8")
    }

  /** Comparator byte order lifted over the nullable shell-row fields
    * (null/absent sorts first, like the reference's empty-name rule).
    */
  private def nullFirst(cmp: ComparatorType.Value): Ordering[Array[Byte]] = {
    val ord = JComparators.ordering(cmp)
    (a: Array[Byte], b: Array[Byte]) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)
  }

  /** The standard testdata keyspace: the orders, events and super
    * lineitem CFs every driver artifact uses (CellEncodings fixtures).
    * events cells carry event-time NANOS, so its shell mutations scale
    * the wall clock by 1e6 to stay in the CF's LWW timeline.
    */
  def openTestdata(spark: SparkSession, dir: String): Map[String, ShellCf] = Map(
    "orders" -> ShellCf(
      new CassandraLens(
        CellEncodings.ordersCells(spark, dir)
          .unionByName(CellEncodings.ordersStatusFTombstones(spark, dir)),
        CellEncodings.ordersMeta),
      CellEncodings.ordersMeta.comparator),
    "events" -> ShellCf(
      new CassandraLens(CellEncodings.eventsCells(spark, dir),
        CellEncodings.eventsMeta),
      CellEncodings.eventsMeta.comparator,
      tsUnitPerMilli = 1000000L),
    "lineitems" -> ShellCf(
      new CassandraLens(CellEncodings.lineitemSuperCells(spark, dir),
        CellEncodings.lineitemSuperMeta),
      CellEncodings.lineitemSuperMeta.comparator))

  private val Get3 = """get\s+(\w+)\['([^']*)'\]\['([^']*)'\]\['([^']*)'\]""".r
  private val GetCol = """get\s+(\w+)\['([^']*)'\]\['([^']*)'\]""".r
  private val Get = """get\s+(\w+)\['([^']*)'\](?:\s+limit\s+(\d+))?""".r
  private val Count2 = """count\s+(\w+)\['([^']*)'\]\['([^']*)'\]""".r
  private val Count = """count\s+(\w+)\['([^']*)'\]""".r
  private val Range = """range\s+(\w+)\['([^']*)':'([^']*)'\](?:\s+limit\s+(\d+))?""".r
  private val Splits = """describe\s+splits\s+(\w+)\s+(\d+)""".r
  private val Stats = """stats\s+(\w+)""".r
  private val Set3 = """set\s+(\w+)\['([^']*)'\]\['([^']*)'\]\['([^']*)'\]\s*=\s*'([^']*)'""".r
  private val Set = """set\s+(\w+)\['([^']*)'\]\['([^']*)'\]\s*=\s*'([^']*)'""".r
  private val Del3 = """del\s+(\w+)\['([^']*)'\]\['([^']*)'\]\['([^']*)'\]""".r
  private val DelCol = """del\s+(\w+)\['([^']*)'\]\['([^']*)'\]""".r
  private val DelRow = """del\s+(\w+)\['([^']*)'\]""".r

  private val HelpText = Seq(
    "show keyspaces                           List column families.",
    "get <cf>['<key>'] [limit <n>]            Get a slice of (super)columns.",
    "get <cf>['<key>']['<col>']               Get a column value.",
    "get <cf>['<key>']['<super>']             Get a whole supercolumn.",
    "get <cf>['<key>']['<super>']['<col>']    Get a subcolumn value.",
    "set <cf>['<key>']['<col>'] = '<value>'   Insert/update a column.",
    "set <cf>['<key>']['<s>']['<c>'] = '<v>'  Insert/update a subcolumn.",
    "del <cf>['<key>']['<col>']               Delete a column/supercolumn.",
    "del <cf>['<key>']['<s>']['<c>']          Delete a subcolumn.",
    "del <cf>['<key>']                        Delete a whole record.",
    "count <cf>['<key>']                      Count columns in record.",
    "count <cf>['<key>']['<super>']           Count subcolumns.",
    "range <cf>['<start>':'<end>'] [limit n]  Slice a key range.",
    "describe splits <cf> <n>                 Token-ring split points.",
    "stats <cf>                               Column family statistics.",
    "quit                                     Exit this session.")

  /** One interactive session — the CLI's CONNECTION state: `set`/`del`
    * swap the mutated lens back into the CF map (mutations return a new
    * store view, CliClient.executeSet/executeDelete semantics), reads
    * delegate to the stateless [[eval]]. `now` supplies the wall clock in
    * epoch MILLIS (specs inject a counter for determinism); each CF's
    * `tsUnitPerMilli` scales it into that CF's native cell-timestamp
    * unit, and tombstone localDeletionTime stays wall-clock SECONDS.
    */
  final class Session(initial: Map[String, ShellCf],
      now: () => Long = () => System.currentTimeMillis()) {
    private val cfs = scala.collection.mutable.Map(initial.toSeq: _*)

    def eval(line: String): Seq[String] = {
      def withCf(name: String)(f: ShellCf => Seq[String]): Seq[String] =
        cfs.get(name) match {
          case Some(cf) => try f(cf) catch {
            case e: IllegalArgumentException => Seq(s"error: ${e.getMessage}")
          }
          case None => Seq(s"unknown column family: $name (try 'show keyspaces')")
        }
      def clock(cf: ShellCf): (Long, Int) = {
        val ms = now()
        (ms * cf.tsUnitPerMilli, (ms / 1000L).toInt)
      }
      line.trim match {
        case Set3(cfName, key, superName, colName, value) => withCf(cfName) { cf =>
          if (!cf.isSuper) Seq(s"error: $cfName is not a super column family")
          else {
            val spark = cf.lens.cells.sparkSession
            import spark.implicits._
            val (ts, _) = clock(cf)
            val mut = Seq((key, nameToBytes(superName, cf.comparator),
                nameToBytes(colName, cf.subComparator),
                value.getBytes("UTF-8"), ts))
              .toDF("key", "super_name", "col_name", "value", "ts")
            cfs(cfName) = cf.copy(lens = cf.lens.insert(mut))
            Seq("Value inserted.")
          }
        }
        case Set(cfName, key, colName, value) => withCf(cfName) { cf =>
          if (cf.isSuper)
            Seq(s"error: $cfName is a super column family — " +
              s"set $cfName['<key>']['<super>']['<col>'] = '<value>'")
          else {
            val spark = cf.lens.cells.sparkSession
            import spark.implicits._
            val (ts, _) = clock(cf)
            val mut = Seq((key, nameToBytes(colName, cf.comparator),
                value.getBytes("UTF-8"), ts))
              .toDF("key", "col_name", "value", "ts")
              .withColumn("super_name",
                org.apache.spark.sql.functions.lit(null).cast("binary"))
            cfs(cfName) = cf.copy(lens = cf.lens.insert(mut))
            Seq("Value inserted.")
          }
        }
        case Del3(cfName, key, superName, colName) => withCf(cfName) { cf =>
          if (!cf.isSuper) Seq(s"error: $cfName is not a super column family")
          else {
            val spark = cf.lens.cells.sparkSession
            import spark.implicits._
            val (ts, ldt) = clock(cf)
            val del = Seq((key, nameToBytes(superName, cf.comparator),
                nameToBytes(colName, cf.subComparator), ts))
              .toDF("key", "super_name", "col_name", "ts")
            cfs(cfName) = cf.copy(lens = cf.lens.removeColumns(del, ldt))
            Seq("column removed.")
          }
        }
        case DelCol(cfName, key, colName) => withCf(cfName) { cf =>
          val spark = cf.lens.cells.sparkSession
          import spark.implicits._
          val (ts, ldt) = clock(cf)
          if (cf.isSuper) {
            // two-bracket del on a super CF addresses the SUPERCOLUMN
            // (Deletion with super_column set, no predicate)
            val del = Seq((key, nameToBytes(colName, cf.comparator), ts))
              .toDF("key", "super_name", "ts")
            cfs(cfName) = cf.copy(lens = cf.lens.removeSuperColumns(del, ldt))
            Seq("supercolumn removed.")
          } else {
            val del = Seq((key, nameToBytes(colName, cf.comparator), ts))
              .toDF("key", "col_name", "ts")
              .withColumn("super_name",
                org.apache.spark.sql.functions.lit(null).cast("binary"))
            cfs(cfName) = cf.copy(lens = cf.lens.removeColumns(del, ldt))
            Seq("column removed.")
          }
        }
        case DelRow(cfName, key) => withCf(cfName) { cf =>
          val spark = cf.lens.cells.sparkSession
          import spark.implicits._
          val (ts, ldt) = clock(cf)
          val del = Seq((key, ts)).toDF("key", "ts")
          cfs(cfName) = cf.copy(lens = cf.lens.removeRows(del, ldt))
          Seq("row removed.")
        }
        case _ => Shell.eval(cfs.toMap, line)
      }
    }
  }

  /** Evaluate one shell line against the open CFs → output lines. */
  def eval(cfs: Map[String, ShellCf], line: String): Seq[String] = {
    def withCf(name: String)(f: ShellCf => Seq[String]): Seq[String] =
      cfs.get(name) match {
        case Some(cf) => try f(cf) catch {
          case e: IllegalArgumentException => Seq(s"error: ${e.getMessage}")
        }
        case None => Seq(s"unknown column family: $name (try 'show keyspaces')")
      }
    // collected cells in comparator order: (key, super bytes, col bytes,
    // value, ts) sorted by key, then super under the top comparator
    // (null first), then column under the name comparator
    def sortedCells(cf: ShellCf, rows: Array[org.apache.spark.sql.Row])
        : Array[(String, Array[Byte], Array[Byte], String, Long)] = {
      val supOrd = nullFirst(cf.comparator)
      val colOrd = nullFirst(if (cf.isSuper) cf.subComparator else cf.comparator)
      rows.map { r =>
        (r.getAs[String]("key"), r.getAs[Array[Byte]]("super_name"),
          r.getAs[Array[Byte]]("col_name"),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"),
          r.getAs[Long]("ts"))
      }.sortWith { case ((ka, sa, ca, _, _), (kb, sb, cb, _, _)) =>
        val k = ka.compareTo(kb)
        if (k != 0) k < 0
        else {
          val s = supOrd.compare(sa, sb)
          if (s != 0) s < 0 else colOrd.compare(ca, cb) < 0
        }
      }
    }
    def renderStandard(cf: ShellCf, rows: Array[org.apache.spark.sql.Row],
        withKey: Boolean): Seq[String] = {
      val cells = sortedCells(cf, rows)
      cells.map { case (k, _, c, v, ts) =>
        val prefix = if (withKey) s"key=$k " else ""
        s"=> ($prefix" +
          s"column=${nameToString(c, cf.comparator)}, value=$v, timestamp=$ts)"
      } :+ s"Returned ${cells.length} results."
    }
    // the CLI's nested supercolumn shape, as a SINGLE-LINE adaptation:
    // the reference (cli/CliClient.java) prints each subcolumn on its
    // own indented line under the supercolumn header; here the
    // subcolumns render inline, comma-separated, so the line-based
    // ShellSpec scripts can assert one row per sliced entity. Content
    // and ordering match the reference; only the line layout differs.
    // The count counts SUPERCOLUMNS (the sliced entities), like the
    // reference's result list. Grouping is by the RAW name bytes — two byte-distinct supercolumns whose names render
    // to the same string (e.g. invalid UTF-8 → U+FFFD) must stay two
    // rows; rendering happens only at display
    def renderSuper(cf: ShellCf, rows: Array[org.apache.spark.sql.Row],
        withKey: Boolean): Seq[String] = {
      val cells = sortedCells(cf, rows)
      val groups = scala.collection.mutable.LinkedHashMap
        .empty[(String, scala.collection.immutable.ArraySeq[Byte]),
          scala.collection.mutable.ArrayBuffer[String]]
      cells.foreach { case (k, s, c, v, ts) =>
        groups.getOrElseUpdate(
          (k, scala.collection.immutable.ArraySeq.unsafeWrapArray(s)),
          scala.collection.mutable.ArrayBuffer.empty[String]) +=
          s"(column=${nameToString(c, cf.subComparator)}, value=$v, timestamp=$ts)"
      }
      groups.toSeq.map { case ((k, s), subs) =>
        val prefix = if (withKey) s"key=$k " else ""
        val name = nameToString(s.unsafeArray.asInstanceOf[Array[Byte]], cf.comparator)
        s"=> ($prefix" + s"super_column=$name, ${subs.mkString(", ")})"
      } :+ s"Returned ${groups.size} results."
    }
    def render(cf: ShellCf, rows: Array[org.apache.spark.sql.Row],
        withKey: Boolean): Seq[String] =
      if (cf.isSuper) renderSuper(cf, rows, withKey)
      else renderStandard(cf, rows, withKey)
    line.trim match {
      case "" => Seq.empty
      case "help" => HelpText
      case "quit" | "exit" => Seq("bye")
      case "show keyspaces" =>
        cfs.toSeq.sortBy(_._1).map { case (n, cf) =>
          if (cf.isSuper)
            s"$n (super, comparator=${cf.comparator}, subcomparator=${cf.subComparator})"
          else s"$n (comparator=${cf.comparator})"
        }
      case Get3(cfName, key, superName, colName) => withCf(cfName) { cf =>
        if (!cf.isSuper) Seq(s"error: $cfName is not a super column family")
        else {
          val rows = cf.lens.get(key, Some(nameToBytes(superName, cf.comparator)),
            nameToBytes(colName, cf.subComparator)).collect()
          if (rows.isEmpty) Seq("Value not found.")
          else {
            val (_, _, c, v, ts) = sortedCells(cf, rows).head
            Seq(s"=> (column=${nameToString(c, cf.subComparator)}, " +
              s"value=$v, timestamp=$ts)")
          }
        }
      }
      case GetCol(cfName, key, colName) => withCf(cfName) { cf =>
        if (cf.isSuper) {
          // two-bracket get on a super CF addresses the SUPERCOLUMN
          // (ColumnPath with super_column only, CassandraServer get path)
          val rows = cf.lens.getSuperColumn(key,
            nameToBytes(colName, cf.comparator)).collect()
          if (rows.isEmpty) Seq("Value not found.")
          else renderSuper(cf, rows, withKey = false).init
        } else {
          val rows = cf.lens.get(key, None,
            nameToBytes(colName, cf.comparator)).collect()
          if (rows.isEmpty) Seq("Value not found.")
          else renderStandard(cf, rows, withKey = false).init // single cell, no count line
        }
      }
      case Get(cfName, key, limit) => withCf(cfName) { cf =>
        val n = Option(limit).map(_.toInt).getOrElse(100)
        render(cf, cf.lens.getSlice(key, None,
          SliceRange(count = n)).collect(), withKey = false)
      }
      case Count2(cfName, key, superName) => withCf(cfName) { cf =>
        if (!cf.isSuper) Seq(s"error: $cfName is not a super column family")
        else {
          val rows = cf.lens.getCount(Seq(key),
            Some(nameToBytes(superName, cf.comparator))).collect()
          val n = rows.headOption.map(_.getAs[Long]("n")).getOrElse(0L)
          Seq(s"$n columns")
        }
      }
      case Count(cfName, key) => withCf(cfName) { cf =>
        val rows = cf.lens.getCount(Seq(key), None).collect()
        val n = rows.headOption.map(_.getAs[Long]("n")).getOrElse(0L)
        Seq(s"$n columns")
      }
      // the ops readouts next to the data commands — the nodetool /
      // browser surface (tools/NodeCmd.java:295-380 printColumnFamilyStats,
      // contrib/cassandra_browser pages by ring ranges)
      case Splits(cfName, n) => withCf(cfName) { cf =>
        val splits = cf.lens.describeSplits(n.toInt)
          .orderBy(org.apache.spark.sql.functions.col("split_id")).collect()
        splits.map { r =>
          s"split ${r.get(0)}: keys=${r.get(1)} " +
            s"['${r.get(2)}':'${r.get(3)}']"
        }.toSeq :+ s"${splits.length} splits"
      }
      case Stats(cfName) => withCf(cfName) { cf =>
        import org.apache.spark.sql.functions._
        // ONE column-pruned aggregate over the raw cells (key/col_name/
        // tombstone only — the storeStats cell-census move); NodeCmd
        // prints the same shape from MBean counters
        val r = cf.lens.cells.agg(
          approx_count_distinct(col("key")),
          coalesce(sum(when(col("col_name").isNotNull && !col("tombstone"),
            1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(col("col_name").isNotNull && col("tombstone"),
            1L).otherwise(0L)), lit(0L)),
          coalesce(sum(when(col("col_name").isNull, 1L).otherwise(0L)),
            lit(0L)),
          count(lit(1))).head()
        Seq(
          s"Column Family: $cfName",
          s"Number of Keys (estimate): ${r.getLong(0)}",
          s"Cell count: ${r.getLong(4)}",
          s"Live cells: ${r.getLong(1)}",
          s"Tombstoned cells: ${r.getLong(2)}",
          s"Deletion markers: ${r.getLong(3)}")
      }
      case Range(cfName, startKey, endKey, limit) => withCf(cfName) { cf =>
        val n = Option(limit).map(_.toInt).getOrElse(100)
        render(cf, cf.lens.rangeSliceByKeys(
          Some(startKey).filter(_.nonEmpty), Some(endKey).filter(_.nonEmpty),
          None, SliceRange(count = Int.MaxValue), n).collect(), withKey = true)
      }
      case other => Seq(s"Invalid statement: $other (try 'help')")
    }
  }

  /** Scripted/interactive entry point: `Shell <sfDir>` (defaults to the
    * sf0.001 testdata) reading commands from stdin until EOF or `quit`.
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create()
    val session = new Session(openTestdata(spark, dir))
    println(s"[shell] connected to $dir — 'help' lists statements")
    Iterator.continually(scala.io.StdIn.readLine())
      .takeWhile(l => l != null && l.trim != "quit" && l.trim != "exit")
      .foreach(l => session.eval(l).foreach(println))
    println("bye")
    spark.stop()
  }
}
