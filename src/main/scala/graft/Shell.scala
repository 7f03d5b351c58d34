package graft

import org.apache.spark.sql.SparkSession

import graft.api.CassandraLens
import graft.model.ComparatorType
import graft.operators.{SliceByNames, SliceRange}
import graft.sources.CellEncodings

/** Interactive shell — the packaged analog of the reference's CLI
  * (`cli/CliClient.java`, grammar `cli/Cli.g`, entry `cli/CliMain.java`):
  * a line-based session answering the ad-hoc read surface over the
  * engine's column families. Grammar (0.6-CLI-flavored; single quotes
  * around keys/columns, LongType column literals are decimal):
  *
  * {{{
  *   show keyspaces                          -- list CFs + metadata
  *   get <cf>['<key>'] [limit <n>]           -- get_slice (first n columns)
  *   get <cf>['<key>']['<col>']              -- get one column
  *   count <cf>['<key>']                     -- get_count
  *   range <cf>['<start>':'<end>'] [limit n] -- get_range_slices key bounds
  *   help | quit
  * }}}
  *
  * `eval` is the whole interpreter and is pure-ish (lens map in, output
  * lines out) so a scripted session is spec-testable without a TTY;
  * `main` wires stdin over the standard testdata keyspaces. Output rows
  * are rendered in the reference's `=> (column=…, value=…, timestamp=…)`
  * shape, comparator-typed column names decoded like the CLI's
  * `AbstractType.getString`.
  */
object Shell {

  /** One openable column family: its lens plus how to parse/render
    * column names at the shell boundary (the comparator's getString /
    * fromString contract).
    */
  final case class ShellCf(lens: CassandraLens, comparator: ComparatorType.Value)

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

  /** The standard testdata keyspace: the orders and events CFs every
    * driver artifact uses (CellEncodings fixtures).
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
      CellEncodings.eventsMeta.comparator))

  private val GetCol = """get\s+(\w+)\['([^']*)'\]\['([^']*)'\]""".r
  private val Get = """get\s+(\w+)\['([^']*)'\](?:\s+limit\s+(\d+))?""".r
  private val Count = """count\s+(\w+)\['([^']*)'\]""".r
  private val Range = """range\s+(\w+)\['([^']*)':'([^']*)'\](?:\s+limit\s+(\d+))?""".r
  private val Set = """set\s+(\w+)\['([^']*)'\]\['([^']*)'\]\s*=\s*'([^']*)'""".r
  private val DelCol = """del\s+(\w+)\['([^']*)'\]\['([^']*)'\]""".r
  private val DelRow = """del\s+(\w+)\['([^']*)'\]""".r

  private val HelpText = Seq(
    "show keyspaces                           List column families.",
    "get <cf>['<key>'] [limit <n>]            Get a slice of columns.",
    "get <cf>['<key>']['<col>']               Get a column value.",
    "set <cf>['<key>']['<col>'] = '<value>'   Insert/update a column.",
    "del <cf>['<key>']['<col>']               Delete a column.",
    "del <cf>['<key>']                        Delete a whole record.",
    "count <cf>['<key>']                      Count columns in record.",
    "range <cf>['<start>':'<end>'] [limit n]  Slice a key range.",
    "quit                                     Exit this session.")

  /** One interactive session — the CLI's CONNECTION state: `set`/`del`
    * swap the mutated lens back into the CF map (mutations return a new
    * store view, CliClient.executeSet/executeDelete semantics), reads
    * delegate to the stateless [[eval]]. `now` supplies mutation
    * timestamps (millis — the CLI uses the wall clock; specs inject a
    * counter for determinism).
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
      line.trim match {
        case Set(cfName, key, colName, value) => withCf(cfName) { cf =>
          val spark = cf.lens.cells.sparkSession
          import spark.implicits._
          val ts = now()
          val mut = Seq((key, nameToBytes(colName, cf.comparator),
              value.getBytes("UTF-8"), ts))
            .toDF("key", "col_name", "value", "ts")
            .withColumn("super_name",
              org.apache.spark.sql.functions.lit(null).cast("binary"))
          cfs(cfName) = cf.copy(lens = cf.lens.insert(mut))
          Seq("Value inserted.")
        }
        case DelCol(cfName, key, colName) => withCf(cfName) { cf =>
          val spark = cf.lens.cells.sparkSession
          import spark.implicits._
          val ts = now()
          val del = Seq((key, nameToBytes(colName, cf.comparator), ts))
            .toDF("key", "col_name", "ts")
            .withColumn("super_name",
              org.apache.spark.sql.functions.lit(null).cast("binary"))
          cfs(cfName) = cf.copy(lens =
            cf.lens.removeColumns(del, (ts / 1000L).toInt))
          Seq("column removed.")
        }
        case DelRow(cfName, key) => withCf(cfName) { cf =>
          val spark = cf.lens.cells.sparkSession
          import spark.implicits._
          val ts = now()
          val del = Seq((key, ts)).toDF("key", "ts")
          cfs(cfName) = cf.copy(lens =
            cf.lens.removeRows(del, (ts / 1000L).toInt))
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
    def render(cf: ShellCf, rows: Array[org.apache.spark.sql.Row],
        withKey: Boolean): Seq[String] = {
      val cells = rows.map { r =>
        (r.getAs[String]("key"),
          nameToString(r.getAs[Array[Byte]]("col_name"), cf.comparator),
          new String(r.getAs[Array[Byte]]("value"), "UTF-8"),
          r.getAs[Long]("ts"))
      }.sortBy { case (k, n, _, _) =>
        // a decimal-rendered Long name sorts numerically via padding
        (k, if (n.nonEmpty && n.forall(_.isDigit)) f"${BigInt(n)}%030d" else n)
      }
      cells.map { case (k, n, v, ts) =>
        val prefix = if (withKey) s"key=$k " else ""
        s"=> ($prefix" + s"column=$n, value=$v, timestamp=$ts)"
      } :+ s"Returned ${cells.length} results."
    }
    line.trim match {
      case "" => Seq.empty
      case "help" => HelpText
      case "quit" | "exit" => Seq("bye")
      case "show keyspaces" =>
        cfs.toSeq.sortBy(_._1).map { case (n, cf) =>
          s"$n (comparator=${cf.comparator})"
        }
      case GetCol(cfName, key, colName) => withCf(cfName) { cf =>
        val rows = cf.lens.get(key, None,
          nameToBytes(colName, cf.comparator)).collect()
        if (rows.isEmpty) Seq("Value not found.")
        else render(cf, rows, withKey = false).init // single cell, no count line
      }
      case Get(cfName, key, limit) => withCf(cfName) { cf =>
        val n = Option(limit).map(_.toInt).getOrElse(100)
        render(cf, cf.lens.getSlice(key, None,
          SliceRange(count = n)).collect(), withKey = false)
      }
      case Count(cfName, key) => withCf(cfName) { cf =>
        val rows = cf.lens.getCount(Seq(key), None).collect()
        val n = rows.headOption.map(_.getAs[Long]("n")).getOrElse(0L)
        Seq(s"$n columns")
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
