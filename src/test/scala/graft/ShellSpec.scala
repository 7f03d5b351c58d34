package graft

import graft.api.CassandraLens
import graft.model.{Cell, CfMeta, ComparatorType}

/** Scripted-session spec for the packaged shell (the reference CLI
  * surface, cli/CliClient.java): a get / get_slice / range_slice triple
  * plus count, unknown-statement and not-found paths — all through the
  * ONE `eval` interpreter `main` wires to stdin. Super-column paths
  * (CliClient.java:125-134 grammar levels), comparator-order rendering
  * and native-timestamp-unit mutations get their own sessions.
  */
class ShellSpec extends SparkSpec {

  // three keys × columns, one LWW overwrite and one tombstone so the
  // shell answers the RECONCILED view, not the raw cells
  private lazy val cf = Shell.ShellCf(
    new CassandraLens(cellsDf(Seq(
      ins("ka", "c1", "old", 1), ins("ka", "c1", "new", 5),
      ins("ka", "c2", "b", 1), del("ka", "c2", 2),
      ins("kb", "c1", "x", 1),
      ins("kc", "c9", "z", 1))), CfMeta("t")),
    ComparatorType.Bytes)
  private lazy val cfs = Map("t" -> cf)

  private def out(line: String): Seq[String] = Shell.eval(cfs, line)

  test("get slice: reconciled columns of one key, count line appended") {
    // c2 is tombstoned, c1 reconciles to the ts=5 value
    assert(out("get t['ka']") == Seq(
      "=> (column=c1, value=new, timestamp=5)", "Returned 1 results."))
    assert(out("get t['kb'] limit 1") == Seq(
      "=> (column=c1, value=x, timestamp=1)", "Returned 1 results."))
  }

  test("get column: single value; missing column reports not found") {
    assert(out("get t['ka']['c1']") == Seq("=> (column=c1, value=new, timestamp=5)"))
    assert(out("get t['ka']['c2']") == Seq("Value not found."))
    assert(out("get t['zz']['c1']") == Seq("Value not found."))
  }

  test("range slice: key bounds inclusive, key limit honored, keys labeled") {
    assert(out("range t['ka':'kc'] limit 2") == Seq(
      "=> (key=ka column=c1, value=new, timestamp=5)",
      "=> (key=kb column=c1, value=x, timestamp=1)",
      "Returned 2 results."))
    assert(out("range t['kb':'kc']") == Seq(
      "=> (key=kb column=c1, value=x, timestamp=1)",
      "=> (key=kc column=c9, value=z, timestamp=1)",
      "Returned 2 results."))
  }

  test("ops readouts: describe splits and stats answer next to the data commands") {
    // describe_splits over the 3 live keys at n=2: the exact NTILE fill
    // (2 then 1) with OrderPreserving token = key
    assert(out("describe splits t 2") == Seq(
      "split 1: keys=2 ['ka':'kb']",
      "split 2: keys=1 ['kc':'kc']",
      "2 splits"))
    // cfstats-shaped census over the RAW cells: 6 cells, 3 keys, one
    // column tombstone, no row markers — NodeCmd's printColumnFamilyStats
    // shape from one column-pruned aggregate
    assert(out("stats t") == Seq(
      "Column Family: t",
      "Number of Keys (estimate): 3",
      "Cell count: 6",
      "Live cells: 5",
      "Tombstoned cells: 1",
      "Deletion markers: 0"))
    assert(out("stats nope") ==
      Seq("unknown column family: nope (try 'show keyspaces')"))
  }

  test("session writes: set upserts (LWW), del removes column and row, state persists") {
    var t = 100L
    val sess = new Shell.Session(Map("t" -> cf), now = () => { t += 1; t })
    assert(sess.eval("set t['kb']['c2'] = 'fresh'") == Seq("Value inserted."))
    assert(sess.eval("get t['kb']['c2']").head.contains("value=fresh"))
    // LWW: a later set overwrites
    assert(sess.eval("set t['kb']['c2'] = 'fresher'") == Seq("Value inserted."))
    assert(sess.eval("get t['kb']['c2']").head.contains("value=fresher"))
    // column delete tombstones it away; the rest of the row survives
    assert(sess.eval("del t['kb']['c2']") == Seq("column removed."))
    assert(sess.eval("get t['kb']['c2']") == Seq("Value not found."))
    assert(sess.eval("get t['kb']['c1']").head.contains("value=x"))
    // row delete shadows everything under the key
    assert(sess.eval("del t['ka']") == Seq("row removed."))
    assert(sess.eval("get t['ka']") == Seq("Returned 0 results."))
    // reads still flow through the shared interpreter
    assert(sess.eval("count t['kc']") == Seq("1 columns"))
    assert(sess.eval("set nope['k']['c'] = 'v'").head.startsWith("unknown column family"))
  }

  test("count, show keyspaces, errors and help are answered") {
    assert(out("count t['ka']") == Seq("1 columns"))
    assert(out("show keyspaces") == Seq("t (comparator=Bytes)"))
    assert(out("get nope['k']").head.startsWith("unknown column family"))
    assert(out("frobnicate").head.startsWith("Invalid statement"))
    assert(out("help").nonEmpty && out("quit") == Seq("bye"))
    assert(out("get t['']").head.startsWith("error:")) // zero-length key rejected
  }

  test("Long comparator: negative names render and sort in comparator order") {
    // -5 < 3 < 10 numerically; the old rendered-string sort put '-5'
    // lexicographically among zero-padded non-negatives
    val lcf = Shell.ShellCf(
      new CassandraLens(cellsDf(Seq(
        Cell("k", null, bl(10L), b("ten"), 1, tombstone = false, 0),
        Cell("k", null, bl(-5L), b("neg"), 1, tombstone = false, 0),
        Cell("k", null, bl(3L), b("three"), 1, tombstone = false, 0))),
        CfMeta("lt", comparator = ComparatorType.Long_)),
      ComparatorType.Long_)
    assert(Shell.eval(Map("lt" -> lcf), "get lt['k']") == Seq(
      "=> (column=-5, value=neg, timestamp=1)",
      "=> (column=3, value=three, timestamp=1)",
      "=> (column=10, value=ten, timestamp=1)",
      "Returned 3 results."))
  }

  private def superCf = Shell.ShellCf(
    new CassandraLens(cellsDf(Seq(
      ins("ka", "c1", "v1", 1, sup = "s1"), ins("ka", "c2", "v2", 1, sup = "s1"),
      ins("ka", "c1", "w1", 1, sup = "s2"),
      ins("kb", "c1", "u1", 1, sup = "s1"))),
      CfMeta("sup", isSuper = true)),
    ComparatorType.Bytes)

  test("super CF reads: supercolumn slice, whole supercolumn, subcolumn, counts") {
    val m = Map("s" -> superCf)
    assert(Shell.eval(m, "get s['ka']") == Seq(
      "=> (super_column=s1, (column=c1, value=v1, timestamp=1), " +
        "(column=c2, value=v2, timestamp=1))",
      "=> (super_column=s2, (column=c1, value=w1, timestamp=1))",
      "Returned 2 results."))
    // two brackets on a super CF address the supercolumn
    assert(Shell.eval(m, "get s['ka']['s1']") == Seq(
      "=> (super_column=s1, (column=c1, value=v1, timestamp=1), " +
        "(column=c2, value=v2, timestamp=1))"))
    assert(Shell.eval(m, "get s['ka']['s1']['c2']") ==
      Seq("=> (column=c2, value=v2, timestamp=1)"))
    assert(Shell.eval(m, "get s['ka']['zz']") == Seq("Value not found."))
    assert(Shell.eval(m, "get s['ka']['s1']['zz']") == Seq("Value not found."))
    // count without a super level counts supercolumns; with one, subcolumns
    assert(Shell.eval(m, "count s['ka']") == Seq("2 columns"))
    assert(Shell.eval(m, "count s['ka']['s1']") == Seq("2 columns"))
    // super paths are rejected on a standard CF, and vice versa
    assert(Shell.eval(cfs, "get t['ka']['s']['c']").head.startsWith("error:"))
    assert(Shell.eval(cfs, "count t['ka']['s']").head.startsWith("error:"))
    assert(Shell.eval(m, "show keyspaces") ==
      Seq("s (super, comparator=Bytes, subcomparator=Bytes)"))
  }

  test("super CF writes: set/del at supercolumn and subcolumn level") {
    var t = 100L
    val sess = new Shell.Session(Map("s" -> superCf), now = () => { t += 1; t })
    // set requires the full super path on a super CF
    assert(sess.eval("set s['ka']['cX'] = 'v'").head.startsWith("error:"))
    assert(sess.eval("set s['ka']['s2']['c9'] = 'nv'") == Seq("Value inserted."))
    assert(sess.eval("get s['ka']['s2']") == Seq(
      "=> (super_column=s2, (column=c1, value=w1, timestamp=1), " +
        "(column=c9, value=nv, timestamp=101))"))
    // subcolumn delete keeps the supercolumn's siblings
    assert(sess.eval("del s['ka']['s1']['c1']") == Seq("column removed."))
    assert(sess.eval("get s['ka']['s1']") == Seq(
      "=> (super_column=s1, (column=c2, value=v2, timestamp=1))"))
    // supercolumn delete shadows everything under it
    assert(sess.eval("del s['ka']['s2']") == Seq("supercolumn removed."))
    assert(sess.eval("get s['ka']['s2']") == Seq("Value not found."))
    assert(sess.eval("get s['ka']") == Seq(
      "=> (super_column=s1, (column=c2, value=v2, timestamp=1))",
      "Returned 1 results."))
  }

  test("mutations stamp the CF's native timestamp unit (events-shaped nanos)") {
    // eventsCells-shaped: cell ts in NANOS. A millis-stamped set (the old
    // behavior) could never LWW-shadow these cells; tsUnitPerMilli scales
    // the session clock into the CF's timeline.
    val nanos = 1600000000000000000L
    val evCf = Shell.ShellCf(
      new CassandraLens(cellsDf(Seq(
        Cell("u1", null, bl(7L), b("click"), nanos, tombstone = false, 0))),
        CfMeta("ev", comparator = ComparatorType.Long_)),
      ComparatorType.Long_, tsUnitPerMilli = 1000000L)
    val wallMs = 1700000000000L // a realistic epoch-millis clock
    val sess = new Shell.Session(Map("ev" -> evCf), now = () => wallMs)
    assert(sess.eval("set ev['u1']['7'] = 'view'") == Seq("Value inserted."))
    assert(sess.eval("get ev['u1']['7']") ==
      Seq(s"=> (column=7, value=view, timestamp=${wallMs * 1000000L})"))
    // a tombstone at the same scaled ts shadows the equal-ts insert
    assert(sess.eval("del ev['u1']") == Seq("row removed."))
    assert(sess.eval("get ev['u1']") == Seq("Returned 0 results."))
  }
}
