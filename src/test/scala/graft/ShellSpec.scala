package graft

import graft.api.CassandraLens
import graft.model.{CfMeta, ComparatorType}

/** Scripted-session spec for the packaged shell (the reference CLI
  * surface, cli/CliClient.java): a get / get_slice / range_slice triple
  * plus count, unknown-statement and not-found paths — all through the
  * ONE `eval` interpreter `main` wires to stdin.
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
}
