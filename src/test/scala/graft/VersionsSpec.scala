package graft

import graft.extract.Extract
import graft.version.Versions

/** Version-chain invariants (reference function_versioning.py:283-411):
  * new version only on state-hash change; the chain per entity is a path. */
class VersionsSpec extends SparkSpec {

  private def mentionsFor(rows: (String, Int, String)*) =
    Extract.mentions(turns(rows: _*))

  test("versions emitted only on state change; chain is a dense path") {
    val m = mentionsFor(
      ("c1", 0, "define entity t:e with qty=1"),
      ("c1", 1, "define entity t:e with qty=1"), // no change -> no version
      ("c1", 2, "define entity t:e with qty=2"),
      ("c1", 3, "define entity t:e with qty=2"),
      ("c1", 4, "define entity t:e with qty=1")) // change back -> new version
    val vn = Versions.versionNodes(m)
    val seqs = vn.collect().map(r => (r.getAs[Long]("version_seq"), r.getAs[String]("state"))).sortBy(_._1)
    assert(seqs.toSeq === Seq((1L, "1"), (2L, "2"), (3L, "1")))
    val ve = Versions.versionEdges(vn)
    assert(rowSet(ve.select("entity", "src_seq", "dst_seq")) ===
      Set(Seq("t:e", 1L, 2L), Seq("t:e", 2L, 3L)))
    val latest = Versions.latestVersions(vn).collect().head
    assert(latest.getAs[Long]("version_seq") === 3L)
    assert(latest.getAs[String]("state") === "1")
  }

  test("entities without state payload produce no versions") {
    val m = mentionsFor(("c1", 0, "define entity t:plain"))
    assert(Versions.versionNodes(m).count() === 0)
  }

  test("chains are per-entity and ordered by ts with stable tiebreak") {
    val m = mentionsFor(
      ("c1", 0, "define entity t:a with qty=5"),
      ("c2", 0, "define entity t:a with qty=6"),
      ("c1", 1, "define entity t:b with qty=9"))
    val vn = Versions.versionNodes(m)
    // t:a: ts ties between c1/c2 broken by conv_id ('c1' < 'c2')
    val a = vn.filter("entity = 't:a'").collect().sortBy(_.getAs[Long]("version_seq"))
    assert(a.map(_.getAs[String]("state")).toSeq === Seq("5", "6"))
    assert(vn.filter("entity = 't:b'").count() === 1)
  }
}
