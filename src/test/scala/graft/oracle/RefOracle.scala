package graft.oracle

import scala.collection.mutable

/** Single-threaded reimplementation of the extraction semantics, written in
  * the *reference's* style: walk each conversation's turns in order,
  * threading mutable alias/def state (package/call_graph.py:388-435,
  * 703-749), then form triples by an entity-membership check
  * (call_graph.py:276-315). Shares no code with the engine — this is the
  * independent semantic oracle for the P/R >= 0.95 parity metric
  * (BASELINE.json north rule, SURVEY.md §5).
  */
object RefOracle {
  case class T(convId: String, turnIdx: Int, text: String)

  private val DefRe = """^define entity ([A-Za-z]+:[A-Za-z0-9_#]+)(?: with qty=([0-9]+))?(?: extends ([A-Za-z]+:[A-Za-z0-9_#]+))?$""".r
  private val AliasRe = """^alias (a[0-9]+) => ([A-Za-z]+:[A-Za-z0-9_#]+)$""".r
  private val LinkRe = """^link (self|a[0-9]+|[A-Za-z]+:[A-Za-z0-9_#]+) -\[([a-z_]+)\]-> (self|a[0-9]+|[A-Za-z]+:[A-Za-z0-9_#]+)$""".r
  private val ChainRe = """^chain (self|a[0-9]+|[A-Za-z]+:[A-Za-z0-9_#]+) -\[([a-z_]+)\]-> (self|a[0-9]+|[A-Za-z]+:[A-Za-z0-9_#]+) -\[([a-z_]+)\]-> (self|a[0-9]+|[A-Za-z]+:[A-Za-z0-9_#]+)$""".r

  /** Emit the (subj, pred, obj) triple set with knownEntitiesOnly semantics. */
  def triples(corpus: Seq[T]): Set[(String, String, String)] = {
    val defined = mutable.Set[String]()
    val raw = mutable.ListBuffer[(String, String, String)]()
    corpus.groupBy(_.convId).foreach { case (_, ts) =>
      val ordered = ts.sortBy(_.turnIdx)
      // `self` = first entity_def seen SO FAR in the walk (enclosing-scope
      // semantics: self -> enclosing class, call_graph.py:738 — a def always
      // precedes its uses); before any def, self is unresolved -> identity.
      var self: Option[String] = None
      val aliases = mutable.Map[String, String]()
      ordered.foreach { t =>
        t.text.split(" ; ", -1).foreach {
          case DefRe(name, _, parent) =>
            defined += name
            // an extends clause defines the container entity too (it joins
            // the node vocabulary, mirroring Triples.entityNames)
            if (parent != null) defined += parent
            if (self.isEmpty) self = Some(name)
          case AliasRe(a, target) => aliases(a) = target
          case LinkRe(s, p, o) =>
            def res(r: String): String =
              if (r == "self") self.getOrElse(r)
              else if (r.matches("^a[0-9]+$")) aliases.getOrElse(r, r)
              else r
            raw += ((res(s), p, res(o)))
          case ChainRe(s, p1, mid, p2, o) =>
            // chained-call split: one mention -> two triples
            def res(r: String): String =
              if (r == "self") self.getOrElse(r)
              else if (r.matches("^a[0-9]+$")) aliases.getOrElse(r, r)
              else r
            raw += ((res(s), p1, res(mid)))
            raw += ((res(mid), p2, res(o)))
          case _ => () // narration
        }
      }
    }
    raw.filter(t => defined.contains(t._3)).toSet
  }

  /** Containment/inheritance oracle: distinct (child, parent) pairs from
    * `extends` clauses (reference class_class_edges 'inherits_from',
    * knowledge_graph.py:1122-1197). */
  def containment(corpus: Seq[T]): Set[(String, String)] =
    corpus.flatMap(_.text.split(" ; ", -1).collect {
      case DefRe(name, _, parent) if parent != null => (name, parent)
    }).toSet
}
