package graft.query

/** Chain-pattern DSL parser.
  *
  * Grammar (reference `_parsechain`, graphydb.py:741-807): a chain is
  * whitespace-separated links, each a node `(n)` / `[n]` or a directed edge
  * `-(e)>` / `<(e)-` (square brackets mark the collected link). An alias may
  * carry a `:Kind` suffix; a collected link may list extra computed columns
  * after commas: `[p:Person,strength]`, whose expression strings come from
  * the params map. Collection defaults to the right-most link
  * (graphydb.py:804-805); aliases must be unique (790-791).
  */
object Chain {

  final case class Link(
      alias: String,
      isEdge: Boolean,
      // join-key columns seen from the left / right neighbour
      leftuid: String,
      rightuid: String,
      kind: Option[String],
      extras: Vector[String],
      collected: Boolean)

  final case class Parsed(links: Vector[Link], collectIdx: Int) {
    def collect: Link = links(collectIdx)
  }

  final case class ChainParseException(msg: String) extends RuntimeException(msg)

  private val Plain = """\(([\w:]+)\)""".r.unanchored
  private val Collect = """\[([\w:,]+)\]""".r.unanchored

  /** @param params extra-column name → SQL expression string; names referenced
    *               by the collected link must be present (graphydb.py:776-781).
    * @return parsed links plus the set of param names consumed as extras. */
  def parse(chain: String, params: Map[String, String] = Map.empty): (Parsed, Set[String]) = {
    var seen = Set.empty[String]
    var consumed = Set.empty[String]
    var collectIdx = -1
    val links = chain.trim.split("\\s+").toVector.zipWithIndex.map { case (p, i) =>
      val (isEdge, leftuid, rightuid) =
        if (p.endsWith(">")) (true, "startuid", "enduid")
        else if (p.startsWith("<")) (true, "enduid", "startuid")
        else (false, "uid", "uid")

      val (aliasSpec, extras, collected) = p match {
        case Collect(inner) =>
          val parts = inner.split(",").toVector
          (parts.head, parts.tail, true)
        case Plain(inner) => (inner, Vector.empty[String], false)
        case _ => throw ChainParseException(s"Error in parsing format: '$p'")
      }

      val (alias, kind) = aliasSpec.split(":") match {
        case Array(a)    => (a, None)
        case Array(a, k) => (a, Some(k))
        case _ => throw ChainParseException(s"Error in parsing format: '$p'")
      }
      if (seen.contains(alias))
        throw ChainParseException(s"Aliases must be unique ($alias multiply defined)")
      seen += alias

      extras.foreach { e =>
        if (!params.contains(e))
          throw ChainParseException(s"""Item "$e" not given an expansion""")
        consumed += e
      }
      if (collected) collectIdx = i
      Link(alias, isEdge, leftuid, rightuid, kind, extras, collected)
    }
    if (links.isEmpty) throw ChainParseException("Empty chain")
    // default: right-most link is collected
    val idx = if (collectIdx >= 0) collectIdx else links.length - 1
    val fixed =
      if (collectIdx >= 0) links
      else links.updated(idx, links(idx).copy(collected = true))
    (Parsed(fixed, idx), consumed)
  }
}
