package graft.engine

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized undo inversion (SURVEY §5.2): after any mutation batch, one
  * undo returns the graph to the exact previous state (all payloads, not
  * just uid sets), for arbitrary op sequences. */
class UndoPropertySpec extends AnyFunSuite with SparkSpec {

  private def stateOf(g: MemGraph): (Map[String, Map[String, Any]], Map[String, Map[String, Any]]) = {
    def scrub(m: Map[String, Any]) = m - "mtime" // undo restores values; mtime is re-touched
    (g.nodesMap.toMap.map { case (k, v) => k -> scrub(v) },
      g.edgesMap.toMap.map { case (k, v) => k -> scrub(v) })
  }

  test("every mutation batch is exactly inverted by one undo") {
    val rng = new Random(99)
    val g = MemGraph(spark)
    val live = scala.collection.mutable.ArrayBuffer.empty[Node]
    // seed
    for (_ <- 1 to 4) live += g.node("P", "v" -> rng.nextInt(10)).save()

    for (step <- 1 to 40) {
      val before = stateOf(g)
      val journalBefore = g.countChanges
      rng.nextInt(4) match {
        case 0 =>
          live += g.node("P", "v" -> rng.nextInt(10)).save()
        case 1 if live.exists(_.exists) =>
          val alive = live.filter(_.exists)
          val (a, b) = (alive(rng.nextInt(alive.size)), alive(rng.nextInt(alive.size)))
          g.edge(a, "E", b).save()
        case 2 if live.exists(_.exists) =>
          val alive = live.filter(_.exists)
          val fresh = g.getuid(alive(rng.nextInt(alive.size)).uid).get
          fresh("v") = rng.nextInt(10)
          fresh.save() // same-value writes journal nothing (diff suppression)
        case 3 if live.exists(_.exists) =>
          val alive = live.filter(_.exists)
          alive(rng.nextInt(alive.size)).delete(disconnect = true)
        case _ => ()
      }
      if (g.countChanges > journalBefore) {
        // half the time keep the mutation so the graph evolves (and later
        // deletes exercise edge cascades in a shared undo batch)
        if (rng.nextBoolean()) {
          g.undo()
          assert(stateOf(g) == before, s"step $step: undo did not restore state")
        }
      } else {
        assert(stateOf(g) == before, s"step $step: no-op mutated state")
      }
    }
  }
}
