package graft

import org.scalatest.funsuite.AnyFunSuite

/** The id-domain headroom guard. The incremental-recurrence family
  * (x32-x42, ST8/ST9) packs `id << 20 | setSize` into one long, so
  * every id — corpus, replica, or arrival-offset — must stay under
  * [[operators.Dedup.PackedIdBound]] (2⁴³). Three arrival domains
  * already sit at 5/6/7·10¹²; this spec fails the build the moment a
  * new domain (or a bigger supported replica) would overflow or let
  * two domains collide, instead of letting the pair generator wrap
  * packed ids silently at some replica scale nobody re-tested. */
class IdDomainSpec extends AnyFunSuite {

  // the largest corpus id any SUPPORTED replica can produce: copies
  // stride by MakeScale.Stride and within-copy ids stay under one
  // stride, so MaxSupportedCopies · Stride bounds them all
  private val maxReplicaCorpusId =
    MakeScale.MaxSupportedCopies * MakeScale.Stride

  test("every declared arrival offset + the largest supported replica " +
      "id stays under the pair generator's packed-id bound") {
    assert(ExtensionQueries.ArrivalOffsets.nonEmpty)
    ExtensionQueries.ArrivalOffsets.foreach { case (kind, off) =>
      assert(off + maxReplicaCorpusId < operators.Dedup.PackedIdBound,
        s"arrival domain '$kind' at $off overflows the 2^43 packing " +
          s"bound at a ${MakeScale.MaxSupportedCopies}-copy replica — " +
          "widen the packing (fewer SizeBits) or claim a smaller offset")
    }
  }

  test("arrival domains cannot collide at full replica scale (each " +
      "offset's id range ends before the next begins)") {
    val sorted = ExtensionQueries.ArrivalOffsets.toSeq.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((ka, a), (kb, b)) =>
        assert(a + maxReplicaCorpusId <= b,
          s"domains '$ka' ($a) and '$kb' ($b) overlap at a " +
            s"${MakeScale.MaxSupportedCopies}-copy replica")
      case _ => ()
    }
    // corpus ids themselves must end before the first arrival domain
    assert(maxReplicaCorpusId <= sorted.head._2,
      "replica corpus ids reach into the first arrival domain")
  }

  test("headroom ledger: the next 10^12 slot does NOT fit — a fourth " +
      "arrival kind requires widening the packing first") {
    val nextSlot = ExtensionQueries.ArrivalOffsets.values.max +
      1000000000000L
    // If this ever starts failing because the packing WAS widened,
    // update the assertion — it exists to document that today the
    // domain space is exhausted, so "just add 8e12" is not an option.
    assert(nextSlot + maxReplicaCorpusId >= operators.Dedup.PackedIdBound,
      "the packed-id bound now fits another 10^12 domain — update " +
        "this ledger test and the SURVEY headroom note")
  }
}
