package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Property sweep for the t35/t36 unigram-LM tokenizer on RANDOM word
  * dictionaries (not just the corpus's 40-word vocabulary): the EM
  * trainer must ascend in log-likelihood, produce a normalized model
  * that covers the alphabet, and the Viterbi decoder must reconstruct
  * every word and never score below an exhaustively-enumerated
  * alternative segmentation.
  */
class UnigramPropertySpec extends AnyFunSuite {

  private val genDict: Gen[Seq[(String, Long)]] = for {
    nWords <- Gen.choose(3, 25)
    alpha <- Gen.choose(3, 8) // alphabet size — small so substrings repeat
    words <- Gen.listOfN(nWords, for {
      len <- Gen.choose(1, 9)
      cs <- Gen.listOfN(len, Gen.choose(0, alpha - 1).map(i => ('a' + i).toChar))
    } yield cs.mkString)
    freqs <- Gen.listOfN(nWords, Gen.choose(1L, 50L))
  } yield words.distinct.zip(freqs)

  test("unigram trainer + Viterbi hold their invariants on random dicts") {
    val prop = Prop.forAllNoShrink(genDict) { dict =>
      if (dict.isEmpty) Prop.passed
      else {
        val (model, lls) = TextAnalysis.unigramTrainLocal(dict)
        val logp = model.toMap
        // normalization
        val total = model.map(t => math.exp(t._2)).sum
        assert(math.abs(total - 1.0) < 1e-6, s"probs sum to $total")
        // alphabet coverage
        val chars = dict.flatMap(_._1.map(_.toString)).toSet
        assert(chars.subsetOf(logp.keySet),
          s"missing singles: ${chars -- logp.keySet}")
        // EM monotone ascent (final phase)
        lls.sliding(2).foreach {
          case Seq(a, b) => assert(b >= a - 1e-6, s"LL fell $a -> $b")
          case _ => ()
        }
        // Viterbi: reconstruction + optimality vs exhaustive enumeration
        def allSegs(w: String): Seq[Seq[String]] =
          if (w.isEmpty) Seq(Seq.empty)
          else (1 to math.min(TextAnalysis.UniMaxPieceLen, w.length))
            .flatMap { l =>
              val h = w.take(l)
              if (logp.contains(h)) allSegs(w.drop(l)).map(h +: _) else Nil
            }
        dict.map(_._1).foreach { w =>
          val got = TextAnalysis.unigramEncodeWord(w, logp)
          assert(got.mkString == w, s"'$w' decoded to '${got.mkString}'")
          val best = allSegs(w).map(_.map(logp).sum).max
          assert(got.map(logp).sum >= best - 1e-9, s"'$w' suboptimal")
        }
        Prop.passed
      }
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(40)
    val result = org.scalacheck.Test.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
