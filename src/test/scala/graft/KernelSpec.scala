package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.link.{JaroWinkler, NameFeatures}
import graft.text.Tok

class KernelSpec extends AnyFunSuite {

  test("JaroWinkler matches the reference implementation bit-for-bit") {
    // expected values computed by executing the reference's
    // _jaro_winkler_similarity (entity_deduplication.py:573-639) verbatim
    val cases = Seq(
      ("Skyline Systems", "Skyline Systems Inc.", 0.95),
      ("Maria Alvarez", "Maria A. Alvarez", 0.9394230769230769),
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "", 0.0),
      ("same", "same", 1.0),
      ("Nova Energy", "Nova Capital", 0.7742424242424242))
    cases.foreach { case (a, b, expected) =>
      assert(JaroWinkler.similarity(a, b) === expected, s"jw($a, $b)")
    }
    // symmetric
    assert(JaroWinkler.similarity("dixon", "dicksonx") ===
      JaroWinkler.similarity("dicksonx", "dixon"))
  }

  test("tokenizer counts words and punctuation deterministically") {
    assert(Tok.tokenize("Acme Corp. acquired Beta on 2021-05-12.") ===
      Vector("Acme", "Corp", ".", "acquired", "Beta", "on",
        "2021", "-", "05", "-", "12", "."))
    assert(Tok.countTokens("") === 0)
    assert(Tok.countTokens("don't stop") === 2)
  }

  test("sentence split matches the reference fallback regex") {
    // chunker.py:180-193 — split after [.!?] + whitespace, trim, drop empty
    assert(Tok.sentenceSplit("One. Two!  Three? Four") ===
      Vector("One.", "Two!", "Three?", "Four"))
    assert(Tok.sentenceSplit("No terminal") === Vector("No terminal"))
    assert(Tok.sentenceSplit("Mid. sentence") === Vector("Mid.", "sentence"))
  }

  test("entity name normalization and simplification match the reference") {
    assert(Tok.normalizeEntityName("  Acme   Corp.  ") === "Acme Corp")
    assert(Tok.simplifyEntityName("The Acme Corporation") === "Acme")
    assert(Tok.simplifyEntityName("Dr. Maria Alvarez") === "Maria Alvarez")
    assert(Tok.simplifyEntityName("Beta Inc.") === "Beta")
  }

  test("name feature cosine: identical=1, disjoint~0, suffix-invariant") {
    assert(math.abs(NameFeatures.cosine("Acme Corp", "Acme Corp") - 1.0) < 1e-12)
    // NB: suffix stripping is case-sensitive like the reference
    // (relation_extractor.py:357-374), so compare same-case variants
    assert(math.abs(NameFeatures.cosine("Acme  Corp", "Acme Corp") - 1.0) < 1e-9)
    assert(NameFeatures.cosine("xyzq", "abcd") < 0.3)
    // suffix-stripped simplification makes corporate alias variants
    // collapse to cosine ~1 (the semantic-embedding stand-in contract);
    // NER-normalized forms have no trailing dot
    val alias = NameFeatures.cosine("Skyline Systems", "Skyline Systems Inc")
    assert(alias > 0.99, s"alias cosine $alias should clear the accept bar")
    val person = NameFeatures.cosine("Maria Alvarez", "Maria A. Alvarez")
    assert(person > 0.85, s"person alias cosine $person")
    val diff = NameFeatures.cosine("Nova Energy", "Nova Capital")
    assert(diff < 0.85, s"distinct orgs must stay below accept bar, got $diff")
  }

  test("are_entities_similar legacy pairwise short-circuit order") {
    import graft.link.Linker.areEntitiesSimilar
    // exact lowercase match wins before the type check fires
    assert(areEntitiesSimilar("ACME Corp ", "ORGANIZATION", "acme corp", "PRODUCT"))
    // type mismatch rejects non-identical names
    assert(!areEntitiesSimilar("Acme Corp", "ORGANIZATION", "Acme Corps", "PRODUCT"))
    // JW >= 0.95 accepts without the embedding stage
    assert(areEntitiesSimilar("Acme Corporation", "ORGANIZATION",
      "Acme Corporatio", "ORGANIZATION"))
    // JW < 0.5 rejects outright
    assert(!areEntitiesSimilar("Acme", "ORGANIZATION", "Zenith Networks",
      "ORGANIZATION"))
    // ambiguous band: needs cosine >= 0.85 AND JW >= 0.7
    assert(areEntitiesSimilar("Skyline Systems", "ORGANIZATION",
      "Skyline Systems Inc", "ORGANIZATION"))
    assert(!areEntitiesSimilar("Nova Energy", "ORGANIZATION", "Nova Capital",
      "ORGANIZATION"))
  }
}
