"""Morphology lemmatizer tests (SURVEY §2 A8-A11). Pure Python."""

from hypothesis import given
from hypothesis import strategies as st

from php_lucene_analyzer_spark.analysis.morphology import (
    ENGLISH_CODEC, RUSSIAN_CODEC, EnglishStemmerPolicy, Heuristic,
    Morphology, lemma_expand, russian_clean)
from php_lucene_analyzer_spark.analysis.tokenizer import Token

ROWS = [
    ("running", "run", "VBG"),
    ("ran", "run", "VBD"),
    ("runs", "run", "VBZ"),
    ("mice", "mouse", "NNS"),
    ("geese", "goose", "NNS"),
    ("walking", "walk", "VBG"),
    ("walked", "walk", "VBD"),
    ("talks", "talk", "VBZ"),
    ("talking", "talk", "VBG"),
    ("better", "good", "JJR"),
    ("better", "well", "RBR"),       # ambiguous lemma -> two heuristics
    ("leaves", "leaf", "NNS"),
    ("leaves", "leave", "VBZ"),
]


def _morph():
    return Morphology.build(ROWS)


def test_exact_lookup():
    m = _morph()
    assert m.normal_forms("running") == ["run"]
    assert m.normal_forms("mice") == ["mouse"]
    assert m.normal_forms("geese") == ["goose"]


def test_ambiguous_lemmas_stack():
    m = _morph()
    assert sorted(m.normal_forms("leaves")) == ["leaf", "leave"]
    assert sorted(m.normal_forms("better")) == ["good", "well"]
    info = dict(m.morph_info("running"))
    assert info["run"] == "VBG"


def test_suffix_generalization():
    m = _morph()
    # unseen word sharing the -ing suffix family resolves via the block
    # of its nearest reversed neighbor
    forms = m.normal_forms("jumping")
    assert any(f != "jumping" for f in forms)


def test_gate_passthrough():
    m = _morph()
    # non-[a-z-] words pass through unchanged (checkString gate)
    assert m.normal_forms("Sch0ne") == ["Sch0ne"]
    assert m.normal_forms("C3PO") == ["C3PO"]


def test_identity_fallback():
    m = _morph()
    assert m.normal_forms("zqzq") == ["zqzq"]


def test_english_policy_tiebreak():
    m = Morphology.build(ROWS + [("walk", "walk", "VB"),
                                 ("walks", "walk", "VBZ"),
                                 ("data", "data", "NN"),
                                 ("data", "datum", "NN")])
    pol = EnglishStemmerPolicy(m)
    assert pol.stem("walks") == "walk"       # single form
    assert pol.stem("data") == "datum"       # identity dropped, survivor
    assert pol.stem("better") == "better"    # two non-identity -> keep
    assert pol.stem("xyzzy") == "xyzzy"      # unknown -> identity


def test_lemma_expand_positions():
    m = _morph()
    toks = [Token("leaves", 0, 6, 1, 1, "<ALPHANUM>"),
            Token("running", 7, 14, 1, 1, "<ALPHANUM>")]
    out = lemma_expand(toks, m)
    terms = [(t.term, t.pos_inc) for t in out]
    assert ("leaf", 1) in terms or ("leave", 1) in terms
    stacked = [t for t in out if t.pos_inc == 0]
    assert len(stacked) == 1  # second lemma of 'leaves' at same position
    assert terms[-1] == ("run", 1)


def test_codec_roundtrip_known():
    for w in ("run", "hyphen-ated", "abcdefghijk", "z" * 13):
        assert ENGLISH_CODEC.decode(ENGLISH_CODEC.encode(w)) == w
    assert not ENGLISH_CODEC.check("Upper")
    assert not ENGLISH_CODEC.check("with space")
    assert RUSSIAN_CODEC.check(russian_clean("ёлка"))
    assert russian_clean("ёж") == "еж"


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1,
               max_size=30))
def test_codec_roundtrip_property(w):
    assert ENGLISH_CODEC.decode(ENGLISH_CODEC.encode(w)) == w


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
               max_size=12))
def test_codec_order_preserving(w):
    """encoding preserves per-block lexicographic order — the property
    that makes string binary search equivalent to the reference's
    encoded-int search."""
    other = "m" * len(w)
    if len(w) <= 6:
        assert (w < other) == (ENGLISH_CODEC.encode(w) < ENGLISH_CODEC.encode(other))


# --- the reference's SHIPPED english model (data fixture, read-only:
# english/morph.info — the file Morphology.php:187-247 deserializes) ---

import os

import pytest

_MORPH_INFO = "/root/reference/src/analyses/morphology/english/morph.info"


@pytest.fixture(scope="module")
def real_model():
    if not os.path.exists(_MORPH_INFO):
        pytest.skip("reference checkout not present")
    from php_lucene_analyzer_spark.analysis.morphology import MorphInfoModel
    return MorphInfoModel.load(_MORPH_INFO)


def test_real_morph_info_shape(real_model):
    # counts recorded in SURVEY §1.5 for this file
    assert len(real_model.separators) == 55457
    assert len(real_model.rules_id) == 55457
    assert len(real_model.rules) == 860
    assert len(real_model.grammar) == 83
    # int-array separators are sorted under tuple order (compareToInts)
    assert real_model.separators == sorted(real_model.separators)


def test_real_morph_info_lemmas(real_model):
    """Golden vectors over the reference's own data: regular suffix
    rewrites AND irregular forms only a faithful model lookup can get."""
    m = real_model
    assert m.normal_forms("running") == ["running", "run"]
    assert m.normal_forms("cats") == ["cat"]
    assert m.normal_forms("cities") == ["city"]
    assert m.normal_forms("walked") == ["walk"]
    # irregulars: impossible for a suffix-stripper without the dictionary
    assert m.normal_forms("mice") == ["mouse"]
    assert m.normal_forms("went") == ["go"]
    assert m.normal_forms("was") == ["be"]
    assert m.normal_forms("children") == ["child"]
    assert m.normal_forms("feet") == ["foot"]
    assert m.normal_forms("better") == ["well", "better", "good"]
    # identity fallback for out-of-alphabet input
    assert m.normal_forms("can't") == ["can't"]
    assert m.normal_forms("x1y2") == ["x1y2"]


def test_real_morph_info_policy_and_tags(real_model):
    from php_lucene_analyzer_spark.analysis.morphology import (
        EnglishStemmerPolicy)

    st = EnglishStemmerPolicy(real_model)
    # one form -> it; several incl. identity -> unique survivor
    assert st.stem("cats") == "cat"
    assert st.stem("running") == "run"
    assert st.stem("went") == "go"
    # several non-identity survivors -> keep the word
    assert st.stem("better") == "better"
    # grammar tags resolve through formMorphInfo indices
    infos = real_model.morph_info("cats")
    assert any(form == "cat" and tag for form, tag in infos)


def test_real_morph_info_lemma_expand(real_model):
    """MorphologyFilter semantics over the real model: lemma stacks share
    the position (pos_inc 0 on the 2nd+)."""
    from php_lucene_analyzer_spark.analysis import analyze
    from php_lucene_analyzer_spark.analysis.morphology import lemma_expand

    toks = [t for t in analyze("children running", stemming=False)]
    out = lemma_expand(toks, real_model)
    terms = [(t.term, t.pos_inc) for t in out]
    assert ("child", 1) in terms
    assert ("running", 1) in terms and ("run", 0) in terms


def test_morph_info_serialize_roundtrip(real_model):
    """serialize() emits the reference's writeToFile layout; a re-parse
    reproduces the full model (all 55,457 separators, rules, grammar)."""
    from php_lucene_analyzer_spark.analysis.morphology import MorphInfoModel

    again = MorphInfoModel.parse(real_model.serialize())
    assert again.separators == real_model.separators
    assert again.rules_id == real_model.rules_id
    assert again.rules == real_model.rules
    assert again.grammar == real_model.grammar
    assert again.normal_forms("mice") == ["mouse"]
