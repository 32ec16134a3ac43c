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
