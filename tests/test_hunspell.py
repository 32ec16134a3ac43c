"""Hunspell loader + stemmer tests (SURVEY §2 A12-A14) over a synthetic
dictionary exercising: prefixes, suffixes with strip + condition,
cross-product, continuation-class double suffixes, ICONV, IGNORE,
KEEPCASE / NEEDAFFIX gates, flag strategies. No Spark needed."""

from php_lucene_analyzer_spark.analysis.hunspell import (
    Stemmer, _apply_conv, load)

AFF = """
SET UTF-8
KEEPCASE K
NEEDAFFIX X
ONLYINCOMPOUND O
ICONV 1
ICONV ’ '

PFX A Y 1
PFX A 0 re .

PFX U N 1
PFX U 0 un .

SFX V Y 2
SFX V e ive e
SFX V 0 ive [^e]

SFX G Y 2
SFX G e ing e
SFX G 0 ing [^e]

SFX D Y 3
SFX D 0 d e
SFX D y ied [^aeiou]y
SFX D 0 ed [^ey]

SFX S Y 2
SFX S 0 s [^sy]
SFX S y ies [^aeiou]y

SFX L Y 1
SFX L 0 ly/S .
"""

DIC = """10
create/VGD
jump/GDS
carry/DS
walk/AGDS
quick/L
Paris/K
stem/X
fix/UGDS
move/VGD
try/DS
"""


def _stemmer(**kw):
    return Stemmer(load(AFF, [DIC], **kw))


def test_simple_suffixes():
    st = _stemmer()
    assert st.unique_stems("jumps") == ["jump"]
    assert st.unique_stems("jumped") == ["jump"]
    assert st.unique_stems("jumping") == ["jump"]
    assert st.unique_stems("jump") == ["jump"]


def test_strip_and_condition():
    st = _stemmer()
    # e-strip: creating = create - e + ing
    assert st.unique_stems("creating") == ["create"]
    assert st.unique_stems("created") == ["create"]
    assert st.unique_stems("creative") == ["create"]
    # y -> ied condition [^aeiou]y
    assert st.unique_stems("carried") == ["carry"]
    assert st.unique_stems("carries") == ["carry"]
    assert st.unique_stems("tried") == ["try"]


def test_prefix_and_cross_product():
    st = _stemmer()
    assert st.unique_stems("rewalk") == ["walk"]       # prefix alone
    assert st.unique_stems("rewalking") == ["walk"]    # cross product
    assert st.unique_stems("rewalked") == ["walk"]
    # U prefix is NOT cross-product: unfixing must not resolve
    assert st.unique_stems("unfix") == ["fix"]
    assert st.unique_stems("unfixing") == []


def test_continuation_double_suffix():
    st = _stemmer()
    assert st.unique_stems("quickly") == ["quick"]
    # L's append carries /S: the S rule (y->ies, cond [^aeiou]y) composes
    # on top of ly through the continuation-class chain
    assert st.unique_stems("quicklies") == ["quick"]
    # without the continuation flag the chain is rejected
    assert st.unique_stems("jumpings") == []


def test_gates():
    st = _stemmer()
    # KEEPCASE: 'Paris' only in exact case
    assert st.unique_stems("Paris") == ["Paris"]
    assert st.unique_stems("PARIS") == []
    # NEEDAFFIX: bare 'stem' may not match as a word
    assert st.unique_stems("stem") == []


def test_unknown_words():
    st = _stemmer()
    assert st.unique_stems("zzzz") == []
    assert st.unique_stems("jumpeding") == []


def test_iconv_and_case_variant():
    st = _stemmer()
    # title-case input falls back to the lowercase entry
    assert st.unique_stems("Jumping") == ["jump"]
    assert _apply_conv("a’b", [("’", "'")]) == "a'b"


def test_longest_only_mode():
    d = load(AFF, [DIC])
    st = Stemmer(d, longest_only=True)
    assert st.unique_stems("creating") == ["create"]


# --- parity against the reference's REAL shipped dictionary (data
# fixture, read-only: /root/reference/src/analyses/hunspell/dicts/,
# the same files Dictionary.php:171-244 parses) ---

import os

import pytest

_REF_DICTS = "/root/reference/src/analyses/hunspell/dicts"


@pytest.mark.skipif(not os.path.isdir(_REF_DICTS),
                    reason="reference checkout not present")
def test_real_en_us_dictionary_loads_and_stems():
    aff = open(f"{_REF_DICTS}/en_US.aff", encoding="latin-1").read()
    dic = open(f"{_REF_DICTS}/en_US.dic", encoding="latin-1").read()
    d = load(aff, [dic])
    # the .dic header declares 48307 entries (SURVEY §5 records the same)
    assert len(d.words) == 48307
    st = Stemmer(d)
    # affix classes actually exercised: S (plural), D (-ed), Y (-ly),
    # prefix/suffix interplay, and dictionary-word identity
    assert st.unique_stems("cats") == ["cat"]
    assert st.unique_stems("cities") == ["city"]
    assert st.unique_stems("walked") == ["walk"]
    assert st.unique_stems("created") == ["create"]
    assert st.unique_stems("quickly") == ["quick"]
    assert "drink" in st.unique_stems("drinkable")
    # a dictionary word is its own (only) stem
    assert st.unique_stems("cat") == ["cat"]
    # unknown gibberish stems to nothing
    assert st.unique_stems("zzzqqqxxx") == []


@pytest.mark.skipif(not os.path.isdir(_REF_DICTS),
                    reason="reference checkout not present")
def test_encoding_detection_and_nonlatin_dictionaries():
    """getDictionaryEncoding parity over the reference's four shipped
    dictionaries: SET-line encodings (incl. KOI8-R and a BOM'd UTF-8)
    and full loads; Russian affix stemming sanity."""
    from php_lucene_analyzer_spark.analysis.hunspell import (
        detect_encoding, load_files)

    expected = {"en_US": ("ISO8859-1", 48307), "ru_RU": ("KOI8-R", 146269),
                "kk_KZ": ("UTF-8", 54063), "uk_UA": ("UTF-8", 126213)}
    for name, (enc, n_words) in expected.items():
        raw = open(f"{_REF_DICTS}/{name}.aff", "rb").read()
        assert detect_encoding(raw) == enc, name
        d = load_files(f"{_REF_DICTS}/{name}.aff",
                       [f"{_REF_DICTS}/{name}.dic"])
        assert len(d.words) == n_words, name

    st = Stemmer(load_files(f"{_REF_DICTS}/ru_RU.aff",
                            [f"{_REF_DICTS}/ru_RU.dic"]))
    assert st.unique_stems("кошки") == ["кошка"]
    assert st.unique_stems("столы") == ["стол"]
    assert st.unique_stems("бежит") == ["бежать"]
    assert st.unique_stems("книга") == ["книга"]


@pytest.mark.skipif(not os.path.isdir(_REF_DICTS),
                    reason="reference checkout not present")
def test_russian_end_to_end_index_and_query(spark):
    """Cyrillic tokenization + real ru_RU Hunspell stemming, end to end:
    a query using one inflected form finds documents containing other
    inflections of the same lemma."""
    from php_lucene_analyzer_spark.analysis.analyzers import Analyzer
    from php_lucene_analyzer_spark.analysis.hunspell import load_files
    from php_lucene_analyzer_spark.operators import fulltext as ft
    from php_lucene_analyzer_spark.operators.postings import (
        corpus_stats_from_postings, index_corpus, term_stats_from_postings)
    from php_lucene_analyzer_spark.operators.wand import wand_topk_terms

    ru = Stemmer(load_files(f"{_REF_DICTS}/ru_RU.aff",
                            [f"{_REF_DICTS}/ru_RU.dic"]))
    an = Analyzer(stemmer="hunspell", hunspell=ru, stop_words=None)

    rows = [
        ("r", "a.txt", "c", "txt", "кошки бегут по крыше"),
        ("r", "b.txt", "c", "txt", "одна кошка спит"),
        ("r", "c.txt", "c", "txt", "столы и стулья"),
        ("r", "d.txt", "c", "txt", "parser handles tokens"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    ids = ft.with_doc_ids(docs, ["repo", "path"], partitions=2).cache()
    p = index_corpus(ids, "doc_id", "content", analyzer=an).cache()
    ts = term_stats_from_postings(p)
    avgdl = corpus_stats_from_postings(p, 4)

    # the inflections really did collapse to one lemma in the index
    assert {r["term"] for r in
            ts.filter(ts.term == "кошка").collect()} == {"кошка"}
    qterms = sorted(set(an.terms("кошку")))  # accusative form
    assert qterms == ["кошка"]
    hits = {r["doc_id"] for r in
            wand_topk_terms(p, ts, 4, avgdl, qterms, k=4).collect()}
    id_of = {r["path"]: r["doc_id"] for r in ids.collect()}
    assert hits == {id_of["a.txt"], id_of["b.txt"]}


def test_stemmer_cleans_input_iconv_ignore():
    """unique_stems applies ICONV + IGNORE to the INPUT word, like
    Dictionary::cleanInput via Stemmer.php:91-97 (uk_UA stress marks)."""
    aff = "IGNORE ́\nICONV 1\nICONV ’ '\nSFX S Y 1\nSFX S 0 s .\n"
    st = Stemmer(load(aff, ["1\ncat's\n"]))
    assert st.unique_stems("cát’s") == ["cat's"]


def test_zero_append_affix_rules_fire():
    """Strip-only rules ('SFX V y 0 cond') must apply — the shipped
    ru_RU/uk_UA dictionaries rely on them."""
    st = Stemmer(load("SFX V Y 1\nSFX V y 0 [a-z]y\n", ["1\ncrazy/V\n"]))
    assert st.unique_stems("craz") == ["crazy"]


def test_case_variant_union_upper_title():
    """UPPER input tries exact+title+lower; TITLE tries exact+lower;
    mixed-case tries exact only (stemWord2/caseOf :89-151)."""
    st = Stemmer(load("SFX S Y 1\nSFX S 0 s .\n", ["2\nLondon/S\ncab/S\n"]))
    assert st.unique_stems("LONDON") == ["London"]
    assert st.unique_stems("LONDONS") == ["London"]
    assert st.unique_stems("Cab") == ["cab"]
    assert st.unique_stems("cAb") == []      # mixed case: exact only


def test_af_alias_positional_and_dic_ordinals():
    """First AF line is the count (even under FLAG num); dic flag fields
    resolve as alias ordinals; an alias may map to no flags."""
    aff = "FLAG num\nAF 2\nAF 5\nAF 6,7\nSFX 5 Y 1\nSFX 5 0 s .\n"
    st = Stemmer(load(aff, ["1\ncat/1\n"]))
    assert st.unique_stems("cats") == ["cat"]
    st2 = Stemmer(load("AF 2\nAF\nAF S\nSFX S Y 1\nSFX S 0 s .\n",
                       ["1\ndog/2\n"]))
    assert st2.unique_stems("dogs") == ["dog"]


def test_oconv_output_cleaning_and_stem_exceptions():
    """Stems pass through st: exceptions then OCONV (newStem,
    Stemmer.php:234-274 / applyMappings on output)."""
    aff = "OCONV 1\nOCONV ue ü\nSFX S Y 1\nSFX S 0 s .\n"
    dic = "2\nfuehrer/S st:führer\nblue/S\n"
    st = Stemmer(load(aff, [dic]))
    # st: exception wins over the matched dictionary form, then OCONV
    assert st.unique_stems("fuehrers") == ["führer"]
    # OCONV applies to every output stem
    assert st.unique_stems("blues") == ["blü"]


# ---------------------------------------------------------------------------
# COMPLEXPREFIXES / CIRCUMFIX / LANG caseFold / FULLSTRIP (VERDICT r1 item 4)
# — none of the four shipped dictionaries declares these (grep-verified),
# so synthetic dictionaries force each flag.
# ---------------------------------------------------------------------------

CIRCUMFIX_AFF = """
SET UTF-8
CIRCUMFIX A

PFX B Y 1
PFX B 0 leg/A .

PFX C Y 1
PFX C 0 legto/A .

SFX D Y 1
SFX D 0 obb/A .
"""

CIRCUMFIX_DIC = """1
nagy/CBD
"""


def test_circumfix_pairing():
    """A circumfix-flagged prefix validates only WITH a circumfix-flagged
    suffix and vice versa (reference Stemmer.php:640-656 pairing check;
    Dictionary.php:458-464 flag parse)."""
    st = Stemmer(load(CIRCUMFIX_AFF, [CIRCUMFIX_DIC]))
    assert st.unique_stems("legnagyobb") == ["nagy"]
    assert st.unique_stems("legtonagyobb") == ["nagy"]
    # suffix alone: circumfix suffix without its prefix must NOT validate
    assert st.unique_stems("nagyobb") == []
    # prefix alone: circumfix prefix without its suffix must NOT validate
    assert st.unique_stems("legnagy") == []
    assert st.unique_stems("nagy") == ["nagy"]


COMPLEX_AFF = """
SET UTF-8
COMPLEXPREFIXES

PFX A Y 1
PFX A 0 un .

PFX B Y 1
PFX B 0 re/A .

SFX C Y 1
SFX C 0 s .
"""

COMPLEX_DIC = """1
walk/BC
"""


def test_complexprefixes_two_stage():
    """COMPLEXPREFIXES = 2-stage prefix + 1 suffix instead of 1 prefix +
    2-stage suffix (reference Dictionary.php:456-457; Stemmer.php:660-685
    recursion table).  The outer prefix chains through the inner prefix's
    continuation class; the word itself carries only the inner flag."""
    st = Stemmer(load(COMPLEX_AFF, [COMPLEX_DIC]))
    assert st.unique_stems("rewalk") == ["walk"]       # inner prefix only
    assert st.unique_stems("unrewalk") == ["walk"]     # prefix + prefix
    assert st.unique_stems("unrewalks") == ["walk"]    # 2 prefixes + suffix
    assert st.unique_stems("unwalk") == []             # outer without inner
    assert st.unique_stems("walks") == ["walk"]


TR_AFF = """
SET UTF-8
LANG tr_TR

SFX S Y 1
SFX S 0 lar .
"""

TR_DIC = """2
ışık/S
iş/S
"""


def test_turkish_alternate_casing():
    """LANG tr_TR folds I -> dotless ı and İ -> dotted i
    (Dictionary::caseFold, reference Dictionary.php:1309-1324)."""
    st = Stemmer(load(TR_AFF, [TR_DIC]))
    assert st.unique_stems("IŞIK") == ["ışık"]          # I -> ı
    assert st.unique_stems("IŞIKLAR") == ["ışık"]
    assert st.unique_stems("İŞ") == ["iş"]              # İ -> i
    assert st.unique_stems("Işık") == ["ışık"]          # title case fold
    # without LANG, 'I' folds to 'i' and nothing matches
    st2 = Stemmer(load(TR_AFF.replace("LANG tr_TR\n", ""), [TR_DIC]))
    assert st2.unique_stems("IŞIK") == []


FULLSTRIP_AFF = """
SET UTF-8
FULLSTRIP

SFX F Y 1
SFX F x ab x
"""

FULLSTRIP_DIC = """1
x/F
"""


def test_fullstrip_whole_word_suffix():
    """FULLSTRIP lets a suffix consume the entire word (reference
    Dictionary.php:505-506; Stemmer.php:407 limit)."""
    st = Stemmer(load(FULLSTRIP_AFF, [FULLSTRIP_DIC]))
    assert st.unique_stems("ab") == ["x"]
    st2 = Stemmer(load(FULLSTRIP_AFF.replace("FULLSTRIP\n", ""),
                       [FULLSTRIP_DIC]))
    assert st2.unique_stems("ab") == []
