"""Token-filter chain tests (functions/analysis.py custom analyzers)."""

from __future__ import annotations

from elasticsearch_spark.functions import analysis


def test_stop_filter():
    analysis.register_analyzer("std_stop", filters=["stop"])
    got = analysis.analyze("the quick fox and the dog", "std_stop")
    assert got == ["quick", "fox", "dog"]


def test_asciifolding():
    analysis.register_analyzer("fold", filters=["asciifolding"])
    assert analysis.analyze("Zürich café naïve", "fold") == ["zurich", "cafe", "naive"]


def test_shingle():
    analysis.register_analyzer("sh", filters=[("shingle", {"min_size": 2, "max_size": 3})])
    got = analysis.analyze("a b c", "sh")
    assert got == ["a", "b", "c", "a b", "b c", "a b c"]


def test_ngram_and_edge():
    analysis.register_analyzer("ng", filters=[("ngram", {"min_gram": 2, "max_gram": 2})])
    assert analysis.analyze("abc", "ng") == ["ab", "bc"]
    analysis.register_analyzer("eg", filters=[("edge_ngram", {"min_gram": 1, "max_gram": 3})])
    assert analysis.analyze("spark", "eg") == ["s", "sp", "spa"]


def test_stemmer_minimal():
    analysis.register_analyzer("stem", filters=["stemmer"])
    assert analysis.analyze("dogs berries boxes class bus", "stem") == [
        "dog", "berry", "box", "class", "bus"
    ]


def test_chained_filters():
    analysis.register_analyzer(
        "chain", filters=["stop", "asciifolding", ("length", {"min": 3}), "unique"]
    )
    got = analysis.analyze("the Café café is on fire fire", "chain")
    assert got == ["cafe", "fire"]


def test_truncate_reverse():
    analysis.register_analyzer("tr", filters=[("truncate", {"length": 3}), "reverse"])
    assert analysis.analyze("spark", "tr") == ["aps"]


def test_custom_analyzer_in_index_build(spark, tmp_path):
    """A registered chain drives the full index build + search path."""
    from elasticsearch_spark.operators.postings import build_index
    from elasticsearch_spark.operators.topk import search_topk

    analysis.register_analyzer("stop_stem", filters=["stop", "stemmer"])
    rows = [
        ("u1", "the dogs and the cats", "en"),
        ("u2", "a dog sat on the mat", "en"),
        ("u3", "birds fly south", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string").withColumn(
        "warc_ts", __import__("pyspark.sql.functions", fromlist=["F"]).lit("2024-01-01").cast("timestamp")
    )
    idx = str(tmp_path / "idx")
    build_index(spark, df, idx, num_partitions=2, analyzer="stop_stem")
    hits = search_topk(spark, idx, ["dog"], k=10, fetch=True).collect()
    assert {r["url"] for r in hits} == {"u1", "u2"}  # both stem to "dog"; stopwords gone


def test_synonym_expand_group():
    analysis.register_analyzer("syn", filters=[("synonym", {"synonyms": ["car, auto, vehicle"]})])
    assert analysis.analyze("the car drives", "syn") == ["the", "car", "auto", "vehicle", "drives"]


def test_synonym_directed_rule():
    analysis.register_analyzer("syn2", filters=[("synonym", {"synonyms": ["usa, united states => america"], "expand": False})])
    assert analysis.analyze("usa today", "syn2") == ["america", "today"]


def test_synonym_dict_form_search_time(spark, tmp_path):
    """Index with standard; search with a synonym-expanded query analyzer —
    the search_analyzer pattern (TextFieldMapper.java:342)."""
    from elasticsearch_spark.operators.postings import build_index
    from elasticsearch_spark.operators.topk import search_topk
    from elasticsearch_spark.functions.analysis import analyze
    from pyspark.sql import functions as F

    rows = [("u1", "my auto is fast", "en"), ("u2", "my bicycle is slow", "en")]
    df = spark.createDataFrame(rows, "url string, text string, lang string").withColumn(
        "warc_ts", F.lit("2024-01-01").cast("timestamp"))
    idx = str(tmp_path / "syn_idx")
    build_index(spark, df, idx, num_partitions=2)
    analysis.register_analyzer("qsyn", filters=[("synonym", {"synonyms": {"car": ["auto"]}})])
    terms = analyze("fast car", "qsyn")  # → fast, car, auto
    hits = {r["url"] for r in search_topk(spark, idx, terms, k=10).collect()}
    assert hits == {"u1"}


def test_word_delimiter_splits():
    from elasticsearch_spark.functions.analysis import _filter_word_delimiter

    assert _filter_word_delimiter(["PowerShot-500"]) == ["power", "shot", "500"]
    assert _filter_word_delimiter(["wi-fi"]) == ["wi", "fi"]
    assert _filter_word_delimiter(["PowerShot"], catenate_all=True) == ["power", "shot", "powershot"]
    assert _filter_word_delimiter(["O'Neil"], preserve_original=True) == ["o'neil", "o", "neil"]
    assert _filter_word_delimiter(["plain"]) == ["plain"]


def test_misc_filters():
    from elasticsearch_spark.functions.analysis import (
        _filter_apostrophe,
        _filter_decimal_digit,
        _filter_trim,
        _filter_uppercase,
    )

    assert _filter_apostrophe(["türkiye'den", "plain"]) == ["türkiye", "plain"]
    assert _filter_decimal_digit(["٤٢x", "abc"]) == ["42x", "abc"]
    assert _filter_trim([" pad "]) == ["pad"]
    assert _filter_uppercase(["up"]) == ["UP"]


def test_keyword_repeat_stem_chain():
    analysis.register_analyzer("krs", filters=["keyword_repeat_stem"])
    assert analysis.analyze("dogs run", "krs") == ["dogs", "dog", "run"]


# ---- new tokenizers / char filters / porter stemmer -----------------------

def test_porter_stemmer_vocabulary():
    from elasticsearch_spark.functions.analysis import porter_stem

    cases = {
        "caresses": "caress", "ponies": "poni", "relational": "relat",
        "conditional": "condit", "vietnamization": "vietnam",
        "adjustable": "adjust", "replacement": "replac", "hopping": "hop",
        "filing": "file", "electriciti": "electr", "happy": "happi",
        "sky": "sky", "rate": "rate",
    }
    for w, exp in cases.items():
        assert porter_stem(w) == exp, (w, porter_stem(w), exp)


def test_english_preset_porter():
    from elasticsearch_spark.functions.analysis import analyze

    assert analyze("The manager's relational databases are running", "english") == [
        "manag", "relat", "databas", "run"
    ]


def test_new_tokenizers():
    from elasticsearch_spark.functions import analysis as A

    assert A.whitespace_tokenize("Foo  Bar-baz") == ["Foo", "Bar-baz"]
    assert A.keyword_tokenize("One Two") == ["One Two"]
    assert A.letter_tokenize("ab12cd ef") == ["ab", "cd", "ef"]
    assert A.lowercase_tokenize("AB cd") == ["ab", "cd"]
    assert A.uax_url_email_tokenize("see https://x.io/a?b=1 or mail a.b@c.de now") == [
        "see", "https://x.io/a?b=1", "or", "mail", "a.b@c.de", "now"
    ]


def test_parameterized_tokenizers_and_char_filters():
    from elasticsearch_spark.functions import analysis as A

    A.register_analyzer("csv", ("pattern", {"pattern": ","}), ["trim", "lowercase"])
    assert A.analyze("A, B ,C", "csv") == ["a", "b", "c"]
    A.register_analyzer("cg", ("char_group", {"tokenize_on_chars": ["whitespace", "-"]}))
    assert A.analyze("one-two three", "cg") == ["one", "two", "three"]
    A.register_analyzer("ph", ("path_hierarchy", {}))
    assert A.analyze("/a/b/c", "ph") == ["/a", "/a/b", "/a/b/c"]
    A.register_analyzer(
        "subst", "standard", [],
        [("pattern_replace", {"pattern": r"\d+", "replacement": "N"}),
         ("mapping", {"mappings": ["ph=>f"]})],
    )
    assert A.analyze("phase 42 phones", "subst") == ["fase", "n", "fones"]


def test_analyzer_config_roundtrip_with_char_filters(spark, tmp_path):
    """Custom chain with char filters + parameterized tokenizer survives
    IndexMeta persistence (driver-restart semantics)."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.functions import analysis as A
    from elasticsearch_spark.operators.postings import build_index
    from elasticsearch_spark.sources import index_store as store

    idx = str(tmp_path / "idx")
    A.register_analyzer(
        "round", "whitespace", ["lowercase"],
        [("pattern_replace", {"pattern": "-", "replacement": " "})],
    )
    df = spark.createDataFrame(
        [("u1", "Alpha-Beta gamma", "en")], "url string, text string, lang string"
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    build_index(spark, df, idx, num_partitions=1, analyzer="round")
    # simulate restart: drop the registration, reload meta
    del A.ANALYZERS["round"]
    del A.ANALYZER_CONFIGS["round"]
    meta = store.IndexMeta.load(idx)
    assert meta.analyzer == "round"
    assert A.analyze("Alpha-Beta gamma", "round") == ["alpha", "beta", "gamma"]


def test_language_presets_german_french():
    from elasticsearch_spark.functions.analysis import analyze

    # german: stopwords out, umlaut folding + light suffix strip
    assert analyze("Die Häuser und die Kinder", "german") == ["haus", "kind"]
    # french: elision + stop + plural/feminine strip
    assert analyze("L'avion et les chevaux", "french") == ["avion", "cheval"]


def test_stemmer_language_dispatch():
    from elasticsearch_spark.functions import analysis as A

    A.register_analyzer("de_chain", "standard", [("stemmer", {"language": "light_german"})])
    assert A.analyze("häuser", "de_chain") == ["haus"]
    A.register_analyzer("fr_chain", "standard", [("stemmer", {"language": "minimal_french"})])
    assert A.analyze("chevaux", "fr_chain") == ["cheval"]


def test_cjk_bigram():
    from elasticsearch_spark.functions.analysis import analyze

    # Han runs become overlapping bigrams; Latin words untouched
    assert analyze("搜索引擎 search", "cjk") == ["搜索", "索引", "引擎", "search"]
    from elasticsearch_spark.functions.analysis import _filter_cjk_bigram

    assert _filter_cjk_bigram(["中"]) == ["中"]  # lone ideograph stays
    assert _filter_cjk_bigram(["中", "文"], output_unigrams=True) == ["中", "文", "中文"]


def test_limit_filter():
    analysis.register_analyzer("lim", filters=[("limit", {"max_token_count": 2})])
    assert analysis.analyze("a b c d", "lim") == ["a", "b"]
    analysis.register_analyzer("lim1", filters=["limit"])
    assert analysis.analyze("a b c", "lim1") == ["a"]  # reference default = 1


def test_fingerprint_filter_and_analyzer():
    analysis.register_analyzer("fp", filters=["fingerprint"])
    assert analysis.analyze("b a c a b", "fp") == ["a b c"]
    # overflow emits nothing (Lucene FingerprintFilter contract)
    analysis.register_analyzer("fp_small", filters=[("fingerprint", {"max_output_size": 3})])
    assert analysis.analyze("aa bb cc", "fp_small") == []
    # built-in analyzer: lowercase + asciifolding + fingerprint
    assert analysis.analyze("Zürich and zurich AND", "fingerprint") == ["and zurich"]


def test_pattern_analyzer():
    assert analysis.analyze("Foo-Bar_baz 42!", "pattern") == ["foo", "bar_baz", "42"]


def test_common_grams():
    analysis.register_analyzer(
        "cg", filters=[("common_grams", {"common_words": ["the", "of"]})]
    )
    got = analysis.analyze("queen of england", "cg")
    assert got == ["queen", "of", "england", "queen_of", "of_england"]
    analysis.register_analyzer(
        "cgq",
        filters=[("common_grams", {"common_words": ["the", "of"], "query_mode": True})],
    )
    got_q = analysis.analyze("queen of england", "cgq")
    # query_mode drops the common unigram absorbed into bigrams
    assert got_q == ["queen", "england", "queen_of", "of_england"]


def test_min_hash_filter():
    analysis.register_analyzer(
        "mh",
        filters=[
            ("shingle", {"min_size": 3, "max_size": 3, "output_unigrams": False}),
            ("min_hash", {"bucket_count": 8}),
        ],
    )
    a = analysis.analyze("the quick brown fox jumps over the lazy dog", "mh")
    assert len(a) == 8  # with_rotation fills every bucket
    assert all(len(t) == 16 and int(t, 16) >= 0 for t in a)
    # deterministic + similar docs share most buckets
    b = analysis.analyze("the quick brown fox jumps over the lazy cat", "mh")
    assert a == analysis.analyze("the quick brown fox jumps over the lazy dog", "mh")
    assert sum(x == y for x, y in zip(a, b)) >= 4


def test_keyword_marker_protects_stemming():
    analysis.register_analyzer(
        "km",
        filters=[("keyword_marker", {"keywords": ["running"]}), ("stemmer", {"language": "porter"})],
    )
    got = analysis.analyze("running jumping", "km")
    assert got == ["running", "jump"]


def test_stemmer_override():
    analysis.register_analyzer(
        "so",
        filters=[
            ("stemmer_override", {"rules": ["running => sprint"]}),
            ("stemmer", {"language": "porter"}),
        ],
    )
    # "running" maps to "sprint" and is protected; "jumping" still stems
    assert analysis.analyze("running jumping", "so") == ["sprint", "jump"]


def test_normalizer():
    analysis.register_normalizer("kw_norm", filters=["lowercase", "asciifolding"])
    assert analysis.normalize("Zürich-Stadt", "kw_norm") == "zurich-stadt"
    assert analysis.normalize("ABC", "lowercase") == "abc"


def test_ngram_edge_ngram_tokenizers():
    analysis.register_analyzer("ngt", tokenizer=("ngram", {"min_gram": 2, "max_gram": 3, "token_chars": ["letter"]}))
    got = analysis.analyze("ab cd1", "ngt")
    assert got == ["ab", "cd"]  # runs: "ab", "cd" (digit breaks the run)
    analysis.register_analyzer("egt", tokenizer=("edge_ngram", {"min_gram": 1, "max_gram": 3, "token_chars": ["letter", "digit"]}))
    assert analysis.analyze("Spark 42", "egt") == ["s", "sp", "spa", "4", "42"]


def test_simple_pattern_tokenizers():
    analysis.register_analyzer("spt", tokenizer=("simple_pattern", {"pattern": "[0-9]{3}"}))
    assert analysis.analyze("fd-786-335-514-x", "spt") == ["786", "335", "514"]
    analysis.register_analyzer("spst", tokenizer=("simple_pattern_split", {"pattern": "_"}))
    assert analysis.analyze("an_underscored_phrase", "spst") == ["an", "underscored", "phrase"]


def test_language_presets_round2():
    # spanish: stop removal + light stem (plural + final vowel)
    assert analysis.ANALYZERS["spanish"]("las canciones bonitas") == ["cancion", "bonit"]
    # italian: i/h digraph rule on the final vowel
    assert analysis.ANALYZERS["italian"]("le arance rosse") == ["aranc", "rosse"]  # len<6 guard
    # portuguese: -ões → ão, generic plural
    assert analysis.ANALYZERS["portuguese"]("as canções dos animais") == ["cançao", "animal"]
    # dutch preset = exact snowball (DutchAnalyzer wraps DutchStemmer):
    # kk/dd/tt undouble (katten → kat), nn does NOT undouble (mannen → mann)
    assert analysis.ANALYZERS["dutch"]("de katten van mannen") == ["kat", "mann"]
    # russian: case-ending strip
    assert analysis.ANALYZERS["russian"]("красивыми домами") == ["красив", "дом"]


def test_stemmer_language_dispatch_round2():
    f = analysis.TOKEN_FILTERS["stemmer"]
    assert f(["canciones"], language="light_spanish") == ["cancion"]
    assert f(["arance"], language="italian") == ["aranc"]
    # base name "portuguese" = exact snowball (verb-suffix es removed
    # after the o~ nasal marking); the light stemmer keeps its own name
    assert f(["canções"], language="portuguese") == ["cançõ"]
    assert f(["canções"], language="light_portuguese") == ["cançao"]
    assert f(["katten"], language="dutch") == ["kat"]
    assert f(["домами"], language="russian") == ["дом"]


def test_stop_named_language_sets():
    f = analysis.TOKEN_FILTERS["stop"]
    assert f(["el", "perro"], stopwords="_spanish_") == ["perro"]
    assert f(["the", "dog"], stopwords="_english_") == ["dog"]


def test_elision_filter():
    f = analysis.TOKEN_FILTERS["elision"]
    assert f(["l'avion", "d'été", "avion"]) == ["avion", "été", "avion"]
    assert f(["j'aime", "qu'il"], articles=["j"]) == ["aime", "qu'il"]


def test_pattern_capture_filter():
    f = analysis.TOKEN_FILTERS["pattern_capture"]
    got = f(["abc123def456"], patterns=[r"([a-z]+)"], preserve_original=True)
    assert got == ["abc123def456", "abc", "def"]
    got = f(["abc123"], patterns=[r"([a-z]+)(\d+)"], preserve_original=False)
    assert got == ["abc", "123"]
    # non-matching token survives even without preserve_original
    assert f(["xyz"], patterns=[r"(\d+)"], preserve_original=False) == ["xyz"]


def test_delimited_payload_and_pattern_replace_filters():
    f = analysis.TOKEN_FILTERS["delimited_payload"]
    assert f(["the|0", "quick|10", "fox"]) == ["the", "quick", "fox"]
    pr = analysis.TOKEN_FILTERS["pattern_replace"]
    assert pr(["foo-bar", "baz"], pattern="-", replacement="_") == ["foo_bar", "baz"]
    assert pr(["--"], pattern="-", replacement="") == []


def test_custom_chain_with_elision_and_lang_stemmer():
    analysis.register_analyzer(
        "fr_custom",
        tokenizer="standard",
        filters=["lowercase", "elision", ("stop", {"stopwords": "_french_"}), ("stemmer", {"language": "light_french"})],
    )
    got = analysis.analyze("L'église et les chevaux", "fr_custom")
    assert "église" not in got and "et" not in got


def test_icu_normalizer_forms():
    from elasticsearch_spark.functions.analysis import _filter_icu_normalizer

    # nfkc_cf: compatibility compose + full case fold (ß -> ss, ﬁ -> fi)
    assert _filter_icu_normalizer(["Straße", "ﬁsh", "ＡＢＣ"]) == ["strasse", "fish", "abc"]
    # nfc keeps case, composes combining sequences
    assert _filter_icu_normalizer(["é"], name="nfc") == ["é"]
    assert _filter_icu_normalizer(["Ｆoo"], name="nfkc") == ["Foo"]


def test_icu_folding_strips_diacritics_across_scripts():
    from elasticsearch_spark.functions.analysis import _filter_icu_folding

    assert _filter_icu_folding(["Crème", "BRÛLÉE", "naïve"]) == ["creme", "brulee", "naive"]
    # Greek tonos + case fold
    assert _filter_icu_folding(["Ελληνικά"]) == ["ελληνικα"]
    # fullwidth + ligature compatibility foldings
    assert _filter_icu_folding(["ＦＵＬＬ", "ﬂy"]) == ["full", "fly"]


def test_icu_chain_registration(spark):
    from elasticsearch_spark.functions import analysis

    analysis.register_analyzer("icu_test", "standard", [["icu_folding", {}]])
    toks = analysis.analyze("Crème Brûlée Straße", "icu_test")
    assert toks == ["creme", "brulee", "strasse"]


def test_normalization_filter_batch():
    """cjk_width / scandinavian / german / arabic / persian normalizers +
    keep / keep_types / remove_duplicates — golden pairs derived from the
    Lucene filter docs, run through the registered chain resolution."""
    from elasticsearch_spark.functions.analysis import TOKEN_FILTERS as TF

    assert TF["cjk_width"](["ｅｌａｓｔｉｃ", "ｶﾀｶﾅ"]) == ["elastic", "カタカナ"]
    assert TF["scandinavian_folding"](["räksmörgås", "smørrebrød"]) == [
        "raksmorgas", "smorrebrod"]
    assert TF["scandinavian_normalization"](["raeksmoergaas"]) == ["räksmörgås"]
    assert TF["german_normalization"](["weißbier", "flüsse", "quelle", "baer"]) == [
        "weissbier", "flusse", "quelle", "bar"]  # 'ue' after q survives
    assert TF["arabic_normalization"](["أَب", "مكتبة"]) == ["اب", "مكتبه"]
    assert TF["persian_normalization"](["كتاب"]) == ["کتاب"]  # Arabic kaf -> Farsi
    assert TF["keep"](["the", "spark", "core"], keep_words=["spark"]) == ["spark"]
    assert TF["keep_types"](["v2", "2024", "x"], types=["<NUM>"]) == ["2024"]
    assert TF["keep_types"](["v2", "2024"], types=["<NUM>"], mode="exclude") == ["v2"]
    assert TF["remove_duplicates"](["a", "a", "b", "a"]) == ["a", "b", "a"]


# --- round-2 conditional / compound / classic batch -------------------------

def test_condition_filter():
    # Lucene docs example: reverse only tokens shorter than 5 chars
    analysis.register_analyzer("cond", filters=[(
        "condition",
        {"filter": ["reverse"],
         "script": {"source": "token.getTerm().length() < 5"}},
    )])
    assert analysis.analyze("what flapdoodle", "cond") == ["tahw", "flapdoodle"]


def test_predicate_token_filter():
    analysis.register_analyzer("pred", filters=[(
        "predicate_token_filter",
        {"script": {"source": "token.term.contains('oo') && !token.term.startsWith('f')"}},
    )])
    assert analysis.analyze("foo moon book bar", "pred") == ["moon", "book"]


def test_multiplexer():
    # ES docs shape: original + lowercase chain + stem chain, deduped
    analysis.register_analyzer("mux", filters=[(
        "multiplexer", {"filters": ["porter_stem", "reverse"]},
    )])
    got = analysis.analyze("running", "mux")
    assert got == ["running", "run", "gninnur"]
    # identical chain outputs dedupe against the original
    analysis.register_analyzer("mux2", filters=[("multiplexer", {"filters": ["lowercase"]})])
    assert analysis.analyze("abc", "mux2") == ["abc"]


def test_multiplexer_comma_chain():
    analysis.register_analyzer("mux3", filters=[(
        "multiplexer", {"filters": ["reverse, porter_stem"], "preserve_original": False},
    )])
    # reverse then stem: "dances" -> "secnad" -> porter leaves "secnad"
    assert analysis.analyze("dances", "mux3") == ["secnad"]


def test_dictionary_decompounder():
    analysis.register_analyzer("decomp", filters=[(
        "dictionary_decompounder",
        {"word_list": ["donau", "dampf", "schiff", "fahrt"]},
    )])
    assert analysis.analyze("donaudampfschiff", "decomp") == [
        "donaudampfschiff", "donau", "dampf", "schiff"
    ]
    # min_word_size gate: short tokens pass through unsplit
    analysis.register_analyzer("decomp2", filters=[(
        "dictionary_decompounder", {"word_list": ["da"], "min_word_size": 5},
    )])
    assert analysis.analyze("dada", "decomp2") == ["dada"]


def test_hyphenation_decompounder_longest_match():
    analysis.register_analyzer("hyp", filters=[(
        "hyphenation_decompounder",
        {"word_list": ["schiff", "fahrt", "schifffahrt"],
         "only_longest_match": True},
    )])
    assert analysis.analyze("schifffahrt", "hyp") == ["schifffahrt", "schifffahrt", "fahrt"]


def test_kstem():
    analysis.register_analyzer("ks", filters=["kstem"])
    assert analysis.analyze("dogs churches berries running fitted class", "ks") == [
        "dog", "church", "berry", "run", "fit", "class"
    ]


def test_classic_tokenizer_and_filter():
    analysis.register_analyzer("cls", tokenizer="classic", filters=["classic"])
    got = analysis.analyze("The U.S.A. hosts www.example.com and O'Neil's AT&T", "cls")
    assert "usa" in got
    assert "www.example.com" in got
    assert "at&t" in got
    assert "o'neil" in got


def test_synonym_graph_alias():
    analysis.register_analyzer("syng", filters=[(
        "synonym_graph", {"synonyms": ["car, automobile"]},
    )])
    assert analysis.analyze("car", "syng") == ["car", "automobile"]


def test_hunspell_filter():
    # mini en_US-style dictionary: drink/S flags; condition [^y] gates -s
    dic = ["3", "drink/SG", "walk/SG", "city/P"]
    aff = [
        "SFX S Y 1",
        "SFX S 0 s [^y]",
        "SFX G Y 1",
        "SFX G 0 ing .",
        "PFX P Y 1",
        "PFX P 0 mega .",
    ]
    analysis.register_analyzer("hun", filters=[(
        "hunspell", {"dictionary": dic, "dictionary_rules": aff},
    )])
    got = analysis.analyze("drinks walking megacity cities unknownword", "hun")
    # drinks -> drink (S), walking -> walk (G), megacity -> city (P prefix),
    # cities has no matching rule (condition [^y] blocks -s on 'citie'),
    # unknown tokens pass through
    assert got == ["drink", "walk", "city", "cities", "unknownword"]
    # dictionary words stem to themselves
    assert analysis.analyze("drink", "hun") == ["drink"]


def test_hunspell_longest_only():
    dic = ["2", "walk/S", "walks"]
    aff = ["SFX S Y 1", "SFX S 0 s ."]
    analysis.register_analyzer("hun2", filters=[(
        "hunspell",
        {"dictionary": dic, "dictionary_rules": aff, "longest_only": True},
    )])
    # "walks" is itself a dictionary word AND stems to "walk" — longest wins
    assert analysis.analyze("walks", "hun2") == ["walks"]


# --- code-review regression batch --------------------------------------------

def test_condition_default_script_and_literals():
    # default script "true" must evaluate (Painless literals in scope)
    assert analysis.TOKEN_FILTERS["condition"](["abc"], filter=["reverse"]) == ["cba"]
    # operators inside string literals stay data (stash-first)
    analysis.register_analyzer("predlit", filters=[(
        "predicate_token_filter",
        {"script": {"source": "token.term.contains('b&&c') || token.term.endsWith('z')"}},
    )])
    got = analysis.TOKEN_FILTERS["predicate_token_filter"](
        ["ab&&cd", "xyz", "plain"],
        script={"source": "token.term.contains('&&') || token.term.endsWith('z')"},
    )
    assert got == ["ab&&cd", "xyz"]
    # dunder traversal is refused outright
    import pytest as _pytest

    with _pytest.raises(ValueError):
        analysis.TOKEN_FILTERS["predicate_token_filter"](
            ["a"], script={"source": "token.term.__class__ != null"})


def test_kstem_es_plurals():
    from elasticsearch_spark.functions.analysis import kstem

    assert kstem("tables") == "table"
    assert kstem("makes") == "make"
    assert kstem("dogs") == "dog"
    assert kstem("churches") == "church"
    assert kstem("class") == "class"
    assert kstem("tennis") == "tennis"


def test_classic_longest_match_hosts():
    from elasticsearch_spark.functions.analysis import classic_tokenize

    # dotted runs followed by a letter are HOSTs (JFlex longest-match),
    # trailing-dot runs are ACRONYMs
    assert classic_tokenize("visit a.b.c now") == ["visit", "a.b.c", "now"]
    assert classic_tokenize("U.S.A") == ["u.s.a"]
    assert classic_tokenize("U.S.A. wins") == ["u.s.a.", "wins"]


def test_hunspell_pfx_condition_anchors_front():
    dic = ["2", "city/P", "apple/P"]
    aff = ["PFX P Y 1", "PFX P 0 mega [^c]"]  # root must not START with c
    analysis.register_analyzer("hun3", filters=[(
        "hunspell", {"dictionary": dic, "dictionary_rules": aff},
    )])
    got = analysis.analyze("megacity megaapple", "hun3")
    # 'city' starts with c → prefix rule must NOT apply; 'apple' does
    assert got == ["megacity", "apple"]


# --- analysis/esql review regression batch ------------------------------------

def test_elision_articles_case_polarity():
    from elasticsearch_spark.functions.analysis import _filter_elision

    # articles_case=True → case-INsensitive (stock French analyzer relies
    # on it; elision runs before lowercase)
    assert _filter_elision(["L'avion"], articles=["l"], articles_case=True) == ["avion"]
    # default False → case-sensitive: uppercase head does NOT strip
    assert _filter_elision(["L'avion"], articles=["l"], articles_case=False) == ["L'avion"]
    assert _filter_elision(["l'avion"], articles=["l"], articles_case=False) == ["avion"]


def test_synonym_expand_false_maps_to_first_term():
    from elasticsearch_spark.functions.analysis import _filter_synonym

    syn = ["a, b, c"]
    assert _filter_synonym(["b"], synonyms=syn, expand=False) == ["a"]
    assert _filter_synonym(["a"], synonyms=syn, expand=False) == ["a"]
    assert _filter_synonym(["c", "x"], synonyms=syn, expand=False) == ["a", "x"]
    # expand=True keeps the original plus the rest of the group
    assert _filter_synonym(["b"], synonyms=syn, expand=True) == ["b", "a", "c"]


def test_keyword_marker_protects_kstem_and_hunspell():
    from elasticsearch_spark.functions import analysis

    analysis.register_analyzer(
        "km_kstem", "standard", [("keyword_marker", {"keywords": ["running"]}), "kstem"])
    assert analysis.analyze("running tables", "km_kstem") == ["running", "table"]


def test_mapping_char_filter_single_pass():
    from elasticsearch_spark.functions.analysis import make_mapping_char_filter

    # one rule's output must NOT feed the next (Lucene MappingCharFilter)
    assert make_mapping_char_filter(["a=>b", "b=>c"])("ab") == "bc"
    # longest match wins
    assert make_mapping_char_filter(["ab=>X", "a=>Y"])("aba") == "XY"
