"""CJK segmentation (functions/cjk.py — icu_tokenizer / smartcn analog):
script-run splitting, FMM longest-match, kana sub-script breaks, UAX#29
delegation for non-CJK."""

from __future__ import annotations

from elasticsearch_spark.functions.cjk import icu_tokenize, smartcn_analyze


def test_chinese_fmm_longest_match():
    # 4-char lexicon entries beat their 2-char prefixes
    assert icu_tokenize("机器学习") == ["机器学习"]
    assert icu_tokenize("人工智能算法") == ["人工智能", "算法"]
    assert icu_tokenize("我们喜欢机器学习") == ["我们", "喜欢", "机器学习"]


def test_chinese_unigram_fallback():
    # out-of-lexicon chars fall back to unigrams (never dropped)
    toks = icu_tokenize("今天天气很好")
    assert toks == ["今天", "天气", "很", "好"]
    assert "".join(toks) == "今天天气很好"  # lossless


def test_japanese_scripts():
    # kanji through FMM, hiragana/katakana runs kept whole per sub-script
    assert icu_tokenize("日本語の勉強") == ["日本語", "の", "勉強"]
    assert icu_tokenize("東京タワーへ") == ["東京", "タワー", "へ"]


def test_korean_through_uax29():
    # Hangul is space-delimited — standard UAX#29 path
    assert icu_tokenize("한국어 공백 구분") == ["한국어", "공백", "구분"]


def test_mixed_latin_cjk():
    assert icu_tokenize("Elasticsearch是一个分布式搜索引擎") == [
        "elasticsearch", "是", "一", "个", "分布式", "搜索", "引擎"]
    assert icu_tokenize("用Spark做分词 v2.0") == [
        "用", "spark", "做", "分词", "v2.0"]


def test_analyzer_registration():
    from elasticsearch_spark.functions.analysis import ANALYZERS, TOKENIZERS

    assert TOKENIZERS["icu_tokenizer"]("机器学习很好") == ["机器学习", "很", "好"]
    assert ANALYZERS["smartcn"]("搜索引擎") == ["搜索", "引擎"]
    # icu_analyzer adds icu_folding on top
    assert ANALYZERS["icu_analyzer"]("Café机器学习") == ["cafe", "机器学习"]


def test_empty_and_pure_latin():
    assert icu_tokenize("") == []
    assert icu_tokenize("hello world") == ["hello", "world"]
