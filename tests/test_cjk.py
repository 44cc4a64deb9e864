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
    # 一个 and 搜索引擎 are dictionary words in the scaled-up lexicon
    # (round 5) — the lattice now matches real CJK dictionaries
    assert icu_tokenize("Elasticsearch是一个分布式搜索引擎") == [
        "elasticsearch", "是", "一个", "分布式", "搜索引擎"]
    assert icu_tokenize("用Spark做分词 v2.0") == [
        "用", "spark", "做", "分词", "v2.0"]


def test_analyzer_registration():
    from elasticsearch_spark.functions.analysis import ANALYZERS, TOKENIZERS

    assert TOKENIZERS["icu_tokenizer"]("机器学习很好") == ["机器学习", "很", "好"]
    assert ANALYZERS["smartcn"]("搜索引擎") == ["搜索引擎"]
    # icu_analyzer adds icu_folding on top
    assert ANALYZERS["icu_analyzer"]("Café机器学习") == ["cafe", "机器学习"]


def test_empty_and_pure_latin():
    assert icu_tokenize("") == []
    assert icu_tokenize("hello world") == ["hello", "world"]

# --- kuromoji / nori analogs (dictionary-free filters are exact ports) ------

from elasticsearch_spark.functions.cjk import (  # noqa: E402
    iteration_mark_normalize, ja_normalize_number, kana_to_romaji,
    katakana_stem, ko_normalize_number, kuromoji_analyze, nori_analyze,
)


def test_iteration_marks():
    assert iteration_mark_normalize("人々") == "人人"
    assert iteration_mark_normalize("すゝめ") == "すすめ"
    assert iteration_mark_normalize("みすゞ") == "みすず"   # voiced repeat
    assert iteration_mark_normalize("バナヽ") == "バナナ"
    # mark with no valid predecessor passes through
    assert iteration_mark_normalize("々x") == "々x"


def test_katakana_stem():
    assert katakana_stem("コンピューター") == "コンピュータ"
    assert katakana_stem("サーバー") == "サーバ"
    assert katakana_stem("ソロー", minimum_length=4) == "ソロー"  # too short
    assert katakana_stem("データ") == "データ"                    # no trailing ー
    assert katakana_stem("hello-ー") == "hello-ー"                # not katakana


def test_romaji():
    assert kana_to_romaji("きょうと") == "kyouto"
    assert kana_to_romaji("サッカー") == "sakkaa"       # sokuon + choon
    assert kana_to_romaji("マッチ") == "matchi"         # っち → tchi (Hepburn)
    assert kana_to_romaji("しんぶん") == "shinbun"
    assert kana_to_romaji("じゃじゅじょ") == "jajujo"
    assert kana_to_romaji("ヴァイオリン") == "vaiorin"


def test_ja_numbers():
    assert ja_normalize_number("二百三十五") == "235"
    assert ja_normalize_number("千二百万") == "12000000"
    assert ja_normalize_number("3千") == "3000"          # mixed arabic
    assert ja_normalize_number("十") == "10"
    assert ja_normalize_number("〇") == "0"
    assert ja_normalize_number("東京") == "東京"          # non-numeral untouched
    assert ja_normalize_number("一部") == "一部"          # mixed with non-numeral


def test_ko_numbers():
    assert ko_normalize_number("삼백오십") == "350"
    assert ko_normalize_number("이만") == "20000"
    assert ko_normalize_number("학교") == "학교"


def test_nori_josa_strip():
    assert nori_analyze("아버지가 학교에 갔다") == ["아버지", "학교", "갔다"]
    assert nori_analyze("서울에서 부산까지") == ["서울", "부산"]
    # ambiguous codas (과/도/나) are NOT stripped — the lattice keeps 사과
    # whole because the dictionary noun beats the 사+과 particle path
    assert nori_analyze("사과 포도") == ["사과", "포도"]
    # a bare particle is tagged J and dropped by the default stop tags
    # (KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS)
    assert nori_analyze("가") == []


def test_kuromoji_analyzer_chain():
    # stopword particles dropped, katakana stemmed, kanji through FMM
    toks = kuromoji_analyze("コンピューターの勉強")
    assert toks == ["コンピュータ", "勉強"]
    # 人々 is a dictionary word (ヒトビト) — one token, like IPADIC; the
    # iteration-mark CHAR FILTER is a separate opt-in stage as in the
    # reference (JapaneseAnalyzer has no char filter by default)
    assert kuromoji_analyze("人々") == ["人々"]
    # nakaguro is punctuation — the lattice splits loanword compounds there
    assert kuromoji_analyze("ビル・ゲイツ") == ["ビル", "ゲイツ"]


def test_ja_ko_filter_registration():
    from elasticsearch_spark.functions.analysis import (
        ANALYZERS, CHAR_FILTER_FACTORIES, TOKEN_FILTERS, TOKENIZERS,
    )

    assert TOKEN_FILTERS["ja_stop"](["勉強", "の", "です"]) == ["勉強"]
    assert TOKEN_FILTERS["kuromoji_stemmer"](["サーバー"]) == ["サーバ"]
    assert TOKEN_FILTERS["kuromoji_readingform"](
        ["とうきょう"], use_romaji=True) == ["toukyou"]
    assert TOKEN_FILTERS["kuromoji_number"](["二百"]) == ["200"]
    assert TOKEN_FILTERS["nori_number"](["삼백"]) == ["300"]
    assert TOKEN_FILTERS["nori_part_of_speech"](["아버지가"]) == ["아버지"]
    assert CHAR_FILTER_FACTORIES["kuromoji_iteration_mark"]()("人々") == "人人"
    assert TOKENIZERS["kuromoji_tokenizer"]("日本語の勉強") == ["日本語", "の", "勉強"]
    assert TOKENIZERS["nori_tokenizer"]("한국어 공부") == ["한국어", "공부"]
    assert ANALYZERS["nori"]("학교에 갔다") == ["학교", "갔다"]
    assert ANALYZERS["kuromoji"]("日本語の勉強") != []


# --- lattice robustness fuzz ------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ANY_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),       # ascii
        st.characters(min_codepoint=0x3040, max_codepoint=0x30FF),   # kana
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),   # han
        st.characters(min_codepoint=0xAC00, max_codepoint=0xACFF),   # hangul
        st.sampled_from("ー々ゝゞ・。、０９ＡＺ"),
    ),
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(_ANY_TEXT)
def test_lattice_total_and_lossless(s):
    """Every position has a candidate (no unreachable lattice nodes) and
    segmentation is LOSSLESS: the concatenated token surfaces are exactly
    the input minus whitespace (punctuation included when not discarded)."""
    from elasticsearch_spark.functions.cjk import (
        icu_tokenize, kuromoji_tokenize_rich, nori_tokenize_rich,
    )

    stripped = "".join(c for c in s if not c.isspace())
    ja = kuromoji_tokenize_rich(s, discard_punctuation=False)
    assert "".join(t.surface for t in ja) == stripped
    ko = nori_tokenize_rich(s, discard_punctuation=False,
                            decompound_mode="none")
    assert "".join(t.surface for t in ko) == stripped
    icu_tokenize(s)  # must not crash (its own lossy lowercasing is fine)
