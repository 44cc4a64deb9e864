"""The reference plugins' PUBLISHED test vectors, reproduced exactly.

Sources (all in /root/reference, read-only):
- plugins/analysis-kuromoji/src/test/java/org/elasticsearch/plugin/
  analysis/kuromoji/KuromojiAnalysisTests.java
- plugins/analysis-kuromoji/src/test/resources/.../kuromoji_analysis.json
  (the filter configs those tests reference: kuromoji_pos stoptags
  ["#  verb-main:", "動詞-自立"], ja_stop ["_japanese_", "スピード"],
  kuromoji_ks minimum_length 6, iteration-mark kanji/kana flags)
- plugins/analysis-nori/src/test/java/org/elasticsearch/plugin/analysis/
  nori/NoriAnalysisTests.java

Each test names the reference test method it mirrors. The segmentations
come from the unigram-Viterbi lattice in functions/cjk.py — same method as
the reference's kuromoji/nori, embedded lexicon instead of MeCab dictionaries
— and must agree with the reference's dictionaries on every vector here.
"""

from __future__ import annotations

from elasticsearch_spark.functions.analysis import (
    CHAR_FILTER_FACTORIES, TOKEN_FILTERS, TOKENIZER_FACTORIES,
)
from elasticsearch_spark.functions.cjk import (
    kuromoji_analyze, kuromoji_tokenize, nori_analyze, nori_tokenize,
    nori_tokenize_rich,
)


def _ja(text):  # JapaneseTokenizer SEARCH-mode stand-in
    return kuromoji_tokenize(text)


# ---- kuromoji ------------------------------------------------------------

def test_kuromoji_tokenizer_base():
    # KuromojiAnalysisTests.testBaseFormFilterFactory source segmentation
    assert _ja("私は制限スピードを超える。") == [
        "私", "は", "制限", "スピード", "を", "超える"]


def test_kuromoji_part_of_speech_custom_stoptags():
    # testBaseFormFilterFactory: kuromoji_pos stoptags
    # ["#  verb-main:", "動詞-自立"] — comment line ignored, verb dropped
    toks = _ja("私は制限スピードを超える。")
    out = TOKEN_FILTERS["kuromoji_part_of_speech"](
        toks, stoptags=["#  verb-main:", "動詞-自立"])
    assert out == ["私", "は", "制限", "スピード", "を"]


def test_kuromoji_part_of_speech_default():
    # testPartOfSpeechFilter: default stoptags drop the particles
    toks = _ja("寿司がおいしいね")
    assert toks == ["寿司", "が", "おいしい", "ね"]
    assert TOKEN_FILTERS["kuromoji_part_of_speech"](toks) == ["寿司", "おいしい"]


def test_kuromoji_readingform():
    # testReadingFormFilterFactory: romaji and katakana forms
    toks = _ja("今夜はロバート先生と話した")
    assert TOKEN_FILTERS["kuromoji_readingform"](toks, use_romaji=True) == [
        "kon'ya", "ha", "robato", "sensei", "to", "hanashi", "ta"]
    assert TOKEN_FILTERS["kuromoji_readingform"](toks) == [
        "コンヤ", "ハ", "ロバート", "センセイ", "ト", "ハナシ", "タ"]


def test_kuromoji_katakana_stem_default_and_minlen6():
    # testKatakanaStemFilter: パーティー stems at default min 4,
    # コピー survives (too short); min 6 stems neither
    toks = _ja("明後日パーティーに行く予定がある。図書館で資料をコピーしました。")
    assert toks == ["明後日", "パーティー", "に", "行く", "予定", "が", "ある",
                    "図書館", "で", "資料", "を", "コピー", "し", "まし", "た"]
    assert TOKEN_FILTERS["kuromoji_stemmer"](toks) == [
        "明後日", "パーティ", "に", "行く", "予定", "が", "ある",
        "図書館", "で", "資料", "を", "コピー", "し", "まし", "た"]
    assert TOKEN_FILTERS["kuromoji_stemmer"](toks, minimum_length=6) == toks


def test_kuromoji_iteration_mark_char_filter():
    # testIterationMarkCharFilter: only-kanji / only-kana / default
    src = "ところゞゝゝ、ジヾが、時々、馬鹿々々しい"
    only_kanji = CHAR_FILTER_FACTORIES["kuromoji_iteration_mark"](
        normalize_kanji=True, normalize_kana=False)
    assert only_kanji(src) == "ところゞゝゝ、ジヾが、時時、馬鹿馬鹿しい"
    only_kana = CHAR_FILTER_FACTORIES["kuromoji_iteration_mark"](
        normalize_kanji=False, normalize_kana=True)
    assert only_kana(src) == "ところどころ、ジジが、時々、馬鹿々々しい"
    default = CHAR_FILTER_FACTORIES["kuromoji_iteration_mark"]()
    assert default(src) == "ところどころ、ジジが、時時、馬鹿馬鹿しい"


def test_kuromoji_ja_stop_with_extra_stopword():
    # testJapaneseStopFilterFactory: ja_stop ["_japanese_", "スピード"]
    toks = _ja("私は制限スピードを超える。")
    out = TOKEN_FILTERS["ja_stop"](toks, stopwords=["_japanese_", "スピード"])
    assert out == ["私", "制限", "超える"]


def test_kuromoji_number_filter():
    # testNumberFilterFactory
    toks = _ja("本日十万二千五百円のワインを買った")
    assert TOKEN_FILTERS["kuromoji_number"](toks) == [
        "本日", "102500", "円", "の", "ワイン", "を", "買っ", "た"]


def test_kuromoji_user_dict_tokenizer():
    # testKuromojiUserDict: user_dict.txt rule keeps 制限スピード whole
    tk = TOKENIZER_FACTORIES["kuromoji_tokenizer"](
        user_dictionary_rules=[
            "制限スピード,制限スピード,セイゲンスピード,テスト名詞"])
    assert tk("私は制限スピードを超える。") == [
        "私", "は", "制限スピード", "を", "超える"]


def test_kuromoji_analyzer_user_dictionary_rules():
    # testKuromojiAnalyzerUserDict: full analyzer with rules
    rules = ["c++,c++,w,w", "制限スピード,制限スピード,セイゲンスピード,テスト名詞"]
    assert kuromoji_analyze("制限スピード", user_rules=rules) == ["制限スピード"]
    assert kuromoji_analyze("c++world", user_rules=rules) == ["c++", "world"]


def test_kuromoji_baseform():
    # JapaneseBaseFormFilter semantics (the filter the analyzer chain runs):
    # conjugated forms map to dictionary form
    assert TOKEN_FILTERS["kuromoji_baseform"](["話し", "た"]) == ["話す", "た"]
    assert TOKEN_FILTERS["kuromoji_baseform"](["買っ"]) == ["買う"]


# ---- nori ----------------------------------------------------------------

def test_nori_tokenizer_vectors():
    # NoriAnalysisTests.testNoriTokenizer (decompound_mode=mixed)
    tk = TOKENIZER_FACTORIES["nori_tokenizer"](decompound_mode="mixed")
    assert tk("뿌리가 깊은 나무") == ["뿌리", "가", "깊", "은", "나무"]
    assert tk("가늠표") == ["가늠표", "가늠", "표"]
    # discard_punctuation default(true)
    assert tk("3.2개") == ["3", "2", "개"]


def test_nori_tokenizer_discard_punctuation_false():
    # testNoriTokenizerDiscardPunctuationOptionFalse
    toks = [t.surface for t in
            nori_tokenize_rich("3.2개", discard_punctuation=False)]
    assert toks == ["3", ".", "2", "개"]


def test_nori_analyzer_stoptags_nr_sp():
    # testNoriAnalyzer: stoptags "NR, SP", decompound mixed
    toks = nori_tokenize("여섯 용이", decompound_mode="mixed")
    out = TOKEN_FILTERS["nori_part_of_speech"](toks, stoptags=["NR", "SP"])
    assert out == ["용", "이"]
    assert nori_tokenize("가늠표", decompound_mode="mixed") == [
        "가늠표", "가늠", "표"]


def test_nori_user_dictionary_rules():
    # testNoriAnalyzerUserDict: "세종시 세종 시" decompounds, "c++" holds
    rules = ["c++", "C샤프", "세종", "세종시 세종 시"]
    assert nori_tokenize("세종시", user_rules=rules) == ["세종", "시"]
    assert nori_analyze("c++world", user_rules=rules) == ["c++", "world"]


def test_nori_part_of_speech_custom():
    # testNoriPartOfSpeech: stoptags "NR, SP"
    toks = nori_tokenize("여섯 용이")
    out = TOKEN_FILTERS["nori_part_of_speech"](toks, stoptags=["NR", "SP"])
    assert out == ["용", "이"]


def test_nori_readingform():
    # testNoriReadingForm: hanja → hangul reading
    assert TOKEN_FILTERS["nori_readingform"](nori_tokenize("鄕歌")) == ["향가"]


def test_nori_number():
    # testNoriNumber
    toks = nori_tokenize("오늘 십만이천오백원짜리 와인 구입")
    assert TOKEN_FILTERS["nori_number"](toks) == [
        "오늘", "102500", "원", "짜리", "와인", "구입"]


def test_kuromoji_completion_filter():
    # testCompletionFilterFactory: index mode emits surface + wapuro
    # romaji of the reading; query mode keeps the input as one prefix unit
    from elasticsearch_spark.functions.cjk import kuromoji_completion

    assert kuromoji_completion("東京都", "index") == [
        "東京", "toukyou", "都", "to"]
    assert kuromoji_completion("サッk", "query") == ["サッk", "sakk"]


def test_kuromoji_completion_analyzer():
    # testCompletionAnalyzer: halfwidth input width-folds, ー survives in
    # the romaji (soーsu), query mode concatenates
    from elasticsearch_spark.functions.cjk import kuromoji_completion

    assert kuromoji_completion("ｿｰｽｺｰﾄﾞ", "index") == [
        "ソース", "soーsu", "コード", "koーdo"]
    assert kuromoji_completion("ｿｰｽｺｰﾄﾞ", "query") == [
        "ソースコード", "soーsukoーdo"]
    # the TOKEN_FILTERS registration drives the same path token-wise
    assert TOKEN_FILTERS["kuromoji_completion"](["東京", "都"]) == [
        "東京", "toukyou", "都", "to"]


def test_kuromoji_nbest_cost():
    # testNbestCost: nbest_cost 2000 (reference IPADIC cost units)
    tk = TOKENIZER_FACTORIES["kuromoji_tokenizer"](nbest_cost="2000")
    assert tk("鳩山積み") == ["鳩", "鳩山", "山積み", "積み"]


def test_kuromoji_nbest_examples():
    # testNbestExample: window derived from /text-token/ examples
    tk = TOKENIZER_FACTORIES["kuromoji_tokenizer"](
        nbest_examples="/鳩山積み-鳩山/鳩山積み-鳩/")
    assert tk("鳩山積み") == ["鳩", "鳩山", "山積み", "積み"]


def test_kuromoji_nbest_both_options():
    # testNbestBothOptions: examples + cost 1000 → max of the two windows
    tk = TOKENIZER_FACTORIES["kuromoji_tokenizer"](
        nbest_examples="/鳩山積み-鳩山/鳩山積み-鳩/", nbest_cost="1000")
    assert tk("鳩山積み") == ["鳩", "鳩山", "山積み", "積み"]
    # without nbest the best path alone comes out
    plain = TOKENIZER_FACTORIES["kuromoji_tokenizer"]()
    assert plain("鳩山積み") == ["鳩", "山積み"]


# ---- analysis-phonetic (SimplePhoneticAnalysisTests) -----------------------

def test_phonetic_daitch_mokotoff():
    # testPhoneticTokenFilterDaitchMotokoff: chauptman → 473660 / 573660
    # (branching on the ambiguous CH group)
    out = TOKEN_FILTERS["phonetic"](["chauptman"], encoder="daitch_mokotoff")
    assert out == ["473660", "573660"]
    # published DM examples
    from elasticsearch_spark.functions.analysis import daitch_mokotoff

    assert daitch_mokotoff("Moskowitz") == ["645740"]
    assert daitch_mokotoff("GOLDEN") == ["583600"]
    assert daitch_mokotoff("Mintz") == ["664000"]
    assert daitch_mokotoff("Peters") == ["734000", "739400"]
    # the EU digraph and J-as-vowel context (1985 table)
    assert daitch_mokotoff("Breuer") == ["791900"]
    assert daitch_mokotoff("Neumann") == ["616600"]
