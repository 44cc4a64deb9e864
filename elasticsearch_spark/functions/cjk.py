"""CJK morphological analysis: unigram-Viterbi lattice segmentation — the
kuromoji / nori / smartcn / icu_tokenizer analog family.

The reference ships CJK tokenization as plugins —
``plugins/analysis-kuromoji/.../KuromojiTokenizerFactory.java`` (Japanese:
Viterbi lattice over MeCab-IPADIC), ``plugins/analysis-nori/.../
NoriTokenizerFactory.java`` (Korean: lattice over mecab-ko-dic),
``plugins/analysis-smartcn/`` (Chinese HMM), ``plugins/analysis-icu/...``
(ICU BreakIterator). Those engines embed multi-megabyte dictionaries; this
module implements the same METHOD — a word lattice with per-morpheme costs
solved by Viterbi (min total cost), unknown-word candidates generated per
character class exactly like kuromoji's UnknownDictionary, user-dictionary
rules, part-of-speech tags, readings, compound decomposition — over an
embedded frequency lexicon (ja ~13.7k / ko ~4.9k / zh ~14.9k entries —
base tables here plus the scaled-up ``cjk_data.py`` extension: IPADIC-style
conjugated-surface rows, mecab-ko-dic-style fused contractions, frequency
tiers — POS-tagged, with readings and base forms; ≥80% of Han/kana/hangul
tokens on held-out web text resolve from the dictionary, pinned by
``tests/test_cjk_lexicon_coverage.py`` and the ``analysis_cjk_coverage``
oracle). The remaining delta vs the reference's multi-hundred-thousand-entry
dictionaries is tail vocabulary (and ``user_dictionary_rules`` is the
standard extension hook);
the segmentation algorithm, the filter semantics (part-of-speech stop,
baseform, readingform, katakana stem, ja_stop, number normalization,
iteration marks, decompound modes), and the published reference test
vectors (``plugins/analysis-kuromoji/src/test/.../KuromojiAnalysisTests
.java``, ``plugins/analysis-nori/src/test/.../NoriAnalysisTests.java``)
are matched exactly — see tests/test_cjk_reference_vectors.py.

Deterministic by construction: fixed lexicons, integer costs, stable
tie-breaks (dictionary entries relax before unknown candidates; strictly
lower cost replaces).
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = [
    "icu_tokenize", "smartcn_analyze", "icu_analyzer_analyze", "CJK_LEXICON",
    "kuromoji_tokenize", "kuromoji_analyze", "nori_tokenize", "nori_analyze",
    "kuromoji_tokenize_rich", "nori_tokenize_rich",
    "kana_to_romaji", "reading_to_romaji", "kuromoji_completion",
    "ja_normalize_number",
    "ko_normalize_number", "iteration_mark_normalize", "katakana_stem",
    "JA_STOPWORDS", "DEFAULT_JA_STOPTAGS", "DEFAULT_KO_STOPTAGS",
    "ja_lookup", "ko_lookup", "pos_matches",
]


class Token(NamedTuple):
    """One lattice output token: surface + the dictionary attributes the
    reference's TokenInfoDictionary carries (POS, reading, base form,
    compound splits) plus the punctuation flag (discard_punctuation)."""

    surface: str
    pos: str            # hierarchical tag: "助詞-係助詞" / "NNG" / ...
    reading: str | None  # katakana (ja) / hangul (ko hanja) reading
    base: str | None    # dictionary (base) form, ja conjugables
    splits: tuple       # compound decomposition (nori, user dicts)
    punct: bool
    known: bool         # came from the lexicon (vs unknown-word rule)


class _Entry(NamedTuple):
    cost: int
    pos: str
    reading: str | None = None
    base: str | None = None
    splits: tuple = ()


# --------------------------------------------------------------------------
# character classes
# --------------------------------------------------------------------------

def _is_han(c: str) -> bool:
    o = ord(c)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2A6DF)


def _kana_script(c: str) -> int:
    """0 = not kana, 1 = hiragana, 2 = katakana (ー and halfwidth forms
    extend katakana)."""
    o = ord(c)
    if 0x3040 <= o <= 0x309F:
        return 1
    # 0x30FB is the katakana MIDDLE DOT ・ — punctuation, not kana (the
    # lattice splits loanword compounds there like the reference)
    if (0x30A1 <= o <= 0x30FF and o != 0x30FB) or 0xFF66 <= o <= 0xFF9F:
        return 2
    return 0


def _is_hangul(c: str) -> bool:
    o = ord(c)
    return 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F


_JA_NUM_CHARS = set("0123456789〇一二三四五六七八九十百千万億兆０１２３４５６７８９")
_KO_NUM_CHARS = set("0123456789영공일이삼사오육칠팔구십백천만억조")


def _run_len(text: str, i: int, pred) -> int:
    j = i
    while j < len(text) and pred(text[j]):
        j += 1
    return j - i


# --------------------------------------------------------------------------
# the lattice (kuromoji's ViterbiNBestPathCalculator, unigram-cost form)
# --------------------------------------------------------------------------

def _viterbi(seg: str, lexicon: dict, max_word: int, unknown_fn) -> list[Token]:
    """Min-cost segmentation of one whitespace-free span. Dictionary
    candidates relax before unknown candidates at each position and a
    strictly-lower cost is required to replace, so ties deterministically
    prefer dictionary paths."""
    n = len(seg)
    INF = float("inf")
    best = [INF] * (n + 1)
    best[0] = 0
    back: list = [None] * (n + 1)
    for i in range(n):
        if best[i] == INF:
            continue
        hi = min(max_word, n - i)
        for ln in range(1, hi + 1):
            e = lexicon.get(seg[i:i + ln])
            if e is not None:
                c = best[i] + e.cost
                if c < best[i + ln]:
                    best[i + ln] = c
                    back[i + ln] = (i, e, False)
        for ln, cost, e in unknown_fn(seg, i):
            c = best[i] + cost
            if c < best[i + ln]:
                best[i + ln] = c
                back[i + ln] = (i, e, True)
    toks: list[Token] = []
    j = n
    while j > 0:
        i, e, unk = back[j]
        toks.append(Token(seg[i:j], e.pos, e.reading, e.base, e.splits,
                          e.pos in ("記号", "SP"), not unk))
        j = i
    toks.reverse()
    return toks




def _lattice_costs(seg: str, lexicon: dict, max_word: int, unknown_fn):
    """Forward (F) and backward (B) best path costs plus the candidate
    edge list — shared by the n-best emission and the nbest_examples
    window derivation."""
    n = len(seg)
    INF = float("inf")
    F_ = [INF] * (n + 1)
    F_[0] = 0
    B_ = [INF] * (n + 1)
    B_[n] = 0
    cands: list = []  # (i, j, entry)
    for i in range(n):
        hi = min(max_word, n - i)
        for ln in range(1, hi + 1):
            e = lexicon.get(seg[i:i + ln])
            if e is not None:
                cands.append((i, i + ln, e))
        for ln, cost, e in unknown_fn(seg, i):
            cands.append((i, i + ln, e))
    for i, j, e in sorted(cands, key=lambda c: c[0]):
        if F_[i] + e.cost < F_[j]:
            F_[j] = F_[i] + e.cost
    for i, j, e in sorted(cands, key=lambda c: -c[1]):
        if e.cost + B_[j] < B_[i]:
            B_[i] = e.cost + B_[j]
    return F_, B_, cands


def _viterbi_nbest(seg: str, lexicon: dict, max_word: int, unknown_fn,
                   nbest_cost: int) -> list[Token]:
    """kuromoji's nbest emission (KuromojiTokenizerFactory nbest_cost):
    besides the best path, emit every DICTIONARY word whose cheapest path
    through it costs at most ``nbest_cost`` more than the global best —
    computed with forward (F) and backward (B) lattice costs, the standard
    n-best-lattice criterion F[i] + cost(w) + B[j] ≤ best + Δ. Output is
    ordered by (start, end) like the reference's offset-ordered stream."""
    F_, B_, cands = _lattice_costs(seg, lexicon, max_word, unknown_fn)
    best = F_[len(seg)]
    # the best path carries the unknown-word tokens; extra DICTIONARY
    # words within the Δ window join it (kuromoji emits sub-path words,
    # not alternative unknown groupings)
    spans = []
    p = 0
    for t in _viterbi(seg, lexicon, max_word, unknown_fn):
        spans.append((p, p + len(t.surface), t))
        p += len(t.surface)
    span_keys = {(i, j) for i, j, _ in spans}
    extra = []
    for i, j, e in cands:
        if (i, j) in span_keys or lexicon.get(seg[i:j]) is not e:
            continue
        if F_[i] + e.cost + B_[j] <= best + nbest_cost:
            extra.append((i, j, Token(seg[i:j], e.pos, e.reading, e.base,
                                      e.splits, e.pos in ("記号", "SP"),
                                      True)))
    merged = sorted(spans + extra, key=lambda s: (s[0], s[1]))
    return [t for _, _, t in merged]


def _lattice_tokens(text: str, lexicon: dict, max_word: int,
                    unknown_fn, seg_fn=None) -> list[Token]:
    """Whitespace-span split + per-span segmentation (``seg_fn`` overrides
    the default single-best Viterbi — the nbest path plugs in here)."""
    if seg_fn is None:
        def seg_fn(s):
            return _viterbi(s, lexicon, max_word, unknown_fn)
    out: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace():
            j += 1
        out.extend(seg_fn(text[i:j]))
        i = j
    return out


def pos_matches(pos: str, stoptags) -> bool:
    """Hierarchical tag match (JapanesePartOfSpeechStopFilter /
    KoreanPartOfSpeechStopFilter): a stoptag stops a token whose POS equals
    it or refines it (``助詞`` stops ``助詞-係助詞``). Entries starting
    with ``#`` are comments (the reference's stoptags parse)."""
    for t in stoptags:
        t = str(t).strip()
        if not t or t.startswith("#"):
            continue
        if pos == t or pos.startswith(t + "-"):
            return True
    return False


# --------------------------------------------------------------------------
# Japanese lexicon (IPADIC-style POS, katakana readings, base forms)
# --------------------------------------------------------------------------
# line format: surface POS [reading] [base] — "-" = absent. Costs derive
# from the POS class (function words cheapest, like IPADIC's cost scale).

_JA_TABLE = """
は 助詞-係助詞 ハ -
が 助詞-格助詞 ガ -
を 助詞-格助詞 ヲ -
に 助詞-格助詞 ニ -
で 助詞-格助詞 デ -
と 助詞-格助詞 ト -
の 助詞-連体化 ノ -
へ 助詞-格助詞 ヘ -
も 助詞-係助詞 モ -
や 助詞-並立助詞 ヤ -
から 助詞-格助詞 カラ -
まで 助詞-副助詞 マデ -
より 助詞-格助詞 ヨリ -
ね 助詞-終助詞 ネ -
よ 助詞-終助詞 ヨ -
か 助詞-副助詞 カ -
ば 助詞-接続助詞 バ -
て 助詞-接続助詞 テ -
ので 助詞-接続助詞 ノデ -
けど 助詞-接続助詞 ケド -
など 助詞-副助詞 ナド -
だけ 助詞-副助詞 ダケ -
しか 助詞-副助詞 シカ -
ながら 助詞-接続助詞 ナガラ -
た 助動詞 タ た
だ 助動詞 ダ だ
です 助動詞 デス です
でし 助動詞 デシ です
ます 助動詞 マス ます
まし 助動詞 マシ ます
ませ 助動詞 マセ ます
ない 助動詞 ナイ ない
なかっ 助動詞 ナカッ ない
う 助動詞 ウ う
よう 助動詞 ヨウ よう
れ 動詞-接尾 レ れる
られ 動詞-接尾 ラレ られる
せ 動詞-接尾 セ せる
する 動詞-自立 スル する
し 動詞-自立 シ する
さ 動詞-自立 サ する
すれ 動詞-自立 スレ する
いる 動詞-非自立 イル いる
い 動詞-非自立 イ いる
ある 動詞-自立 アル ある
あっ 動詞-自立 アッ ある
あり 動詞-自立 アリ ある
なる 動詞-自立 ナル なる
なっ 動詞-自立 ナッ なる
なり 動詞-自立 ナリ なる
行く 動詞-自立 イク 行く
行っ 動詞-自立 イッ 行く
行き 動詞-自立 イキ 行く
来る 動詞-自立 クル 来る
来 動詞-自立 キ 来る
見る 動詞-自立 ミル 見る
見 動詞-自立 ミ 見る
言う 動詞-自立 イウ 言う
言っ 動詞-自立 イッ 言う
思う 動詞-自立 オモウ 思う
思っ 動詞-自立 オモッ 思う
話す 動詞-自立 ハナス 話す
話し 動詞-自立 ハナシ 話す
話さ 動詞-自立 ハナサ 話す
買う 動詞-自立 カウ 買う
買っ 動詞-自立 カッ 買う
買い 動詞-自立 カイ 買う
使う 動詞-自立 ツカウ 使う
使っ 動詞-自立 ツカッ 使う
作る 動詞-自立 ツクル 作る
作っ 動詞-自立 ツクッ 作る
持つ 動詞-自立 モツ 持つ
持っ 動詞-自立 モッ 持つ
読む 動詞-自立 ヨム 読む
読ん 動詞-自立 ヨン 読む
書く 動詞-自立 カク 書く
書い 動詞-自立 カイ 書く
食べる 動詞-自立 タベル 食べる
食べ 動詞-自立 タベ 食べる
飲む 動詞-自立 ノム 飲む
出る 動詞-自立 デル 出る
出 動詞-自立 デ 出る
入る 動詞-自立 ハイル 入る
分かる 動詞-自立 ワカル 分かる
分かっ 動詞-自立 ワカッ 分かる
できる 動詞-自立 デキル できる
でき 動詞-自立 デキ できる
超える 動詞-自立 コエル 超える
働く 動詞-自立 ハタラク 働く
住む 動詞-自立 スム 住む
待つ 動詞-自立 マツ 待つ
聞く 動詞-自立 キク 聞く
知る 動詞-自立 シル 知る
知っ 動詞-自立 シッ 知る
おいしい 形容詞-自立 オイシイ おいしい
新しい 形容詞-自立 アタラシイ 新しい
大きい 形容詞-自立 オオキイ 大きい
小さい 形容詞-自立 チイサイ 小さい
高い 形容詞-自立 タカイ 高い
安い 形容詞-自立 ヤスイ 安い
良い 形容詞-自立 ヨイ 良い
いい 形容詞-自立 イイ いい
多い 形容詞-自立 オオイ 多い
少ない 形容詞-自立 スクナイ 少ない
長い 形容詞-自立 ナガイ 長い
早い 形容詞-自立 ハヤイ 早い
楽しい 形容詞-自立 タノシイ 楽しい
好き 名詞-形容動詞語幹 スキ -
きれい 名詞-形容動詞語幹 キレイ -
元気 名詞-形容動詞語幹 ゲンキ -
大切 名詞-形容動詞語幹 タイセツ -
便利 名詞-形容動詞語幹 ベンリ -
有名 名詞-形容動詞語幹 ユウメイ -
私 名詞-代名詞 ワタシ -
僕 名詞-代名詞 ボク -
彼 名詞-代名詞 カレ -
彼女 名詞-代名詞 カノジョ -
これ 名詞-代名詞 コレ -
それ 名詞-代名詞 ソレ -
あれ 名詞-代名詞 アレ -
ここ 名詞-代名詞 ココ -
そこ 名詞-代名詞 ソコ -
誰 名詞-代名詞 ダレ -
何 名詞-代名詞 ナニ -
この 連体詞 コノ -
その 連体詞 ソノ -
あの 連体詞 アノ -
とても 副詞 トテモ -
もっと 副詞 モット -
まだ 副詞 マダ -
もう 副詞 モウ -
また 副詞 マタ -
そして 接続詞 ソシテ -
しかし 接続詞 シカシ -
でも 接続詞 デモ -
制限 名詞 セイゲン -
寿司 名詞 スシ -
今夜 名詞 コンヤ -
先生 名詞 センセイ -
明後日 名詞 アサッテ -
予定 名詞 ヨテイ -
図書館 名詞 トショカン -
資料 名詞 シリョウ -
本日 名詞 ホンジツ -
円 名詞-接尾 エン -
人 名詞-接尾 ニン -
人々 名詞 ヒトビト -
東京 名詞-固有 トウキョウ -
都 名詞-接尾 ト -
大阪 名詞-固有 オオサカ -
京都 名詞-固有 キョウト -
日本 名詞-固有 ニホン -
日本語 名詞 ニホンゴ -
中国 名詞-固有 チュウゴク -
韓国 名詞-固有 カンコク -
会社 名詞 カイシャ -
仕事 名詞 シゴト -
学校 名詞 ガッコウ -
学生 名詞 ガクセイ -
大学 名詞 ダイガク -
時間 名詞 ジカン -
今日 名詞 キョウ -
明日 名詞 アシタ -
昨日 名詞 キノウ -
今 名詞 イマ -
天気 名詞 テンキ -
映画 名詞 エイガ -
音楽 名詞 オンガク -
料理 名詞 リョウリ -
野球 名詞 ヤキュウ -
漢字 名詞 カンジ -
言葉 名詞 コトバ -
世界 名詞 セカイ -
勉強 名詞 ベンキョウ -
研究 名詞 ケンキュウ -
技術 名詞 ギジュツ -
情報 名詞 ジョウホウ -
ソース 名詞 ソース -
コード 名詞 コード -
データ 名詞 データ -
システム 名詞 システム -
サービス 名詞 サービス -
インターネット 名詞 インターネット -
コンピュータ 名詞 コンピュータ -
プログラム 名詞 プログラム -
検索 名詞 ケンサク -
解析 名詞 カイセキ -
試合 名詞 シアイ -
参加 名詞 サンカ -
電車 名詞 デンシャ -
電話 名詞 デンワ -
家族 名詞 カゾク -
友達 名詞 トモダチ -
子供 名詞 コドモ -
男 名詞 オトコ -
女 名詞 オンナ -
水 名詞 ミズ -
火 名詞 ヒ -
空 名詞 ソラ -
山 名詞 ヤマ -
川 名詞 カワ -
海 名詞 ウミ -
雨 名詞 アメ -
雪 名詞 ユキ -
風 名詞 カゼ -
花 名詞 ハナ -
木 名詞 キ -
犬 名詞 イヌ -
猫 名詞 ネコ -
鳥 名詞 トリ -
魚 名詞 サカナ -
肉 名詞 ニク -
野菜 名詞 ヤサイ -
果物 名詞 クダモノ -
朝 名詞 アサ -
昼 名詞 ヒル -
夜 名詞 ヨル -
週 名詞 シュウ -
月 名詞 ツキ -
年 名詞-接尾 ネン -
国 名詞 クニ -
町 名詞 マチ -
駅 名詞 エキ -
店 名詞 ミセ -
家 名詞 イエ -
部屋 名詞 ヘヤ -
道 名詞 ミチ -
名前 名詞 ナマエ -
問題 名詞 モンダイ -
質問 名詞 シツモン -
答え 名詞 コタエ -
意味 名詞 イミ -
方法 名詞 ホウホウ -
結果 名詞 ケッカ -
理由 名詞 リユウ -
関係 名詞 カンケイ -
文化 名詞 ブンカ -
歴史 名詞 レキシ -
経済 名詞 ケイザイ -
政治 名詞 セイジ -
社会 名詞 シャカイ -
自然 名詞 シゼン -
環境 名詞 カンキョウ -
科学 名詞 カガク -
医者 名詞 イシャ -
病院 名詞 ビョウイン -
銀行 名詞 ギンコウ -
旅行 名詞 リョコウ -
写真 名詞 シャシン -
新聞 名詞 シンブン -
雑誌 名詞 ザッシ -
辞書 名詞 ジショ -
文章 名詞 ブンショウ -
文字 名詞 モジ -
番号 名詞 バンゴウ -
住所 名詞 ジュウショ -
地図 名詞 チズ -
荷物 名詞 ニモツ -
切符 名詞 キップ -
お金 名詞 オカネ -
値段 名詞 ネダン -
買い物 名詞 カイモノ -
食事 名詞 ショクジ -
朝食 名詞 チョウショク -
夕食 名詞 ユウショク -
会議 名詞 カイギ -
説明 名詞 セツメイ -
練習 名詞 レンシュウ -
試験 名詞 シケン -
宿題 名詞 シュクダイ -
授業 名詞 ジュギョウ -
卒業 名詞 ソツギョウ -
入学 名詞 ニュウガク -
生活 名詞 セイカツ -
世話 名詞 セワ -
気持ち 名詞 キモチ -
気分 名詞 キブン -
心 名詞 ココロ -
体 名詞 カラダ -
頭 名詞 アタマ -
顔 名詞 カオ -
目 名詞 メ -
耳 名詞 ミミ -
口 名詞 クチ -
手 名詞 テ -
足 名詞 アシ -
声 名詞 コエ -
話 名詞 ハナシ -
歌 名詞 ウタ -
絵 名詞 エ -
色 名詞 イロ -
音 名詞 オト -
光 名詞 ヒカリ -
力 名詞 チカラ -
鳩 名詞 ハト -
鳩山 名詞-固有 ハトヤマ -
山積み 名詞 ヤマヅミ -
積み 名詞 ツミ -
旅館 名詞 リョカン -
空港 名詞 クウコウ -
病気 名詞 ビョウキ -
薬局 名詞 ヤッキョク -
警察 名詞 ケイサツ -
消防 名詞 ショウボウ -
政府 名詞 セイフ -
選挙 名詞 センキョ -
法律 名詞 ホウリツ -
裁判 名詞 サイバン -
契約 名詞 ケイヤク -
会計 名詞 カイケイ -
給料 名詞 キュウリョウ -
貯金 名詞 チョキン -
保険 名詞 ホケン -
株式 名詞 カブシキ -
貿易 名詞 ボウエキ -
輸出 名詞 ユシュツ -
輸入 名詞 ユニュウ -
工場 名詞 コウジョウ -
機械 名詞 キカイ -
設備 名詞 セツビ -
材料 名詞 ザイリョウ -
製品 名詞 セイヒン -
品質 名詞 ヒンシツ -
価格 名詞 カカク -
販売 名詞 ハンバイ -
宣伝 名詞 センデン -
広告 名詞 コウコク -
放送 名詞 ホウソウ -
番組 名詞 バングミ -
記事 名詞 キジ -
取材 名詞 シュザイ -
出版 名詞 シュッパン -
小説 名詞 ショウセツ -
物語 名詞 モノガタリ -
芝居 名詞 シバイ -
舞台 名詞 ブタイ -
俳優 名詞 ハイユウ -
監督 名詞 カントク -
観客 名詞 カンキャク -
切手 名詞 キッテ -
手紙 名詞 テガミ -
葉書 名詞 ハガキ -
送る 動詞-自立 オクル 送る
送っ 動詞-自立 オクッ 送る
届く 動詞-自立 トドク 届く
届い 動詞-自立 トドイ 届く
運ぶ 動詞-自立 ハコブ 運ぶ
運ん 動詞-自立 ハコン 運ぶ
帰る 動詞-自立 カエル 帰る
帰っ 動詞-自立 カエッ 帰る
休む 動詞-自立 ヤスム 休む
休ん 動詞-自立 ヤスン 休む
遊ぶ 動詞-自立 アソブ 遊ぶ
遊ん 動詞-自立 アソン 遊ぶ
歩く 動詞-自立 アルク 歩く
歩い 動詞-自立 アルイ 歩く
走る 動詞-自立 ハシル 走る
走っ 動詞-自立 ハシッ 走る
泳ぐ 動詞-自立 オヨグ 泳ぐ
泳い 動詞-自立 オヨイ 泳ぐ
教える 動詞-自立 オシエル 教える
教え 動詞-自立 オシエ 教える
習う 動詞-自立 ナラウ 習う
習っ 動詞-自立 ナラッ 習う
覚える 動詞-自立 オボエル 覚える
覚え 動詞-自立 オボエ 覚える
忘れる 動詞-自立 ワスレル 忘れる
忘れ 動詞-自立 ワスレ 忘れる
始める 動詞-自立 ハジメル 始める
始め 動詞-自立 ハジメ 始める
終わる 動詞-自立 オワル 終わる
終わっ 動詞-自立 オワッ 終わる
開く 動詞-自立 ヒラク 開く
開い 動詞-自立 ヒライ 開く
閉める 動詞-自立 シメル 閉める
閉め 動詞-自立 シメ 閉める
"""


def _parse_ja_table() -> dict:
    # function words cheapest, verbs/adjectives next, content nouns last —
    # the IPADIC cost ordering compressed to classes
    cost_of = {
        "助詞": 50, "助動詞": 50, "動詞": 250, "形容詞": 250,
        "連体詞": 150, "副詞": 200, "接続詞": 150,
    }
    lex: dict = {}
    for line in _JA_TABLE.strip().splitlines():
        surface, pos, reading, base = line.split()
        cost = cost_of.get(pos.split("-")[0], 300)
        lex[surface] = _Entry(
            cost, pos,
            None if reading == "-" else reading,
            None if base == "-" else base,
        )
    return lex


def _ja_extension() -> dict:
    """Scaled-up frequency lexicon (cjk_data.py): IPADIC-style conjugated
    verb/adjective surfaces, common nouns with readings, katakana
    loanwords, single-kanji nouns. Extension costs sit ABOVE the base
    table's class costs (content nouns 340 vs 300, verbs 270 vs 250,
    single-kanji 480 — still far below the unknown-word fallbacks at
    700/900 per char) and the base table overwrites on collision, so
    every pinned reference-vector path stays byte-identical."""
    from .cjk_data import expand_ja

    cost_of = {"動詞-自立": 270, "形容詞-自立": 270}
    lex: dict = {}
    for surface, pos, reading, base in expand_ja():
        if surface in lex:
            continue  # first (most frequent) listing wins
        cost = cost_of.get(pos, 480 if len(surface) == 1 else 340)
        lex[surface] = _Entry(cost, pos, reading, base)
    return lex


def _merged_ja() -> dict:
    lex = _ja_extension()
    lex.update(_parse_ja_table())   # base table wins on collision
    return lex


JA_LEXICON: dict = _merged_ja()
_JA_MAX_WORD = max(len(w) for w in JA_LEXICON)

# JapaneseAnalyzer's default stoptags (Lucene ja/stoptags.txt, hierarchical
# prefixes — the full file enumerates subtypes; prefix match covers them)
DEFAULT_JA_STOPTAGS = ("接続詞", "助詞", "助動詞", "記号", "フィラー",
                       "その他-間投", "非言語音", "語断片")

# Lucene stopwords_ja.txt (public Apache Lucene resource) — `ja_stop`.
JA_STOPWORDS: frozenset[str] = frozenset("""
の に は を た が で て と し れ さ ある いる も する から な こと として い や れる など なっ ない この ため その あっ よう また もの
という あり まで られ なる へ か だ これ によって により おり より による ず なり られる において ば なかっ なく しかし について せ
だっ その後 できる それ う ので なお のみ でき き つ における および いう さらに でも ら たり その他 に関する たち ます ん なら
に対して 特に せる 及び これら とき では にて ほか ながら うち そして とともに ただし かつて それぞれ または お ほど ものの
に対する ほとんど と共に といった です とも ところ ここ
""".split())


def _ja_unknown(seg: str, i: int):
    """Unknown-word candidates per character class — kuromoji's
    UnknownDictionary/CharacterDefinition analog: katakana and numeral
    runs group, hiragana/han fall back per character, Latin groups."""
    c = seg[i]
    if c in _JA_NUM_CHARS:
        ln = _run_len(seg, i, lambda x: x in _JA_NUM_CHARS)
        yield ln, 550, _Entry(550, "名詞-数", seg[i:i + ln], None)
        return
    ks = _kana_script(c)
    if ks == 2:
        ln = _run_len(seg, i, lambda x: _kana_script(x) == 2)
        yield ln, 601, _Entry(601, "名詞-一般", seg[i:i + ln], None)
        return
    if ks == 1:
        yield 1, 700, _Entry(700, "名詞-一般", None, None)
        return
    if _is_han(c):
        yield 1, 900, _Entry(900, "名詞-一般", None, None)
        return
    if _is_hangul(c):
        ln = _run_len(seg, i, _is_hangul)
        yield ln, 600, _Entry(600, "名詞-一般", None, None)
        return
    if c.isalnum():
        ln = _run_len(seg, i, lambda x: x.isalnum() and not (
            _is_han(x) or _kana_script(x) or _is_hangul(x) or x in _JA_NUM_CHARS))
        yield ln, 280, _Entry(280, "名詞-一般", None, None)
        return
    yield 1, 30, _Entry(30, "記号", None, None)


def _ja_user_lexicon(user_rules) -> dict:
    """kuromoji ``user_dictionary_rules``: "surface,segmentation,reading,
    pos" (UserDictionary CSV). User entries cost 10 — they beat every
    system path, the reference's user-dictionary override semantics."""
    lex = dict(JA_LEXICON)
    for rule in user_rules or ():
        parts = [p.strip() for p in str(rule).split(",")]
        surface = parts[0]
        segs = tuple(parts[1].split()) if len(parts) > 1 else ()
        reading = parts[2] if len(parts) > 2 else None
        pos = parts[3] if len(parts) > 3 else "名詞"
        splits = segs if len(segs) > 1 else ()
        lex[surface] = _Entry(10, pos, reading, None, splits)
    return lex


def kuromoji_tokenize_rich(text: str, user_rules=None,
                           discard_punctuation: bool = True,
                           nbest_cost: int = 0,
                           nbest_examples: str | None = None) -> list[Token]:
    """kuromoji_tokenizer analog: the Japanese lattice (module docstring).
    Long-vowel and iteration-mark NORMALIZATION is not applied here — as in
    the reference, ``kuromoji_iteration_mark`` is a separate char filter.

    ``nbest_cost`` (KuromojiTokenizerFactory): also emit dictionary words
    whose path lies within the cost window of the best segmentation —
    given in the REFERENCE's IPADIC cost units (≈10× this lattice's
    scale, divided down here). ``nbest_examples`` ("/text-token/…")
    derives the window as the smallest cost that surfaces every listed
    token, exactly the reference's calcNBestCost; both given → max."""
    lex = _ja_user_lexicon(user_rules) if user_rules else JA_LEXICON
    mw = max(_JA_MAX_WORD, max((len(w) for w in lex), default=1))
    delta = int(nbest_cost) // 10
    if nbest_examples:
        delta = max(delta, _nbest_cost_from_examples(nbest_examples, lex, mw))
    if int(nbest_cost) > 0 or nbest_examples:  # Δ=0 still emits ties
        toks = _lattice_tokens(
            text, lex, mw, _ja_unknown,
            seg_fn=lambda s: _viterbi_nbest(s, lex, mw, _ja_unknown, delta))
    else:
        toks = _lattice_tokens(text, lex, mw, _ja_unknown)
    if discard_punctuation:
        toks = [t for t in toks if not t.punct]
    return toks


def _nbest_cost_from_examples(examples: str, lex: dict, mw: int) -> int:
    """JapaneseTokenizer.calcNBestCost analog: for each /text-token/ pair,
    the smallest Δ that surfaces ``token`` in the nbest stream of ``text``
    — computed EXACTLY in one lattice pass per example as
    min over occurrences of F[i] + cost + B[j] − best (no scan)."""
    best_delta = 0
    for part in examples.strip("/").split("/"):
        txt, _, want = part.partition("-")
        e = lex.get(want)
        if not txt or not want or e is None:
            continue
        F_, B_, _ = _lattice_costs(txt, lex, mw, _ja_unknown)
        best = F_[len(txt)]
        need = None
        start = txt.find(want)
        while start >= 0:
            j = start + len(want)
            if F_[start] != float("inf") and B_[j] != float("inf"):
                d = int(F_[start] + e.cost + B_[j] - best)
                need = d if need is None else min(need, d)
            start = txt.find(want, start + 1)
        if need is not None:
            best_delta = max(best_delta, max(0, need))
    return best_delta


def kuromoji_tokenize(text: str, user_rules=None) -> list[str]:
    if not text:
        return []
    return [t.surface for t in kuromoji_tokenize_rich(text, user_rules)]


def ja_lookup(token: str) -> _Entry:
    """POS/reading/base for a surface form — the per-token dictionary
    attribute lookup the list[str] filter stages use (the primary lexicon
    entry; unknowns classify by leading character like the lattice)."""
    e = JA_LEXICON.get(token)
    if e is not None:
        return e
    if token and all(ch in _JA_NUM_CHARS for ch in token):
        return _Entry(0, "名詞-数", token, None)
    if token and _kana_script(token[0]) == 2:
        return _Entry(0, "名詞-一般", token, None)
    return _Entry(0, "名詞-一般", None, None)


def ja_reading(token: str) -> str:
    """kuromoji_readingform: the dictionary reading, katakana for kana
    surfaces, the surface itself otherwise."""
    e = ja_lookup(token)
    if e.reading:
        return e.reading
    return "".join(_hira_to_kata(c) for c in token)


def _hira_to_kata(c: str) -> str:
    o = ord(c)
    if 0x3041 <= o <= 0x3096:
        return chr(o + 0x60)
    return c


def kuromoji_analyze(text: str, user_rules=None) -> list[str]:
    """The ``kuromoji`` analyzer preset = Lucene JapaneseAnalyzer chain:
    tokenizer → baseform → part-of-speech stop (default stoptags) →
    cjk_width → ja_stop → katakana stem → lowercase."""
    from .analysis import TOKEN_FILTERS

    out: list[str] = []
    for t in kuromoji_tokenize_rich(text, user_rules):
        w = t.base or t.surface                      # JapaneseBaseFormFilter
        if pos_matches(t.pos, DEFAULT_JA_STOPTAGS):  # JapanesePOSStopFilter
            continue
        w = TOKEN_FILTERS["cjk_width"]([w])[0]       # CJKWidthFilter
        if w in JA_STOPWORDS:                        # StopFilter (ja set)
            continue
        w = katakana_stem(w)                         # JapaneseKatakanaStem
        out.append(w.lower())
    return out


# --------------------------------------------------------------------------
# Chinese / script-run segmentation (icu_tokenizer, smartcn analogs)
# --------------------------------------------------------------------------

# Frequent multi-character CJK words (simplified Chinese + common Japanese
# kanji compounds) — the Viterbi word lexicon for Han runs.
CJK_LEXICON: frozenset[str] = frozenset("""
人工智能 机器学习 深度学习 自然语言 数据分析 操作系统 计算机 互联网 图书馆 飞行员 工程师 科学家
我们 你们 他们 她们 中国 美国 日本 英国 法国 德国 世界 今天 明天 昨天 现在 时间 什么 可以 没有 知道
喜欢 学习 工作 朋友 老师 学生 学校 大学 中学 小学 电脑 手机 电话 网络 数据 搜索 引擎 系统 软件 硬件
程序 代码 文件 文档 图片 视频 音乐 电影 新闻 信息 技术 科学 经济 政治 文化 历史 地方 城市 北京 上海
广州 深圳 香港 台湾 公司 企业 市场 产品 服务 用户 客户 问题 方法 结果 原因 因为 所以 但是 如果 虽然
已经 正在 非常 特别 大家 一起 以后 以前 开始 结束 继续 停止 发展 建设 生活 家庭 父母 孩子 男人 女人
先生 女士 医生 医院 银行 商店 超市 餐厅 酒店 飞机 火车 汽车 地铁 公交 道路 河流 海洋 天空 太阳 月亮
星星 天气 下雨 下雪 风景 旅游 运动 足球 篮球 游泳 跑步 吃饭 喝水 睡觉 起床 上班 下班 上学 读书 写字
说话 感觉 思考 记得 忘记 希望 梦想 幸福 快乐 悲伤 生气 害怕 担心 安全 危险 健康 疾病 治疗 环境 污染
保护 自然 动物 植物 森林 花园 水果 蔬菜 米饭 面条 鸡蛋 牛奶 咖啡 啤酒 苹果 香蕉 西瓜 汉语 英语 语言
文字 句子 词语 翻译 意思 解释 例子 练习 考试 成绩 毕业 教育 研究 发现 发明 创造 设计 计划 目标 成功
失败 努力 坚持 改变 提高 增加 减少 比较 选择 决定 同意 反对 支持 帮助 感谢 再见 你好 欢迎 请问 机器
智能 算法 模型 训练 推理 分词 索引 查询 文本 分析 检索 排序 聚合 集群 分片 节点 副本 文章 作者 读者
分布式 倒排索引 使用 进行 实现 支持 提供 包括 需要 通过 根据 主要 重要 基本 基础 功能 性能 速度 内存 存储
日本語 東京 大阪 京都 会社 仕事 学校 先生 学生 電車 電話 時間 今日 明日 昨日 天気 映画 音楽 料理
野球 漢字 言葉 世界 日本 中国 韓国 勉強 研究 技術 情報 検索 解析
东西 事情 觉得 认为 应该 能够 或者 然后 于是 不过 而且 其实 当然 突然 马上 刚才 后来 最近 将来 过去 未来
每天 每年 星期 月份 年代 世纪 分钟 小时 晚上 早上 中午 下午 上午 白天 房间 房子 大楼 建筑 工厂 农村
国家 政府 人民 群众 组织 单位 部门 领导 干部 职工 工人 农民 商人 老板 经理 同事 同学 邻居 亲戚 兄弟
姐妹 爸爸 妈妈 爷爷 奶奶 叔叔 阿姨 儿子 女儿 丈夫 妻子 身体 眼睛 耳朵 鼻子 嘴巴 头发 手指 衣服 裤子
鞋子 帽子 颜色 红色 黄色 蓝色 绿色 白色 黑色 声音 味道 感情 爱情 友谊 婚姻 家人 生命 生日 节日 春天
夏天 秋天 冬天 季节 温度 空气 阳光 地球 宇宙 粮食 面包 食物 饮料 茶叶 糖果 盐巴 酱油 醋酸 味精 厨房
卧室 客厅 阳台 花盆 桌子 椅子 沙发 床铺 柜子 抽屉 镜子 窗户 门口 楼梯 电梯 车站 机场 码头 桥梁 隧道
红绿灯 人行道 停车场 加油站 图纸 工具 机械 设备 仪器 零件 材料 钢铁 塑料 玻璃 木头 石头 泥土 沙子
价格 成本 利润 工资 奖金 税收 贷款 投资 股票 保险 合同 协议 规定 法律 法院 警察 军队 武器 战争 和平
胜利 冠军 比赛 运动员 教练 球场 观众 门票 表演 舞台 演员 导演 剧本 小说 诗歌 散文 故事 传说 神话 童话
杂志 报纸 广告 广播 电视 频道 节目 主持人 记者 编辑 出版 印刷 书店 课本 作业 笔记 铅笔 钢笔 橡皮 尺子
书包 黑板 教室 操场 宿舍 食堂 实验室 办公室 会议室 礼堂 体育馆 游泳池 公园 广场 博物馆 电影院 剧院
动物园 植物园 游乐场 名胜 古迹 风俗 习惯 礼貌 道德 精神 思想 观念 态度 性格 脾气 爱好 兴趣 特点 优点
缺点 错误 正确 真实 虚假 简单 复杂 容易 困难 方便 麻烦 干净 整齐 混乱 安静 热闹 凉快 温暖 寒冷 炎热
""".split())

# Viterbi costs: one class for all lexicon words — a 4-char word (300) then
# beats its 2-char halves (600), preserving longest-match preference while
# letting cheaper paths win on real ambiguity (the FMM upgrade).
def _merged_zh() -> dict:
    """Base words (300) + the scaled-up frequency tiers (cjk_data.py:
    tier1 280 / tier2 320 / tier3 360, common single-character words 520
    — base table wins on collision; all far below the 800/char unknown
    fallback, and a longer word still beats its parts)."""
    from .cjk_data import zh_extra

    lex = {w: _Entry(c, "WORD") for w, c in zh_extra().items()}
    lex.update({w: _Entry(300, "WORD") for w in CJK_LEXICON})
    return lex


_ZH_LEXICON: dict = _merged_zh()
_ZH_MAX_WORD = max(len(w) for w in _ZH_LEXICON)


def _zh_unknown(seg: str, i: int):
    yield 1, 800, _Entry(800, "CHAR", None, None)


def _viterbi_zh(run: str) -> list[str]:
    return [t.surface for t in _viterbi(run, _ZH_LEXICON, _ZH_MAX_WORD, _zh_unknown)]


def icu_tokenize(text: str) -> list[str]:
    """icu_tokenizer analog: script-run split per UAX#24, Han runs through
    the Viterbi word lattice, kana runs kept whole per sub-script (ICU
    breaks between hiragana and katakana), everything else through the
    standard UAX#29 tokenizer (Hangul, Latin, digits, …)."""
    from .analysis import standard_tokenize

    if not text:
        return []
    toks: list[str] = []
    other: list[str] = []  # non-CJK span accumulator

    def flush_other():
        if other:
            toks.extend(standard_tokenize("".join(other)))
            other.clear()

    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if _is_han(c):
            flush_other()
            j = i
            while j < n and _is_han(text[j]):
                j += 1
            toks.extend(_viterbi_zh(text[i:j]))
            i = j
        elif _kana_script(c):
            flush_other()
            script = _kana_script(c)
            j = i
            while j < n and _kana_script(text[j]) == script:
                j += 1
            toks.append(text[i:j])
            i = j
        else:
            other.append(c)
            i += 1
    flush_other()
    return toks


def smartcn_analyze(text: str) -> list[str]:
    """`smartcn` analyzer analog (plugins/analysis-smartcn): CJK
    segmentation + lowercase for the non-CJK spans (standard_tokenize
    already lowercases them)."""
    return icu_tokenize(text)


def icu_analyzer_analyze(text: str) -> list[str]:
    """`icu_analyzer` (plugins/analysis-icu ICU analyzer: icu_tokenizer +
    icu_normalizer folding) — segmentation plus the icu_folding filter."""
    from .analysis import TOKEN_FILTERS

    return TOKEN_FILTERS["icu_folding"](icu_tokenize(text))


# --------------------------------------------------------------------------
# Japanese dictionary-free filters (exact ports)
# --------------------------------------------------------------------------

_ITERATION_VOICING = {
    # unvoiced → voiced (dakuten) for the ゞ/ヾ repeat marks; the voiceable
    # kana sit at voiced = unvoiced + 1 in Unicode, う is the exception.
    **{chr(c): chr(c + 1) for c in
       [0x304B, 0x304D, 0x304F, 0x3051, 0x3053,   # かきくけこ
        0x3055, 0x3057, 0x3059, 0x305B, 0x305D,   # さしすせそ
        0x305F, 0x3061, 0x3064, 0x3066, 0x3068,   # たちつてと
        0x306F, 0x3072, 0x3075, 0x3078, 0x307B,   # はひふへほ
        0x30AB, 0x30AD, 0x30AF, 0x30B1, 0x30B3,   # カキクケコ
        0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,   # サシスセソ
        0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8,   # タチツテト
        0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB]},  # ハヒフヘホ
    "う": "ゔ", "ウ": "ヴ",
}
_ITERATION_UNVOICING = {v: k for k, v in _ITERATION_VOICING.items()}


_ITERATION_MARKS = frozenset("々ゝゞヽヾ")


def iteration_mark_normalize(text: str, normalize_kanji: bool = True,
                             normalize_kana: bool = True) -> str:
    """kuromoji_iteration_mark char filter
    (``JapaneseIterationMarkCharFilter``): a run of k iteration marks
    repeats the k characters preceding the run — 々 the kanji, ゝ/ヽ the
    kana, ゞ/ヾ the kana voiced (ところゞゝゝ → ところどころ); the
    ``normalize_kanji`` / ``normalize_kana`` factory flags gate each mark
    class (reference vectors in KuromojiAnalysisTests
    testIterationMarkCharFilter)."""
    if not text:
        return text
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c not in _ITERATION_MARKS:
            out.append(c)
            i += 1
            continue
        k = _run_len(text, i, lambda x: x in _ITERATION_MARKS)
        if len(out) < k:
            out.extend(text[i:i + k])  # no source block — pass through
            i += k
            continue
        block = out[-k:]
        for j in range(k):
            m, s = text[i + j], block[j]
            if m == "々":
                out.append(s if normalize_kanji and _is_han(s) else m)
            elif normalize_kana and _kana_script(s):
                if m in ("ゞ", "ヾ"):
                    out.append(_ITERATION_VOICING.get(s, s))
                else:
                    out.append(_ITERATION_UNVOICING.get(s, s))
            else:
                out.append(m)
        i += k
    return "".join(out)


def katakana_stem(token: str, minimum_length: int = 4) -> str:
    """kuromoji_stemmer (``JapaneseKatakanaStemFilter``): strip one trailing
    prolonged sound mark ー from katakana tokens of at least
    ``minimum_length`` chars (default 4, same as the reference factory)."""
    if (len(token) >= minimum_length and token.endswith("ー")
            and all(_kana_script(c) == 2 for c in token)):
        return token[:-1]
    return token


# Hepburn romanization (JapaneseReadingFormFilter use_romaji=true path).
_ROMAJI = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ゔ": "vu",
    # digraphs (youon)
    "きゃ": "kya", "きゅ": "kyu", "きょ": "kyo",
    "しゃ": "sha", "しゅ": "shu", "しょ": "sho",
    "ちゃ": "cha", "ちゅ": "chu", "ちょ": "cho",
    "にゃ": "nya", "にゅ": "nyu", "にょ": "nyo",
    "ひゃ": "hya", "ひゅ": "hyu", "ひょ": "hyo",
    "みゃ": "mya", "みゅ": "myu", "みょ": "myo",
    "りゃ": "rya", "りゅ": "ryu", "りょ": "ryo",
    "ぎゃ": "gya", "ぎゅ": "gyu", "ぎょ": "gyo",
    "じゃ": "ja", "じゅ": "ju", "じょ": "jo",
    "ぢゃ": "ja", "ぢゅ": "ju", "ぢょ": "jo",
    "びゃ": "bya", "びゅ": "byu", "びょ": "byo",
    "ぴゃ": "pya", "ぴゅ": "pyu", "ぴょ": "pyo",
    # foreign-sound digraphs (small-vowel combinations)
    "ゔぁ": "va", "ゔぃ": "vi", "ゔぇ": "ve", "ゔぉ": "vo",
    "ふぁ": "fa", "ふぃ": "fi", "ふぇ": "fe", "ふぉ": "fo",
    "てぃ": "ti", "でぃ": "di", "とぅ": "tu", "どぅ": "du",
    "うぃ": "wi", "うぇ": "we", "うぉ": "wo",
    "ちぇ": "che", "しぇ": "she", "じぇ": "je",
    "つぁ": "tsa", "つぇ": "tse", "つぉ": "tso",
    # bare small kana (after an unmatched digraph) read as their vowel
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "ゎ": "wa",
}
_VOWELS = set("aiueo")


def _kata_to_hira(c: str) -> str:
    o = ord(c)
    if 0x30A1 <= o <= 0x30F6:
        return chr(o - 0x60)
    return c


def kana_to_romaji(token: str, long_vowel: str = "double",
                   n_apostrophe: bool = False) -> str:
    """Hepburn romanization of kana: sokuon doubles the next consonant
    (っち → tchi), ー doubles the previous vowel (``long_vowel="double"``,
    the wapuro style) or is dropped (``"drop"`` — Lucene ToStringUtil's
    ascii reading, ロバート → robato); ``n_apostrophe`` inserts the
    modified-Hepburn ' after ん before vowels and y (コンヤ → kon'ya).
    Non-kana characters pass through unchanged."""
    if not token:
        return token
    hira = "".join(_kata_to_hira(c) for c in token)
    out: list[str] = []
    i, n = 0, len(hira)
    while i < n:
        c = hira[i]
        if c in ("っ", "ッ"):
            nxt = _ROMAJI.get(hira[i + 1:i + 3]) or _ROMAJI.get(hira[i + 1:i + 2])
            if nxt:
                out.append("t" if nxt[0] == "c" else nxt[0])  # っち → tchi
            elif i + 1 >= n or not _kana_script(token[i + 1]):
                # trailing/pre-foreign sokuon doubles the following letter
                # (kuromoji_completion: サッk → sakk)
                nxt_raw = hira[i + 1] if i + 1 < n else ""
                if nxt_raw:
                    out.append(nxt_raw)
            i += 1
            continue
        if c == "ー":
            if long_vowel == "double":
                prev = out[-1] if out else ""
                if prev and prev[-1] in _VOWELS:
                    out.append(prev[-1])
            elif long_vowel == "keep":
                out.append("ー")  # completion romaji keeps it (soーsu)
            i += 1
            continue
        two = _ROMAJI.get(hira[i:i + 2])
        if two is not None:
            r = two
            i += 2
        else:
            r = _ROMAJI.get(c, c)
            i += 1
        if (n_apostrophe and out and out[-1].endswith("n") and r
                and r[0] in "aiueoy" and _ROMAJI.get(c) is not None):
            out.append("'")
        out.append(r)
    return "".join(out)


def reading_to_romaji(reading: str) -> str:
    """The readingform use_romaji romanization (Lucene ToStringUtil ascii
    form pinned by the reference vectors): ー dropped, n' before vowels/y."""
    return kana_to_romaji(reading, long_vowel="drop", n_apostrophe=True)


def kuromoji_completion(text: str, mode: str = "index") -> list[str]:
    """kuromoji_completion filter + analyzer
    (``JapaneseCompletionFilter``/``JapaneseCompletionAnalyzer``): each
    token emits its surface AND the wapuro-style romaji of its reading
    (東京 → 東京, toukyou; ー kept literally: ソース → soーsu — the
    reference vectors in testCompletionFilterFactory/testCompletionAnalyzer).
    ``mode="query"``: trailing tokens concatenate into ONE prefix unit
    (ｿｰｽｺｰﾄﾞ → ソースコード, soーsukoーdo; サッk → サッk, sakk)."""
    import unicodedata

    from .analysis import TOKEN_FILTERS

    # width-fold halfwidth kana then NFC-compose the voiced marks the
    # fold leaves combining (ﾄﾞ → ト+゙ → ド)
    norm = text
    if text:
        norm = unicodedata.normalize("NFC", TOKEN_FILTERS["cjk_width"]([text])[0])
    toks = [t.surface for t in kuromoji_tokenize_rich(norm)]
    return completion_emit(toks, mode)


def completion_emit(toks: list[str], mode: str = "index") -> list[str]:
    """The JapaneseCompletionFilter emit step shared by the analyzer path
    above and the token-filter registration (analysis.py): surface +
    wapuro romaji per token, or one concatenated prefix unit in query
    mode."""
    if not toks:
        return []

    def romaji(surface: str) -> str:
        return kana_to_romaji(ja_reading(surface), long_vowel="keep")

    if mode == "query":
        whole = "".join(toks)
        r = romaji(whole)
        return [whole, r] if r != whole else [whole]
    out: list[str] = []
    for t in toks:
        out.append(t)
        r = romaji(t)
        if r != t:
            out.append(r)
    return out


_JA_DIGITS = {"〇": 0, "零": 0, "一": 1, "二": 2, "三": 3, "四": 4,
              "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_JA_UNITS = {"十": 10, "百": 100, "千": 1000}
_JA_BIG = {"万": 10 ** 4, "億": 10 ** 8, "兆": 10 ** 12}

_KO_DIGITS = {"영": 0, "공": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
              "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9}
_KO_UNITS = {"십": 10, "백": 100, "천": 1000}
_KO_BIG = {"만": 10 ** 4, "억": 10 ** 8, "조": 10 ** 12}


def _numeral_value(token: str, digits: dict, units: dict, big: dict) -> int | None:
    """Positional CJK numeral parse (JapaneseNumberFilter /
    KoreanNumberFilter shape): section-accumulate over 十/百/千 with 万/億
    section breaks; arabic digit runs mix in (``3千`` → 3000). Returns None
    when the token is not a pure numeral."""
    if not token:
        return None
    total = 0       # completed 万/億 sections
    section = 0     # current section below the next big unit
    num = 0         # digits pending a unit
    i, n = 0, len(token)
    saw = False
    while i < n:
        c = token[i]
        if "0" <= c <= "9":  # ASCII only — '²'.isdigit() is True but not int()-able
            j = i
            while j < n and "0" <= token[j] <= "9":
                j += 1
            num = num * (10 ** (j - i)) + int(token[i:j])
            i = j
            saw = True
            continue
        if c in digits:
            num = num * 10 + digits[c]
            saw = True
        elif c in units:
            section += (num if num else 1) * units[c]
            num = 0
            saw = True
        elif c in big:
            total += (section + num if (section + num) else 1) * big[c]
            section = 0
            num = 0
            saw = True
        else:
            return None
        i += 1
    if not saw:
        return None
    return total + section + num


def ja_normalize_number(token: str) -> str:
    """kuromoji_number (``JapaneseNumberFilter``): kanji numerals →
    arabic; non-numeral tokens unchanged."""
    v = _numeral_value(token, _JA_DIGITS, _JA_UNITS, _JA_BIG)
    return str(v) if v is not None else token


def ko_normalize_number(token: str) -> str:
    """nori_number (``KoreanNumberFilter``): sino-Korean numerals →
    arabic; non-numeral tokens unchanged."""
    v = _numeral_value(token, _KO_DIGITS, _KO_UNITS, _KO_BIG)
    return str(v) if v is not None else token


# --------------------------------------------------------------------------
# Korean — nori analog (plugins/analysis-nori)
# --------------------------------------------------------------------------
# mecab-ko-dic POS tags (subset): NNG general noun, NNP proper noun, NNB
# bound noun, NP pronoun, NR native numeral, SN arabic number, VV verb,
# VA adjective, J particles (josa), E endings, XSV/XSN/XSA suffixes, MAG
# adverb, MM determiner, SH hanja, SL foreign, SP/SF/SC punctuation.

_KO_TABLE = """
가 J - -
이 J - -
은 J - -
는 J - -
을 J - -
를 J - -
에 J - -
의 J - -
와 J - -
과 J - -
도 J - -
만 J - -
로 J - -
으로 J - -
에서 J - -
에게 J - -
께서 J - -
부터 J - -
까지 J - -
보다 J - -
처럼 J - -
마다 J - -
조차 J - -
마저 J - -
밖에 J - -
이나 J - -
라고 J - -
하고 J - -
다 E - -
요 E - -
죠 E - -
며 E - -
면 E - -
고 E - -
지만 E - -
습니다 E - -
는다 E - -
ㄴ다 E - -
았다 E - -
었다 E - -
겠다 E - -
하다 XSV - -
한다 XSV - -
했다 XSV - -
합니다 XSV - -
하는 XSV - -
스럽다 XSA - -
짜리 XSN - -
들 XSN - -
아버지 NNG - -
어머니 NNG - -
학교 NNG - -
학생 NNG - -
선생 NNG - -
서울 NNP - -
부산 NNP - -
세종 NNP - -
기차 NNG - -
자동차 NNG - -
사과 NNG - -
포도 NNG - -
바나나 NNG - -
나무 NNG - -
뿌리 NNG - -
검색 NNG - -
엔진 NNG - -
색인 NNG - -
역색인 NNG - -
사용 NNG - -
오늘 NNG - -
내일 NNG - -
어제 NNG - -
와인 NNG - -
구입 NNG - -
용 NNG - -
시 NNB - -
개 NNB - -
원 NNB - -
명 NNB - -
번 NNB - -
것 NNB - -
수 NNB - -
여섯 NR - -
하나 NR - -
다섯 NR - -
일곱 NR - -
여덟 NR - -
아홉 NR - -
한국 NNP - -
한국어 NNG - -
일본 NNP - -
일본어 NNG - -
중국 NNP - -
영어 NNG - -
언어 NNG - -
공부 NNG - -
공백 NNG - -
구분 NNG - -
사람 NNG - -
시간 NNG - -
세계 NNG - -
나라 NNG - -
도시 NNG - -
집 NNG - -
물 NNG - -
불 NNG - -
산 NNG - -
강 NNG - -
바다 NNG - -
하늘 NNG - -
바람 NNG - -
비 NNG - -
눈 NNG - -
꽃 NNG - -
밥 NNG - -
책 NNG - -
문 NNG - -
길 NNG - -
말 NNG - -
글 NNG - -
이름 NNG - -
친구 NNG - -
가족 NNG - -
회사 NNG - -
일 NNG - -
돈 NNG - -
음악 NNG - -
영화 NNG - -
음식 NNG - -
요리 NNG - -
여행 NNG - -
사진 NNG - -
전화 NNG - -
컴퓨터 NNG - -
인터넷 NNG - -
프로그램 NNG - -
데이터 NNG - -
정보 NNG - -
기술 NNG - -
과학 NNG - -
문화 NNG - -
역사 NNG - -
경제 NNG - -
정치 NNG - -
사회 NNG - -
문제 NNG - -
질문 NNG - -
대답 NNG - -
방법 NNG - -
결과 NNG - -
이유 NNG - -
생각 NNG - -
마음 NNG - -
기분 NNG - -
사랑 NNG - -
행복 NNG - -
건강 NNG - -
병원 NNG - -
은행 NNG - -
시장 NNG - -
가게 NNG - -
식당 NNG - -
갔다 VV - -
간다 VV - -
왔다 VV - -
온다 VV - -
샀다 VV - -
산다 VV - -
먹다 VV - -
먹는다 VV - -
본다 VV - -
봤다 VV - -
있다 VV - -
없다 VV - -
받다 VV - -
주다 VV - -
만나다 VV - -
읽다 VV - -
쓰다 VV - -
듣다 VV - -
깊 VA - -
높 VA - -
좋 VA - -
크 VA - -
작 VA - -
많 VA - -
적 VA - -
짧 VA - -
빠르 VA - -
아름답 VA - -
약국 NNG - -
경찰 NNG - -
소방서 NNG - -
정부 NNG - -
선거 NNG - -
법률 NNG - -
재판 NNG - -
계약 NNG - -
회계 NNG - -
월급 NNG - -
저금 NNG - -
보험 NNG - -
주식 NNG - -
무역 NNG - -
수출 NNG - -
수입 NNG - -
공장 NNG - -
기계 NNG - -
설비 NNG - -
재료 NNG - -
제품 NNG - -
품질 NNG - -
가격 NNG - -
판매 NNG - -
광고 NNG - -
방송 NNG - -
기사 NNG - -
출판 NNG - -
소설 NNG - -
이야기 NNG - -
무대 NNG - -
배우 NNG - -
감독 NNG - -
관객 NNG - -
우표 NNG - -
편지 NNG - -
짐 NNG - -
공항 NNG - -
호텔 NNG - -
거리 NNG - -
동네 NNG - -
마을 NNG - -
지역 NNG - -
주소 NNG - -
번호 NNG - -
지도 NNG - -
사전 NNG - -
단어 NNG - -
문장 NNG - -
문법 NNG - -
발음 NNG - -
번역 NNG - -
의미 NNG - -
"""

# compound nouns with decompound splits (the nori decompound_mode surface)
_KO_COMPOUNDS = {
    "가늠표": ("가늠", "표"),
}

# hanja → hangul readings (nori_readingform; per-character table)
_HANJA_READING = {
    "鄕": "향", "歌": "가", "一": "일", "二": "이", "三": "삼", "四": "사",
    "五": "오", "六": "육", "七": "칠", "八": "팔", "九": "구", "十": "십",
    "百": "백", "千": "천", "萬": "만", "人": "인", "大": "대", "小": "소",
    "中": "중", "國": "국", "韓": "한", "學": "학", "校": "교", "生": "생",
    "先": "선", "金": "금", "山": "산", "水": "수", "火": "화", "木": "목",
    "土": "토", "日": "일", "月": "월", "年": "년", "時": "시", "分": "분",
    "世": "세", "界": "계", "東": "동", "西": "서", "南": "남", "北": "북",
    "王": "왕", "女": "녀", "男": "남", "子": "자", "文": "문", "字": "자",
    "語": "어", "話": "화", "電": "전", "車": "차", "道": "도", "市": "시",
    "民": "민", "主": "주", "食": "식", "家": "가", "門": "문", "名": "명",
    "天": "천", "地": "지", "靑": "청", "白": "백", "黑": "흑", "紅": "홍",
    "花": "화", "草": "초", "江": "강", "海": "해", "風": "풍", "雨": "우",
    "雪": "설", "春": "춘", "夏": "하", "秋": "추", "冬": "동", "愛": "애",
    "心": "심", "力": "력", "手": "수", "足": "족", "口": "구", "目": "목",
    "耳": "이", "身": "신", "體": "체", "高": "고", "長": "장", "短": "단",
    "新": "신", "古": "고", "美": "미", "善": "선", "行": "행", "來": "래",
    "去": "거", "出": "출", "入": "입", "書": "서", "讀": "독", "言": "언",
}


def _parse_ko_table() -> dict:
    cost_of = {"J": 50, "E": 60, "XSV": 150, "XSN": 150, "XSA": 150,
               "VV": 280, "VA": 280, "NR": 280, "NNB": 200, "MM": 150,
               "MAG": 200}
    lex: dict = {}
    for line in _KO_TABLE.strip().splitlines():
        surface, pos, reading, base = line.split()
        lex[surface] = _Entry(cost_of.get(pos, 300), pos)
    for comp, splits in _KO_COMPOUNDS.items():
        lex[comp] = _Entry(290, "NNG", None, None, splits)
    return lex


def _ko_extension() -> dict:
    """Scaled-up Korean lexicon (cjk_data.py): common nouns, verb stems
    with the mecab-ko-dic-style fused contractions (갔/했/마셨 …), extra
    endings. Costs above the base classes; base table wins collisions."""
    from .cjk_data import expand_ko

    # single-syllable extension endings cost 180 so two of them can
    # never beat a real two-syllable noun (340) mid-word — the unigram
    # lattice has no connection matrix, so cost classes carry that role
    def cost(surface, pos):
        if pos == "E":
            return 180 if len(surface) == 1 else 120
        if pos in ("VV", "VA"):
            # multi-syllable stems must undercut a base-table
            # particle+suffix misparse of their first syllables
            # (만+들 J+XSN = 200 < a flat 290): 만들+어 must win
            return 290 if len(surface) == 1 else 180
        return {"J": 90, "MAG": 250, "MM": 200}.get(pos, 340)

    return {s: _Entry(cost(s, p), p) for s, p in expand_ko()}


def _merged_ko() -> dict:
    lex = _ko_extension()
    lex.update(_parse_ko_table())
    return lex


KO_LEXICON: dict = _merged_ko()
_KO_MAX_WORD = max(len(w) for w in KO_LEXICON)

# KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS (Lucene)
DEFAULT_KO_STOPTAGS = ("E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC",
                       "SSO", "SC", "SE", "XPN", "XSA", "XSN", "XSV",
                       "UNA", "NA", "VSV")


def _ko_unknown(seg: str, i: int):
    """nori UnknownDictionary analog: sino-numeral runs, hanja runs (with
    per-char readings), hangul runs + single-char fallback, Latin runs."""
    c = seg[i]
    if c in _KO_NUM_CHARS:
        ln = _run_len(seg, i, lambda x: x in _KO_NUM_CHARS)
        yield ln, 480, _Entry(480, "SN" if seg[i].isascii() else "NR",
                              None, None)
        return
    if _is_hangul(c):
        ln = _run_len(seg, i, _is_hangul)
        yield ln, 800, _Entry(800, "NNG", None, None)
        if ln > 1:
            yield 1, 900, _Entry(900, "NNG", None, None)
        return
    if _is_han(c):
        ln = _run_len(seg, i, _is_han)
        reading = "".join(_HANJA_READING.get(ch, ch) for ch in seg[i:i + ln])
        yield ln, 700, _Entry(700, "SH", reading, None)
        return
    if _kana_script(c):
        ln = _run_len(seg, i, lambda x: _kana_script(x) != 0)
        yield ln, 700, _Entry(700, "SL", None, None)
        return
    if c.isalnum():
        ln = _run_len(seg, i, lambda x: x.isalnum() and x.isascii())
        yield max(ln, 1), 280, _Entry(280, "SL", None, None)
        return
    yield 1, 30, _Entry(30, "SP", None, None)


def _ko_user_lexicon(user_rules) -> dict:
    """nori ``user_dictionary_rules``: "surface" or "surface seg1 seg2 ..."
    (KoreanTokenizer UserDictionary). User entries cost 10."""
    lex = dict(KO_LEXICON)
    for rule in user_rules or ():
        parts = str(rule).split()
        surface = parts[0]
        splits = tuple(parts[1:]) if len(parts) > 2 else ()
        lex[surface] = _Entry(10, "NNG", None, None, splits)
    return lex


def nori_tokenize_rich(text: str, user_rules=None,
                       decompound_mode: str = "discard",
                       discard_punctuation: bool = True) -> list[Token]:
    """nori_tokenizer analog: the Korean lattice with nori's decompound
    modes — ``none`` keeps compounds whole, ``discard`` (default) replaces
    them with their parts, ``mixed`` emits the compound then its parts."""
    lex = _ko_user_lexicon(user_rules) if user_rules else KO_LEXICON
    mw = max(_KO_MAX_WORD, max((len(w) for w in lex), default=1))
    toks = _lattice_tokens(text, lex, mw, _ko_unknown)
    out: list[Token] = []
    for t in toks:
        if discard_punctuation and t.punct:
            continue
        if t.splits and decompound_mode in ("discard", "mixed"):
            if decompound_mode == "mixed":
                out.append(t)
            for s in t.splits:
                e = lex.get(s) or KO_LEXICON.get(s) or _Entry(0, "NNG")
                out.append(Token(s, e.pos, e.reading, e.base, (), False, True))
        else:
            out.append(t)
    return out


def nori_tokenize(text: str, user_rules=None,
                  decompound_mode: str = "discard") -> list[str]:
    if not text:
        return []
    return [t.surface for t in
            nori_tokenize_rich(text, user_rules, decompound_mode)]


def ko_lookup(token: str) -> _Entry:
    """POS for a surface form (primary lexicon entry; unknowns classify by
    leading character like the lattice)."""
    e = KO_LEXICON.get(token)
    if e is not None:
        return e
    if token and all(ch in _KO_NUM_CHARS for ch in token):
        return _Entry(0, "SN" if token[0].isascii() else "NR")
    if token and _is_han(token[0]):
        reading = "".join(_HANJA_READING.get(ch, ch) for ch in token)
        return _Entry(0, "SH", reading)
    return _Entry(0, "NNG")


# dictionary-light josa-strip fallback for UNKNOWN hangul tokens (a noun
# the lexicon lacks, glued to its particle): multi-char particles plus the
# single-char set that cannot end a bare noun. Ambiguous codas (과/도/나 —
# real noun endings: 사과, 포도) are NOT stripped; known lexicon paths never
# reach this fallback (the lattice already split their josa off).
_KO_PARTICLES_MULTI = (
    "에서부터", "으로부터", "에게서", "으로서", "으로써", "이라도", "이라는",
    "이라고", "인데도", "까지", "부터", "에서", "에게", "께서", "으로", "이나",
    "이란", "라고", "라는", "보다", "처럼", "하고", "든지", "마다", "조차",
    "마저", "밖에", "이며", "이든",
)
_KO_PARTICLES_SINGLE = ("은", "는", "을", "를", "이", "가", "에", "의")


def _strip_josa(word: str) -> str:
    for p in _KO_PARTICLES_MULTI:
        if word.endswith(p) and len(word) > len(p):
            return word[: -len(p)]
    for p in _KO_PARTICLES_SINGLE:
        if word.endswith(p) and len(word) > 1:
            return word[:-1]
    return word


def nori_analyze(text: str, user_rules=None) -> list[str]:
    """The ``nori`` analyzer preset = Lucene KoreanAnalyzer chain:
    tokenizer (decompound=discard) → part-of-speech stop (default stop
    tags) → readingform (hanja → hangul) → lowercase. Unknown hangul
    tokens additionally get the documented josa-strip fallback — the
    coverage patch for nouns outside the embedded lexicon."""
    out: list[str] = []
    for t in nori_tokenize_rich(text, user_rules, decompound_mode="discard"):
        if pos_matches(t.pos, DEFAULT_KO_STOPTAGS):
            continue
        s = t.surface
        if t.pos == "SH" and t.reading:
            s = t.reading                      # KoreanReadingFormFilter
        elif not t.known and s and _is_hangul(s[0]):
            s = _strip_josa(s)
        if s:
            out.append(s.lower())
    return out
