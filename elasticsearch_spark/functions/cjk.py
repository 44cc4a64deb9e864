"""Dictionary-light CJK segmentation: the ``icu_tokenizer`` analog.

The reference ships CJK tokenization as plugins —
``plugins/analysis-icu/.../IcuTokenizerFactory.java`` (ICU BreakIterator
with a dictionary for Han/Hiragana), ``plugins/analysis-smartcn/`` (HMM
Chinese), ``plugins/analysis-kuromoji/`` (Japanese lattice),
``plugins/analysis-nori/`` (Korean). Those engines embed multi-megabyte
dictionaries; this module implements the same SHAPE with a
dictionary-light method (the documented subset): script-run splitting per
UAX#24, then forward-maximum-matching over an embedded frequent-word
lexicon for Han runs with unigram fallback — the classic FMM segmenter
smartcn's predecessors used — kana runs kept whole, Hangul through the
standard UAX#29 path (Korean is space-delimited), and every non-CJK span
delegated to the standard analyzer's UAX#29 tokenizer.

Deterministic by construction (fixed embedded lexicon, longest-match-wins,
left-to-right) — the ``analysis_cjk`` oracle entry pins segmentations
against an expected-table in SQL.
"""

from __future__ import annotations

__all__ = [
    "icu_tokenize", "smartcn_analyze", "icu_analyzer_analyze", "CJK_LEXICON",
    "kuromoji_tokenize", "kuromoji_analyze", "nori_tokenize", "nori_analyze",
    "kana_to_romaji", "ja_normalize_number", "ko_normalize_number",
    "iteration_mark_normalize", "katakana_stem",
]

# Frequent multi-character CJK words (simplified Chinese + common Japanese
# kanji compounds). FMM scans longest-first, so 4-char entries beat their
# 2-char prefixes (人工智能 segments whole, not 人工+智能).
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
""".split())

_MAX_WORD = max(len(w) for w in CJK_LEXICON)


def _is_han(c: str) -> bool:
    o = ord(c)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2A6DF)


def _kana_script(c: str) -> int:
    """0 = not kana, 1 = hiragana, 2 = katakana (ー extends either)."""
    o = ord(c)
    if 0x3040 <= o <= 0x309F:
        return 1
    if 0x30A0 <= o <= 0x30FF or o == 0xFF70:
        return 2
    return 0


def _fmm(run: str) -> list[str]:
    """Forward maximum matching over the embedded lexicon; unmatched
    characters fall back to unigrams (ICU's dictionary BreakIterator shape:
    longest dictionary word wins, single CJK char otherwise)."""
    out = []
    i, n = 0, len(run)
    while i < n:
        for ln in range(min(_MAX_WORD, n - i), 1, -1):
            if run[i:i + ln] in CJK_LEXICON:
                out.append(run[i:i + ln])
                i += ln
                break
        else:
            out.append(run[i])
            i += 1
    return out


def icu_tokenize(text: str) -> list[str]:
    """icu_tokenizer analog: script-run split, Han runs through FMM, kana
    runs whole, everything else through the standard UAX#29 tokenizer
    (which handles Hangul, Latin, digits, …)."""
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
            toks.extend(_fmm(text[i:j]))
            i = j
        elif _kana_script(c):
            # hiragana and katakana are distinct scripts — ICU breaks
            # between them (タワーへ → タワー + へ)
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


# ---------------------------------------------------------------------------
# Japanese — kuromoji analog (plugins/analysis-kuromoji)
# ---------------------------------------------------------------------------
# The reference's kuromoji is a Viterbi lattice over the MeCab-IPADIC
# dictionary (plugins/analysis-kuromoji/.../KuromojiTokenizerFactory.java).
# That dictionary is ~12 MB; this is the documented dictionary-light subset:
# the same script-run segmentation as icu_tokenize (Han via FMM, kana runs
# by sub-script, katakana compounds split on the nakaguro middle dot the way
# the lattice splits loanword compounds), plus faithful ports of the
# DICTIONARY-FREE filters, which ARE exact:
#   kuromoji_iteration_mark (char filter: 々 ゝ ゞ ヽ ヾ expansion)
#   kuromoji_stemmer        (katakana prolonged-sound-mark stemming)
#   kuromoji_readingform    (use_romaji=true Hepburn romanization)
#   kuromoji_number         (kanji-numeral → arabic, mixed forms)
#   ja_stop                 (the Lucene Japanese stopword set)
# kuromoji_baseform / kuromoji_part_of_speech require the lattice POS
# dictionary and are out of the documented subset (requests for them raise
# in the analyzer config path like other unknown filters).

# Lucene stopwords_ja.txt (public Apache Lucene resource) — the `ja_stop`
# filter's default set.
JA_STOPWORDS: frozenset[str] = frozenset("""
の に は を た が で て と し れ さ ある いる も する から な こと として い や れる など なっ ない この ため その あっ よう また もの
という あり まで られ なる へ か だ これ によって により おり より による ず なり られる において ば なかっ なく しかし について せ
だっ その後 できる それ う ので なお のみ でき き つ における および いう さらに でも ら たり その他 に関する たち ます ん なら
に対して 特に せる 及び これら とき では にて ほか ながら うち そして とともに ただし かつて それぞれ または お ほど ものの
に対する ほとんど と共に といった です とも ところ ここ
""".split())

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
        0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB]}, # ハヒフヘホ
    "う": "ゔ", "ウ": "ヴ",
}
_ITERATION_UNVOICING = {v: k for k, v in _ITERATION_VOICING.items()}


def iteration_mark_normalize(text: str) -> str:
    """kuromoji_iteration_mark char filter
    (``JapaneseIterationMarkCharFilter``): 々 repeats the previous kanji,
    ゝ/ヽ the previous kana, ゞ/ヾ the previous kana voiced."""
    if not text:
        return text
    out = []
    for c in text:
        prev = out[-1] if out else ""
        if c == "々" and prev and _is_han(prev):
            out.append(prev)
        elif c in ("ゝ", "ヽ") and prev and _kana_script(prev):
            out.append(_ITERATION_UNVOICING.get(prev, prev))
        elif c in ("ゞ", "ヾ") and prev and _kana_script(prev):
            out.append(_ITERATION_VOICING.get(prev, prev))
        else:
            out.append(c)
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


def kana_to_romaji(token: str) -> str:
    """kuromoji_readingform (use_romaji=true) analog: Hepburn romanization
    of kana tokens — sokuon doubles the next consonant (っち → tchi per
    Hepburn), ー doubles the previous vowel, ん before b/m/p stays n
    (modified Hepburn). Non-kana characters pass through unchanged."""
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
            i += 1
            continue
        if c == "ー":
            prev = out[-1] if out else ""
            if prev and prev[-1] in _VOWELS:
                out.append(prev[-1])
            i += 1
            continue
        two = _ROMAJI.get(hira[i:i + 2])
        if two:
            out.append(two)
            i += 2
            continue
        out.append(_ROMAJI.get(c, c))
        i += 1
    return "".join(out)


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


def kuromoji_tokenize(text: str) -> list[str]:
    """kuromoji_tokenizer analog: iteration-mark expansion, then the
    script-run segmentation with the Japanese refinement that katakana
    compounds split on the nakaguro middle dot ・ (the lattice splits
    loanword compounds there)."""
    if not text:
        return []
    text = iteration_mark_normalize(text).replace("・", " ").replace("･", " ")
    return icu_tokenize(text)


def kuromoji_analyze(text: str) -> list[str]:
    """``kuromoji`` analyzer preset (dictionary-light chain documented
    above): kuromoji_tokenizer → cjk_width → ja_stop → kuromoji_stemmer →
    lowercase (standard_tokenize already lowercases the non-CJK spans)."""
    from .analysis import TOKEN_FILTERS

    toks = TOKEN_FILTERS["cjk_width"](kuromoji_tokenize(text))
    return [katakana_stem(t) for t in toks if t not in JA_STOPWORDS]


# ---------------------------------------------------------------------------
# Korean — nori analog (plugins/analysis-nori)
# ---------------------------------------------------------------------------
# nori is a Viterbi lattice over mecab-ko-dic; its default analyzer chain
# removes particles/endings by POS tag (KoreanPartOfSpeechStopFilter's
# default stop tags are J* josa, E* endings, punctuation). Dictionary-light
# analog: Korean is space-delimited, so Hangul words come out of UAX#29
# whole; the particle strip removes one UNAMBIGUOUS trailing josa — the
# multi-character particles plus the single-character set that cannot end a
# bare noun in the nominative/accusative paradigm (은 는 을 를 이 가 에 의).
# Ambiguous single-char codas like 과/도/나 (real noun endings: 사과, 포도)
# are deliberately NOT stripped — documented divergence from the
# POS-dictionary behavior.

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


def _is_hangul(c: str) -> bool:
    o = ord(c)
    return 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF or 0x3130 <= o <= 0x318F


def nori_tokenize(text: str) -> list[str]:
    """nori_tokenizer analog: UAX#29 word split (Korean is space-delimited;
    Han spans inside go through the FMM path via icu_tokenize), keeping
    Hangul words whole."""
    return icu_tokenize(text)


def nori_analyze(text: str) -> list[str]:
    """``nori`` analyzer preset: nori_tokenizer →
    nori_part_of_speech (dictionary-light josa strip, above) → lowercase."""
    out = []
    for t in nori_tokenize(text):
        if t and _is_hangul(t[0]):
            t = _strip_josa(t)
        if t:
            out.append(t)
    return out
