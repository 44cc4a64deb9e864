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

__all__ = ["icu_tokenize", "smartcn_analyze", "icu_analyzer_analyze", "CJK_LEXICON"]

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
