"""Round-5 CJK dictionary-coverage gate: the scaled-up embedded lexicons
(functions/cjk_data.py) must resolve >=80% of Han/kana/hangul tokens on
held-out web-style text from the DICTIONARY (Token.known), not the
unknown-word char-class rules — the coverage analog of kuromoji's
MeCab-IPADIC / nori's mecab-ko-dic / smartcn's embedded dictionary
(KuromojiTokenizerFactory.java, NoriTokenizerFactory.java:47)."""

from __future__ import annotations

from elasticsearch_spark.functions.cjk import (
    _ZH_LEXICON, _ZH_MAX_WORD, _is_han, _is_hangul, _kana_script,
    _viterbi, _zh_unknown, JA_LEXICON, KO_LEXICON,
    kuromoji_tokenize_rich, nori_tokenize_rich)

JA_TEXT = """
政府は新しい経済政策を発表しました。専門家によると、この政策は中小企業の支援を目的としています。
銀行の金利が上がると、住宅ローンの返済額も増えるため、多くの家庭に影響が出ると考えられます。
大学で情報科学を勉強している学生たちは、卒業後の就職について不安を感じています。
地元の祭りには毎年たくさんの人が集まります。子供たちは浴衣を着て、屋台で焼きそばやかき氷を買って楽しみます。
電車が遅れたので、会社に遅刻してしまいました。駅のホームは通勤客でいっぱいでした。
料理教室で先生に魚の焼き方を習いました。新鮮な野菜を使ったサラダも作りました。
図書館で歴史の本を借りて、週末にゆっくり読むつもりです。
"""

ZH_TEXT = """
今年夏天气温特别高，很多城市都发布了高温警报。医生提醒大家多喝水，避免长时间在阳光下活动。
我弟弟去年考上了大学，学的是计算机专业。他每天都要写程序，做实验，生活很充实。
这家餐厅的菜味道不错，价格也不贵，所以生意特别好，周末经常要排队等位。
公司最近招聘了几名新员工，人事部门正在组织培训。新同事们对工作环境很满意。
火车站前面新建了一个大型购物中心，里面有电影院、书店和各种商店，吸引了很多年轻人。
农民们正在田里收割水稻，今年的收成比去年好，大家都很高兴。
科学家们发现了一种新的治疗方法，可以帮助病人更快地恢复健康。
"""

KO_TEXT = """
정부가 새 경제 정책을 발표했습니다. 전문가들은 이 정책이 중소기업 지원에 도움이 된다고 말했습니다.
은행 금리가 오르면 가계 부담이 커지기 때문에 많은 사람들이 걱정하고 있습니다.
대학에서 공부하는 학생들은 졸업 후 취업 문제로 고민이 많습니다.
지난 주말에 시장에 가서 과일과 채소를 샀습니다. 사과가 싸고 맛있어서 많이 샀습니다.
기차가 늦게 와서 회사에 지각했습니다. 역에는 사람이 정말 많았습니다.
도서관에서 역사 책을 빌려서 주말에 읽을 생각입니다.
"""


def _rate(known: int, total: int) -> float:
    assert total > 50, f"sample too small: {total}"
    return known / total


def test_lexicon_sizes():
    # honest entry counts of the merged lexicons (base + cjk_data
    # extension); document-level floor so regressions are caught
    assert len(JA_LEXICON) >= 9000
    assert len(KO_LEXICON) >= 3500
    assert len(_ZH_LEXICON) >= 10000


def test_ja_oov_rate():
    toks = [t for t in kuromoji_tokenize_rich(JA_TEXT)
            if any(_is_han(c) or _kana_script(c) for c in t.surface)]
    r = _rate(sum(t.known for t in toks), len(toks))
    assert r >= 0.80, (r, [t.surface for t in toks if not t.known])


def test_zh_oov_rate():
    known = total = 0
    unk = []
    for line in ZH_TEXT.split():
        seg = "".join(c for c in line if _is_han(c))
        if not seg:
            continue
        for t in _viterbi(seg, _ZH_LEXICON, _ZH_MAX_WORD, _zh_unknown):
            total += 1
            known += t.known
            if not t.known:
                unk.append(t.surface)
    r = _rate(known, total)
    assert r >= 0.80, (r, unk)


def test_ko_oov_rate():
    toks = [t for t in nori_tokenize_rich(KO_TEXT)
            if any(_is_hangul(c) or _is_han(c) for c in t.surface)]
    r = _rate(sum(t.known for t in toks), len(toks))
    assert r >= 0.80, (r, [t.surface for t in toks if not t.known])


def test_extension_never_changes_pinned_paths():
    # the base table overwrites extension entries, so reference-vector
    # segmentations stay byte-identical (spot checks; the full pinned
    # suite is tests/test_cjk_reference_vectors.py)
    from elasticsearch_spark.functions.cjk import kuromoji_tokenize, nori_tokenize

    assert kuromoji_tokenize("私は制限スピードを超える。") == [
        "私", "は", "制限", "スピード", "を", "超える"]
    assert nori_tokenize("뿌리가 깊은 나무") == ["뿌리", "가", "깊", "은", "나무"]


# ---- second register: news/formal text (added after probe cycles) ----------

JA_NEWS = """
半導体の需要が世界的に高まり、国内でも工場の新設が相次いでいます。政府は補助金で企業を後押しする構えです。
人工知能の発達により、翻訳や文章作成の精度が飛躍的に向上しました。一方で雇用への影響を懸念する声も上がっています。
再生可能エネルギーの導入が進む中、送電網の整備が課題となっています。電力会社は蓄電池の活用を検討しています。
サイバー攻撃による情報漏洩が相次ぎ、企業はセキュリティ対策の強化を迫られています。
"""

ZH_NEWS = """
芯片需求旺盛，各地纷纷新建晶圆厂。政府出台补贴政策，扶持半导体产业发展。
人工智能技术突飞猛进，机器翻译和文本生成的准确率大幅提升，但也引发了对就业的担忧。
随着可再生能源装机容量增加，电网改造成为当务之急。电力公司正在研究储能电池的应用方案。
网络攻击导致的数据泄露事件频发，企业不得不加大网络安全投入。
"""

KO_NEWS = """
반도체 수요가 급증하면서 국내에서도 공장 신설이 잇따르고 있습니다. 정부는 보조금으로 기업을 지원할 방침입니다.
인공지능의 발달로 번역과 글쓰기의 정확도가 크게 높아졌습니다. 한편 일자리에 미칠 영향을 걱정하는 목소리도 나옵니다.
재생에너지 도입이 확대되면서 송전망 정비가 과제로 떠올랐습니다. 전력회사는 배터리 활용을 검토하고 있습니다.
사이버 공격으로 인한 정보 유출이 잇따라 기업들은 보안 강화에 나서고 있습니다.
"""


def test_ja_news_register_oov_rate():
    toks = [t for t in kuromoji_tokenize_rich(JA_NEWS)
            if any(_is_han(c) or _kana_script(c) for c in t.surface)]
    r = _rate(sum(t.known for t in toks), len(toks))
    assert r >= 0.80, (r, [t.surface for t in toks if not t.known])


def test_zh_news_register_oov_rate():
    known = total = 0
    unk = []
    for line in ZH_NEWS.split():
        seg = "".join(c for c in line if _is_han(c))
        if not seg:
            continue
        for t in _viterbi(seg, _ZH_LEXICON, _ZH_MAX_WORD, _zh_unknown):
            total += 1
            known += t.known
            if not t.known:
                unk.append(t.surface)
    r = _rate(known, total)
    assert r >= 0.80, (r, unk)


def test_ko_news_register_oov_rate():
    toks = [t for t in nori_tokenize_rich(KO_NEWS)
            if any(_is_hangul(c) or _is_han(c) for c in t.surface)]
    r = _rate(sum(t.known for t in toks), len(toks))
    assert r >= 0.80, (r, [t.surface for t in toks if not t.known])
