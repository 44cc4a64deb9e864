"""Exact Snowball stemmers: german(2), french, spanish, italian,
portuguese, dutch, russian.

The reference wires these through
``modules/analysis-common/src/main/java/org/elasticsearch/analysis/common/
SnowballTokenFilterFactory.java`` (language name → Lucene SnowballFilter)
and ``StemmerTokenFilterFactory.java`` (e.g. ``"german"`` → snowball
GermanStemmer, ``"light_german"`` → GermanLightStemFilter). The light
variants stay in functions/analysis.py; THIS module implements the full
published Snowball algorithms (public specs at snowballstem.org, one
function per language), replacing the round-2 "light stand-in" policy for
the base language names.

All functions take and return a single lowercase token. They are pure
string functions executed inside the analyzer-chain Arrow UDFs — no Spark
dependency here.
"""

from __future__ import annotations

__all__ = [
    "german_stem", "german2_stem", "french_stem", "spanish_stem",
    "italian_stem", "portuguese_stem", "dutch_stem", "russian_stem",
    "SNOWBALL",
]


def _r1r2(word: str, vowels: str) -> tuple[int, int]:
    """Standard R1/R2: R1 = region after the first non-vowel following a
    vowel; R2 = the same, applied within R1."""
    def after_vc(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        # i now at first non-vowel after a vowel (or end)
        return min(i + 1, n) if i < n else n

    # find first vowel then first non-vowel after it
    n = len(word)
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    r1 = i + 1 if i < n else n
    j = r1
    while j < n and word[j] not in vowels:
        j += 1
    while j < n and word[j] in vowels:
        j += 1
    r2 = j + 1 if j < n else n
    return r1, r2


# ---------------------------------------------------------------------------
# German (snowball "german"; german2 adds the ae/oe/ue prelude)
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _german_stem(word: str, variant2: bool) -> str:
    w = word.replace("ß", "ss")
    if variant2:
        # german2 prelude: ae/oe/ue → ä/ö/ü, except ue after q or a vowel
        out = []
        i = 0
        while i < len(w):
            two = w[i:i + 2]
            if two == "ae":
                out.append("ä")
                i += 2
            elif two == "oe":
                out.append("ö")
                i += 2
            elif two == "ue" and out and out[-1] not in "aeiouyäöüq":
                out.append("ü")
                i += 2
            else:
                out.append(w[i])
                i += 1
        w = "".join(out)
    # mark u/y between vowels as consonants
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    vow = _DE_VOWELS
    # regions on the MARKED string: uppercase U/Y are consonants (the
    # lowercase vowel set doesn't contain them) — lowering first would undo
    # the marking and mis-place R1/R2 (bauen must stem to bau)
    r1, r2 = _r1r2(w, vow)
    r1 = max(r1, 3 if len(w) >= 3 else len(w))  # R1 begins at least at pos 3

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    # step 1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("niss"):
                    w = w[:-1]
                break
        else:
            if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
                    and w[-2] in _DE_S_END:
                w = w[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("st") and in_r1(len(w) - 2) and len(w) >= 6 \
                and w[-3] in _DE_ST_END:
            w = w[:-2]

    # step 3 (d-suffixes)
    if (w.endswith("end") or w.endswith("ung")) and in_r2(len(w) - 3):
        w = w[:-3]
        if w.endswith("ig") and in_r2(len(w) - 2) and not w.endswith("eig"):
            w = w[:-2]
    elif (w.endswith("isch") and in_r2(len(w) - 4)
          and not w.endswith("eisch")):
        w = w[:-4]
    elif ((w.endswith("ig") or w.endswith("ik")) and in_r2(len(w) - 2)
          and (len(w) < 3 or w[-3] != "e")):
        w = w[:-2]
    elif (w.endswith("lich") or w.endswith("heit")) and in_r2(len(w) - 4):
        w = w[:-4]
        if (w.endswith("er") or w.endswith("en")) and in_r1(len(w) - 2):
            w = w[:-2]
    elif w.endswith("keit") and in_r2(len(w) - 4):
        w = w[:-4]
        if w.endswith("lich") and in_r2(len(w) - 4):
            w = w[:-4]
        elif w.endswith("ig") and in_r2(len(w) - 2):
            w = w[:-2]

    # postlude
    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


def german_stem(word: str) -> str:
    return _german_stem(word, variant2=False)


def german2_stem(word: str) -> str:
    return _german_stem(word, variant2=True)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def french_stem(word: str) -> str:  # noqa: C901 — mirrors the published steps
    w = word
    # prelude: mark u/i between vowels, y next to a vowel, u after q
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars).replace("ë", "He").replace("ï", "Hi")

    n = len(w)
    # RV/R1/R2 on the MARKED string (uppercase U/I/Y/H count as consonants;
    # lowering first would undo the marking and mis-place the regions)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    r1, r2 = _r1r2(w, _FR_VOWELS)

    def in_rv(pos):
        return pos >= rv

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    changed = [False]

    def cut(s, k):
        changed[0] = True
        return s[:-k] if k else s

    did_step1 = False
    found_mentish = False

    # ---- step 1: standard suffixes (longest match governs) ----
    sufs = sorted([
        "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
        "ismes", "ables", "istes",
        "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
        "logie", "logies", "usion", "ution", "usions", "utions",
        "ence", "ences", "ement", "ements", "ité", "ités",
        "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
        "issement", "issements", "amment", "emment", "ment", "ments",
    ], key=len, reverse=True)
    match = next((s for s in sufs if w.endswith(s)), None)
    if match:
        p = len(w) - len(match)
        if match in ("ance", "iqUe", "isme", "able", "iste", "eux",
                     "ances", "iqUes", "ismes", "ables", "istes"):
            if in_r2(p):
                w = cut(w, len(match))
                did_step1 = True
        elif match in ("atrice", "ateur", "ation", "atrices", "ateurs", "ations"):
            if in_r2(p):
                w = cut(w, len(match))
                did_step1 = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = cut(w, 2)
                    else:
                        w = w[:-2] + "iqU"
        elif match in ("logie", "logies"):
            if in_r2(p):
                w = cut(w, len(match)) + "log"
                did_step1 = True
        elif match in ("usion", "ution", "usions", "utions"):
            if in_r2(p):
                w = cut(w, len(match)) + "u"
                did_step1 = True
        elif match in ("ence", "ences"):
            if in_r2(p):
                w = cut(w, len(match)) + "ent"
                did_step1 = True
        elif match in ("ement", "ements"):
            if in_rv(p):
                w = cut(w, len(match))
                did_step1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = cut(w, 2)
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = cut(w, 2)
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = cut(w, 3)
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") or w.endswith("iqU")) and in_r2(len(w) - 3):
                    w = cut(w, 3)
                elif (w.endswith("ièr") or w.endswith("Ièr")) and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif match in ("ité", "ités"):
            if in_r2(p):
                w = cut(w, len(match))
                did_step1 = True
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = cut(w, 4)
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = cut(w, 2)
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = cut(w, 2)
        elif match in ("if", "ive", "ifs", "ives"):
            if in_r2(p):
                w = cut(w, len(match))
                did_step1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = cut(w, 2)
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = cut(w, 2)
                        else:
                            w = w[:-2] + "iqU"
        elif match == "eaux":
            w = w[:-4] + "eau"
            changed[0] = True
            did_step1 = True
        elif match == "aux":
            if in_r1(p):
                w = w[:-3] + "al"
                changed[0] = True
                did_step1 = True
        elif match in ("euse", "euses"):
            if in_r2(p):
                w = cut(w, len(match))
                did_step1 = True
            elif in_r1(p):
                w = w[: -len(match)] + "eux"
                changed[0] = True
                did_step1 = True
        elif match in ("issement", "issements"):
            if in_r1(p) and p > 0 and w[p - 1] not in _FR_VOWELS:
                w = cut(w, len(match))
                did_step1 = True
        elif match == "amment":
            if in_rv(p):
                w = w[:-6] + "ant"
                found_mentish = True
        elif match == "emment":
            if in_rv(p):
                w = w[:-6] + "ent"
                found_mentish = True
        elif match in ("ment", "ments"):
            if p > 0 and w[p - 1] in _FR_VOWELS and in_rv(p - 1):
                w = cut(w, len(match))
                found_mentish = True

    # ---- step 2a: verb suffixes beginning i ----
    do_2a = (not did_step1) or found_mentish
    did_2 = False
    if do_2a:
        sufs2a = sorted([
            "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
            "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
            "irions", "irons", "iront", "is", "issaIent", "issais",
            "issait", "issant", "issante", "issantes", "issants", "isse",
            "issent", "isses", "issez", "issiez", "issions", "issons", "it",
        ], key=len, reverse=True)
        m2 = next((s for s in sufs2a if w.endswith(s)), None)
        if m2:
            p = len(w) - len(m2)
            if in_rv(p) and p > 0 and w[p - 1] not in _FR_VOWELS \
                    and in_rv(p - 1):
                w = cut(w, len(m2))
                did_2 = True
        if not did_2:
            # step 2b
            sufs2b = sorted([
                "ions", "é", "ée", "ées", "és", "èrent", "er", "era",
                "erai", "eraIent", "erais", "erait", "eras", "erez",
                "eriez", "erions", "erons", "eront", "ez", "iez",
                "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait",
                "ant", "ante", "antes", "ants", "as", "asse", "assent",
                "asses", "assiez", "assions",
            ], key=len, reverse=True)
            m2 = next((s for s in sufs2b if w.endswith(s)), None)
            if m2:
                p = len(w) - len(m2)
                if m2 == "ions":
                    if in_r2(p):
                        w = cut(w, 4)
                        did_2 = True
                elif m2 in ("é", "ée", "ées", "és", "èrent", "er", "era",
                            "erai", "eraIent", "erais", "erait", "eras",
                            "erez", "eriez", "erions", "erons", "eront",
                            "ez", "iez"):
                    if in_rv(p):
                        w = cut(w, len(m2))
                        did_2 = True
                else:
                    if in_rv(p):
                        w = cut(w, len(m2))
                        did_2 = True
                        if w.endswith("e") and in_rv(len(w) - 1):
                            w = w[:-1]

    # ---- step 3 / 4 ----
    # "If the last step to be obeyed — 1, 2a or 2b — altered the word, do
    # step 3; otherwise do step 4." When 2a/2b ran, THEIR outcome governs.
    altered_last = did_2 if do_2a else changed[0]
    if altered_last:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2:
            prev = w[-2]
            # spec: test ( 'Hi' or not among('a' 'i' 'o' 'u' 'è' 's') ) —
            # "Hi" ALLOWS the deletion, marked I/U are not in the among
            if (prev == "i" and len(w) >= 3 and w[-3] == "H") \
                    or prev not in "aiouès":
                w = w[:-1]
        sufs4 = ("Ière", "ière", "Ier", "ier", "ion", "e", "ë")
        m4 = next((s for s in sorted(sufs4, key=len, reverse=True)
                   if w.endswith(s)), None)
        if m4 == "ion":
            p = len(w) - 3
            if in_r2(p) and p > 0 and w[p - 1] in "st":
                w = w[:-3]
        elif m4 in ("ier", "ière", "Ier", "Ière"):
            p = len(w) - len(m4)
            if in_rv(p):
                w = w[: -len(m4)] + "i"
        elif m4 == "e":
            if in_rv(len(w) - 1):
                w = w[:-1]
        elif m4 == "ë":
            if in_rv(len(w) - 1) and w.endswith("guë"):
                w = w[:-1]

    # step 5: un-double
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break
    # step 6: un-accent — final é/è followed only by non-vowels
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_VOWELS:
        i -= 1
    if i >= 0 and w[i] in "éè" and i < len(w) - 1:
        w = w[:i] + "e" + w[i + 1:]

    # postlude
    w = w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _rv_es(word: str, vowels: str) -> int:
    """Spanish/Portuguese/Italian RV definition."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        # consonant in 2nd position: RV after next vowel
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        # two vowels: RV after next consonant
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


_ES_ACCENT = str.maketrans("áéíóú", "aeiou")


def spanish_stem(word: str) -> str:  # noqa: C901
    w = word
    n = len(w)
    rv = _rv_es(w, _ES_VOWELS)
    r1, r2 = _r1r2(w, _ES_VOWELS)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    # step 0: attached pronoun
    prons = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
             "me", "se", "la", "le", "lo")
    pron = next((p for p in prons if w.endswith(p)), None)
    if pron:
        base = w[: -len(pron)]
        pre_a = ("iéndo", "ándo", "ár", "ér", "ír")
        pre_b = ("ando", "iendo", "ar", "er", "ir")
        hit = next((s for s in pre_a if base.endswith(s)
                    and in_rv(len(base) - len(s))), None)
        if hit:
            w = base.translate(_ES_ACCENT)
        else:
            hit = next((s for s in pre_b if base.endswith(s)
                        and in_rv(len(base) - len(s))), None)
            if hit:
                w = base
            elif base.endswith("yendo") and len(base) >= 6 and base[-6] == "u":
                w = base
    # recompute regions (the spec keeps them fixed from the original word)
    did1 = False

    # step 1: standard suffixes
    s1 = sorted([
        "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
        "osos", "osas", "amiento", "amientos", "imiento", "imientos",
        "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
        "antes", "ancia", "ancias", "logía", "logías", "ución", "uciones",
        "encia", "encias", "amente", "mente", "idad", "idades", "iva",
        "ivo", "ivas", "ivos",
    ], key=len, reverse=True)
    m = next((s for s in s1 if w.endswith(s)), None)
    if m:
        p = len(w) - len(m)
        if m in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "able", "ables", "ible", "ibles", "ista",
                 "istas", "oso", "osa", "osos", "osas", "amiento",
                 "amientos", "imiento", "imientos"):
            if in_r2(p):
                w = w[:p]
                did1 = True
        elif m in ("adora", "ador", "ación", "adoras", "adores",
                   "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif m in ("logía", "logías"):
            if in_r2(p):
                w = w[:p] + "log"
                did1 = True
        elif m in ("ución", "uciones"):
            if in_r2(p):
                w = w[:p] + "u"
                did1 = True
        elif m in ("encia", "encias"):
            if in_r2(p):
                w = w[:p] + "ente"
                did1 = True
        elif m == "amente":
            if in_r1(p):
                w = w[:p]
                did1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif any(w.endswith(x) and in_r2(len(w) - 2)
                         for x in ("os", "ic", "ad")):
                    w = w[:-2]
        elif m == "mente":
            if in_r2(p):
                w = w[:p]
                did1 = True
                if any(w.endswith(x) and in_r2(len(w) - len(x))
                       for x in ("ante", "able", "ible")):
                    w = w[:-4]
        elif m in ("idad", "idades"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                for x in ("abil", "ic", "iv"):
                    if w.endswith(x) and in_r2(len(w) - len(x)):
                        w = w[: -len(x)]
                        break
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    did2a = False
    if not did1:
        s2a = sorted(["ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                      "yó", "yas", "yes", "yais", "yamos"],
                     key=len, reverse=True)
        m = next((s for s in s2a if w.endswith(s)), None)
        if m:
            p = len(w) - len(m)
            if in_rv(p) and p > 0 and w[p - 1] == "u":
                w = w[:p]
                did2a = True
    if not did1 and not did2a:
        gu_group = ("en", "es", "éis", "emos")
        s2b = sorted([
            "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
            "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
            "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
            "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
            "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada",
            "ida", "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese",
            "aste", "iste", "an", "aban", "ían", "aran", "ieran", "asen",
            "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo", "ió",
            "ar", "er", "ir", "as", "abas", "adas", "idas", "ías", "aras",
            "ieras", "ases", "ieses", "ís", "áis", "abais", "íais",
            "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
            "ados", "idos", "amos", "ábamos", "íamos", "imos", "áramos",
            "iéramos", "iésemos", "ásemos", "en", "es", "éis", "emos",
        ], key=len, reverse=True)
        m = next((s for s in s2b if w.endswith(s)), None)
        if m:
            p = len(w) - len(m)
            if in_rv(p):
                w = w[:p]
                if m in gu_group and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix
    s3a = ("os", "a", "o", "á", "í", "ó")
    m = next((s for s in sorted(s3a, key=len, reverse=True)
              if w.endswith(s)), None)
    if m and in_rv(len(w) - len(m)):
        w = w[: -len(m)]
    elif w.endswith("e") or w.endswith("é"):
        if in_rv(len(w) - 1):
            w = w[:-1]
            if w.endswith("gu") and in_rv(len(w) - 1):
                w = w[:-1]

    return w.translate(_ES_ACCENT)


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"


def portuguese_stem(word: str) -> str:  # noqa: C901
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_pt(w)
    r1, r2 = _r1r2(w, _PT_VOWELS)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    did1 = False
    s1 = sorted([
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos",
        "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
        "ante", "antes", "ância",
        "logia", "logias", "uça~o", "uço~es", "ência", "ências",
        "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
        "ivos", "ira", "iras",
    ], key=len, reverse=True)
    m = next((s for s in s1 if w.endswith(s)), None)
    if m:
        p = len(w) - len(m)
        if m in ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
                 "osos", "osas", "amento", "amentos", "imento",
                 "imentos", "adora", "ador", "aça~o", "adoras", "adores",
                 "aço~es", "ante", "antes", "ância"):
            if in_r2(p):
                w = w[:p]
                did1 = True
        elif m in ("logia", "logias"):
            if in_r2(p):
                w = w[:p] + "log"
                did1 = True
        elif m in ("uça~o", "uço~es"):
            if in_r2(p):
                w = w[:p] + "u"
                did1 = True
        elif m in ("ência", "ências"):
            if in_r2(p):
                w = w[:p] + "ente"
                did1 = True
        elif m == "amente":
            if in_r1(p):
                w = w[:p]
                did1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif any(w.endswith(x) and in_r2(len(w) - 2)
                         for x in ("os", "ic", "ad")):
                    w = w[:-2]
        elif m == "mente":
            if in_r2(p):
                w = w[:p]
                did1 = True
                if any(w.endswith(x) and in_r2(len(w) - len(x))
                       for x in ("ante", "ável", "ível")):
                    w = w[:-4]
        elif m in ("idade", "idades"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                for x in ("abil", "ic", "iv"):
                    if w.endswith(x) and in_r2(len(w) - len(x)):
                        w = w[: -len(x)]
                        break
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif m in ("ira", "iras"):
            if in_rv(p) and p > 0 and w[p - 1] == "e":
                w = w[:p] + "ir"
                did1 = True

    did2 = False
    if not did1:
        s2 = sorted([
            "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara",
            "erá", "era", "irá", "ava", "asse", "esse", "isse", "aste",
            "este", "iste", "ei", "arei", "erei", "irei", "am", "iam",
            "ariam", "eriam", "iriam", "aram", "eram", "iram", "avam",
            "em", "arem", "erem", "irem", "assem", "essem", "issem",
            "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
            "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias",
            "arias", "erias", "irias", "arás", "aras", "erás", "eras",
            "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
            "eres", "ires", "asses", "esses", "isses", "astes", "estes",
            "istes", "is", "ais", "iais", "aríais", "eríais", "iríais",
            "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
            "ásseis", "ésseis", "ísseis", "áveis", "aveis", "íeis",
            "ieis", "aríeis", "eríeis", "iríeis", "ados", "idos", "ámos",
            "amos", "íamos", "iamos", "aríamos", "eríamos", "iríamos",
            "áramos", "aramos", "éramos", "eramos", "íramos", "iramos",
            "ávamos", "avamos", "emos", "aremos", "eremos", "iremos",
            "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
            "irmos", "eu", "iu", "ou", "ira", "iras",
        ], key=len, reverse=True)
        m = next((s for s in s2 if w.endswith(s)), None)
        if m:
            p = len(w) - len(m)
            if in_rv(p):
                w = w[:p]
                did2 = True

    if did1 or did2:
        # step 3
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4: residual suffix
        for s in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(s) and in_rv(len(w) - len(s)):
                w = w[: -len(s)]
                break

    # step 5
    if (w.endswith("e") or w.endswith("é") or w.endswith("ê")) \
            and in_rv(len(w) - 1):
        w = w[:-1]
        if (w.endswith("gu") and in_rv(len(w) - 1)) or \
                (w.endswith("ci") and in_rv(len(w) - 1)):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


def _rv_pt(word: str) -> int:
    return _rv_es(word, _PT_VOWELS)


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")


def italian_stem(word: str) -> str:  # noqa: C901
    w = word.translate(_IT_ACUTE)
    # prelude: u/i between vowels → upper; qu → qU
    chars = list(w)
    n = len(chars)
    for i in range(1, n - 1):
        if chars[i] in "ui" and chars[i - 1] in _IT_VOWELS \
                and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    for i in range(1, n):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    # regions on the MARKED string (uppercase U/I are consonants)
    rv = _rv_es(w, _IT_VOWELS)
    r1, r2 = _r1r2(w, _IT_VOWELS)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    # step 0: attached pronoun
    prons = sorted([
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti",
        "vi", "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
        "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
        "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
        "vele", "veli", "velo", "vene",
    ], key=len, reverse=True)
    pron = next((p for p in prons if w.endswith(p)), None)
    if pron:
        base = w[: -len(pron)]
        if (base.endswith("ando") or base.endswith("endo")) \
                and in_rv(len(base) - 4):
            w = base
        elif any(base.endswith(x) and in_rv(len(base) - 2)
                 for x in ("ar", "er", "ir")):
            w = base + "e"

    did1 = False
    s1 = sorted([
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
        "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
        "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
        "ose", "mente", "atrice", "atrici", "ante", "anti",
        "azione", "azioni", "atore", "atori", "logia", "logie",
        "uzione", "uzioni", "usione", "usioni", "enza", "enze",
        "amento", "amenti", "imento", "imenti", "amente", "ità",
        "ivo", "ivi", "iva", "ive",
    ], key=len, reverse=True)
    m = next((s for s in s1 if w.endswith(s)), None)
    if m:
        p = len(w) - len(m)
        if m in ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                 "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                 "ibili", "ista", "iste", "isti", "istà", "istè", "istì",
                 "oso", "osi", "osa", "ose", "mente", "atrice", "atrici",
                 "ante", "anti"):
            if in_r2(p):
                w = w[:p]
                did1 = True
        elif m in ("azione", "azioni", "atore", "atori"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif m in ("logia", "logie"):
            if in_r2(p):
                w = w[:p] + "log"
                did1 = True
        elif m in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(p):
                w = w[:p] + "u"
                did1 = True
        elif m in ("enza", "enze"):
            if in_r2(p):
                w = w[:p] + "ente"
                did1 = True
        elif m in ("amento", "amenti", "imento", "imenti"):
            if in_rv(p):
                w = w[:p]
                did1 = True
        elif m == "amente":
            if in_r1(p):
                w = w[:p]
                did1 = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif any(w.endswith(x) and in_r2(len(w) - len(x))
                         for x in ("os", "ic", "abil")):
                    w = w[: -(2 if not w.endswith("abil") else 4)]
        elif m == "ità":
            if in_r2(p):
                w = w[:p]
                did1 = True
                for x in ("abil", "ic", "iv"):
                    if w.endswith(x) and in_r2(len(w) - len(x)):
                        w = w[: -len(x)]
                        break
        elif m in ("ivo", "ivi", "iva", "ive"):
            if in_r2(p):
                w = w[:p]
                did1 = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]

    if not did1:
        s2 = sorted([
            "ammo", "ando", "ano", "are", "arono", "asse", "assero",
            "assi", "assimo", "ata", "ate", "ati", "ato", "ava",
            "avamo", "avano", "avate", "avi", "avo", "emmo", "enda",
            "ende", "endi", "endo", "erà", "erai", "eranno", "ere",
            "erebbe", "erebbero", "erei", "eremmo", "eremo", "ereste",
            "eresti", "erete", "erò", "erono", "essero", "ete", "eva",
            "evamo", "evano", "evate", "evi", "evo", "Yamo", "iamo",
            "immo", "irà", "irai", "iranno", "ire", "irebbe",
            "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
            "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
            "isco", "iscono", "issero", "ita", "ite", "iti", "ito",
            "iva", "ivamo", "ivano", "ivate", "ivi", "ivo", "ono",
            "uta", "ute", "uti", "uto", "ar", "ir",
        ], key=len, reverse=True)
        m = next((s for s in s2 if w.endswith(s)), None)
        if m and in_rv(len(w) - len(m)):
            w = w[: -len(m)]

    # step 3a
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # step 3b
    if (w.endswith("ch") or w.endswith("gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"


def dutch_stem(word: str) -> str:  # noqa: C901
    tr = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    w = word.translate(tr)
    chars = list(w)
    n = len(chars)
    # mark: initial y → Y; y after vowel → Y; i between vowels → I
    for i in range(n):
        if chars[i] == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif chars[i] == "i" and 0 < i < n - 1 \
                and chars[i - 1] in _NL_VOWELS \
                and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    # regions on the MARKED string (uppercase Y/I are consonants)
    r1, r2 = _r1r2(w, _NL_VOWELS)
    r1 = max(r1, 3 if len(w) >= 3 else len(w))

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def undouble(s):
        if s.endswith(("kk", "dd", "tt")):
            return s[:-1]
        return s

    # step 1
    if w.endswith("heden") and in_r1(len(w) - 5):
        w = w[:-5] + "heid"
    elif w.endswith("ene") and in_r1(len(w) - 3) and len(w) >= 4 \
            and w[-4] not in _NL_VOWELS and not w.endswith("gemene"):
        w = undouble(w[:-3])
    elif w.endswith("en") and in_r1(len(w) - 2) and len(w) >= 3 \
            and w[-3] not in _NL_VOWELS and not w.endswith("gemen"):
        w = undouble(w[:-2])
    elif w.endswith("se") and in_r1(len(w) - 2) and len(w) >= 3 \
            and w[-3] not in _NL_VOWELS and w[-3] != "j":
        w = w[:-2]
    elif w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS and w[-2] != "j":
        w = w[:-1]

    # step 2
    e_removed = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = undouble(w[:-1])
        e_removed = True

    # step 3a
    if w.endswith("heid") and in_r2(len(w) - 4) and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and in_r1(len(w) - 2) and len(w) >= 3 \
                and w[-3] not in _NL_VOWELS and not w.endswith("gemen"):
            w = undouble(w[:-2])

    # step 3b
    if (w.endswith("end") or w.endswith("ing")) and in_r2(len(w) - 3):
        w = w[:-3]
        if w.endswith("ig") and in_r2(len(w) - 2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
        else:
            w = undouble(w)
    elif w.endswith("ig") and in_r2(len(w) - 2) and (len(w) < 3 or w[-3] != "e"):
        w = w[:-2]
    elif w.endswith("lijk") and in_r2(len(w) - 4):
        w = w[:-4]
        if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = undouble(w[:-1])
    elif w.endswith("baar") and in_r2(len(w) - 4):
        w = w[:-4]
    elif w.endswith("bar") and in_r2(len(w) - 3) and e_removed:
        w = w[:-3]

    # step 4: undouble vowel — C v v C (second C not I) with vv in aa/ee/oo/uu
    if len(w) >= 4:
        c1, v1, v2, c2 = w[-4], w[-3], w[-2], w[-1]
        if c1 not in _NL_VOWELS and v1 == v2 and v1 in "aeou" \
                and c2 not in _NL_VOWELS and c2 != "I":
            w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PGERUND_1 = ("вшись", "вши", "в")
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые",
           "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их",
           "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло",
              "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB_2 = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
              "ило", "ыло", "ено", "ует", "уют", "ены", "ить", "ыть",
              "ишь", "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
              "ят", "ит", "ыт", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию",
            "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
            "ем", "ам", "ом", "ах", "ях", "ью", "ия", "ья", "а", "е",
            "и", "й", "о", "у", "ы", "ь", "ю", "я")
_RU_SUPER = ("ейше", "ейш")


def russian_stem(word: str) -> str:  # noqa: C901
    w = word.replace("ё", "е")
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _r1r2(w, _RU_VOWELS)

    def try_cut(s, sufs, need_ay=False):
        """Longest suffix in RV; group-1 suffixes need а/я immediately
        before (the а/я is kept)."""
        for suf in sorted(sufs, key=len, reverse=True):
            if s.endswith(suf):
                p = len(s) - len(suf)
                if p < rv:
                    continue
                if need_ay:
                    if p > 0 and s[p - 1] in "ая" and p - 1 >= rv:
                        return s[:p]
                    continue
                return s[:p]
        return None

    # step 1
    out = try_cut(w, _RU_PGERUND_2) or try_cut(w, _RU_PGERUND_1, need_ay=True)
    if out is not None:
        w = out
    else:
        for refl in ("ся", "сь"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        adj = try_cut(w, _RU_ADJ)
        if adj is not None:
            w = adj
            part = try_cut(w, _RU_PART_2) or try_cut(w, _RU_PART_1, need_ay=True)
            if part is not None:
                w = part
        else:
            verb = try_cut(w, _RU_VERB_2) or try_cut(w, _RU_VERB_1, need_ay=True)
            if verb is not None:
                w = verb
            else:
                noun = try_cut(w, _RU_NOUN)
                if noun is not None:
                    w = noun

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (in R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = try_cut(w, _RU_SUPER)
        if sup is not None:
            w = sup
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# Snowball language-name registry (SnowballTokenFilterFactory's
# `language:` values → stemmer)
SNOWBALL = {
    "German": german_stem,
    "German2": german2_stem,
    "French": french_stem,
    "Spanish": spanish_stem,
    "Italian": italian_stem,
    "Portuguese": portuguese_stem,
    "Dutch": dutch_stem,
    "Russian": russian_stem,
}
