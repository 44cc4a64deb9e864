"""Ingest pipelines: pre-index ETL as chained Column expressions.

Re-expresses the reference's ingest processors
(``modules/ingest-common/src/main/java/org/elasticsearch/ingest/common/``,
orchestrated by ``server/src/main/java/org/elasticsearch/ingest/
IngestService.java``) as a compiler from the pipeline JSON (list of
processor specs) to a chain of ``withColumn``/``filter`` transformations —
every processor is a native Spark expression (JVM-side, codegen), no UDFs.

Supported processors (citation = file in ``modules/ingest-common/.../``):
set, remove, rename, lowercase/uppercase/trim (``LowercaseProcessor.java``
etc.), gsub (``GsubProcessor.java``), split (``SplitProcessor.java``),
join (``JoinProcessor.java``), convert (``ConvertProcessor.java``), date
(``DateProcessor.java``), csv (``CsvProcessor.java``), json
(``JsonProcessor.java``), kv (``KeyValueProcessor.java``), dissect
(``DissectProcessor.java`` — compiled to a regexp), grok
(``GrokProcessor.java`` — named-group regexp subset), urldecode
(``URLDecodeProcessor.java``), html_strip (``HtmlStripProcessor.java``),
fingerprint (``FingerprintProcessor.java``), bytes
(``BytesProcessor.java``), drop (``DropProcessor.java``), script (Spark
SQL expression string), foreach (``ForeachProcessor.java`` — transform()
over an array), append, sort (``SortProcessor.java``), fail (``FailProcessor.java`` —
raise_error under the condition), date_index_name
(``DateIndexNameProcessor.java``), registered_domain
(``RegisteredDomainProcessor.java`` — PSL approximation), network_direction
(``NetworkDirectionProcessor.java`` — compile-time CIDR folds), community_id
(``CommunityIdProcessor.java`` — the Zeek flow-hash spec, verified against
the published test vectors), and per-processor ``if`` conditionals
(``ConditionalProcessor.java`` — a SQL boolean expression).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NOTE: these are java-regex strings passed VERBATIM through the Column API
# (F.regexp_extract / regexp_replace take the pattern as data, not as SQL
# text) — so single backslashes, never doubled
_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NUMBER": r"(?:[+-]?(?:[0-9]*\.)?[0-9]+)",
    "INT": r"[+-]?[0-9]+",
    "IP": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601": r"[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(?:\.[0-9]+)?",
    "GREEDYDATA": r".*",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    # timestamp shapes find_structure emits (text_structure.py hands its
    # grok_pattern to this bank — every name there must resolve here)
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}",
    "HTTPDATE": r"\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "POSINT": r"\d+",
}


def _grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """%{NAME:field} grok syntax → (java regex with groups, field order)."""
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        name, _, fld = m.group(1).partition(":")
        base = _GROK_PATTERNS[name]
        if fld:
            fields.append(fld)
            return f"({base})"
        return f"(?:{base})"

    rx = re.sub(r"%\{(\w+(?::\w+)?)\}", sub, pattern)
    return rx, fields


def _dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """dissect %{field} syntax (literal-delimited) → regex. Modifiers
    (``libs/dissect/.../DissectParser.java``): ``%{+f}`` appends to f
    (the apply step concat_ws-joins repeated captures), ``%{?f}`` named
    skip, ``%{f->}`` skips right padding, ``%{}`` skip. The returned field
    list repeats a name once per appended capture, in order."""
    fields: list[str] = []
    out = []
    pos = 0
    for m in re.finditer(r"%\{([^}]*)\}", pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        fld = m.group(1)
        if fld.endswith("->"):
            fld = fld[:-2]
            pad = " *"
        else:
            pad = ""
        if not fld or fld.startswith("?"):
            out.append("(?:.*?)")
        else:
            fields.append(fld[1:] if fld.startswith("+") else fld)
            out.append("(.*?)")
        out.append(pad)
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    rx = "".join(out)
    # make the final capture greedy so it reaches end of string
    if rx.endswith("(.*?)"):
        rx = rx[:-5] + "(.*)"
    return rx, fields


def dissect_cols(
    df: DataFrame, src_col: str, pattern: str, append_separator: str = ""
) -> DataFrame:
    """Apply a dissect pattern: one column per distinct field; repeated
    (``%{+f}``) captures join with ``append_separator`` in pattern order."""
    rx, fields = _dissect_to_regex(pattern)
    groups: dict[str, list[int]] = {}
    for i, fld in enumerate(fields, start=1):
        groups.setdefault(fld, []).append(i)
    for fld, idxs in groups.items():
        if len(idxs) == 1:
            df = df.withColumn(fld, F.regexp_extract(F.col(src_col), rx, idxs[0]))
        else:
            df = df.withColumn(fld, F.concat_ws(
                append_separator,
                *[F.regexp_extract(F.col(src_col), rx, i) for i in idxs]))
    return df


def _ip4_num(col: str) -> str:
    """SQL expr: dotted-quad IPv4 string column → bigint."""
    return (
        f"(cast(split({col}, '\\\\.')[0] as bigint) * 16777216"
        f" + cast(split({col}, '\\\\.')[1] as bigint) * 65536"
        f" + cast(split({col}, '\\\\.')[2] as bigint) * 256"
        f" + cast(split({col}, '\\\\.')[3] as bigint))"
    )


# NetworkDirectionProcessor.java named ranges (the RFC blocks)
_NAMED_NETWORKS = {
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"],
    "loopback": ["127.0.0.0/8"],
    "link_local_unicast": ["169.254.0.0/16"],
    "multicast": ["224.0.0.0/4"],
    "unspecified": ["0.0.0.0/32"],
}


def _ip_in_networks(col: str, nets: list[str]) -> Column:
    """IPv4-in-CIDR-set as compile-time-folded integer BETWEENs."""
    blocks: list[str] = []
    for n in nets:
        blocks.extend(_NAMED_NETWORKS.get(n, [n]))
    ip = _ip4_num(col)
    checks = []
    for blk in blocks:
        net, _, bits = blk.partition("/")
        bits_i = int(bits) if bits else 32
        o = [int(x) for x in net.split(".")]
        base = o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]
        span = 1 << (32 - bits_i)
        lo = (base // span) * span
        checks.append(f"{ip} BETWEEN {lo} AND {lo + span - 1}")
    return F.expr("(" + " OR ".join(checks) + ")")


# processors whose implementation already applies `if` row-level: the
# put()-routed column writers plus the natively row-conditional kinds
_COND_NATIVE = {
    "set", "lowercase", "uppercase", "trim", "gsub", "split", "join",
    "append", "convert", "json", "kv", "urldecode", "html_strip", "bytes",
    "sort", "foreach", "redact", "fail", "drop",
}


def _apply_guarded(df: DataFrame, kind: str, body: dict, cond: str) -> DataFrame:
    """Row-level ``if`` for processors that write columns unconditionally
    (date/csv/grok/user_agent/geoip/...): evaluate the condition on the
    PRE-processor document, snapshot the pre-state, run the processor on
    every row, then per column keep the processor's output only where the
    condition held — ConditionalProcessor.java: non-matching documents
    pass through untouched. A column the processor removed/renamed reads
    NULL on matching rows (the columnar spelling of an absent field)."""
    pre_cols = list(df.columns)
    snap = {c: f"__pre_{i}" for i, c in enumerate(pre_cols)}
    snapped = df.withColumn("__if_ok", F.expr(cond)).select(
        "*", *[F.col(f"`{c}`").alias(a) for c, a in snap.items()]
    )
    out = _apply_one(snapped, {kind: {k: v for k, v in body.items() if k != "if"}})
    ok = F.col("__if_ok")
    aux = set(snap.values()) | {"__if_ok"}
    for c, a in snap.items():
        if c in out.columns:
            out = out.withColumn(c, F.when(ok, F.col(f"`{c}`")).otherwise(F.col(a)))
        else:
            out = out.withColumn(c, F.when(ok, F.lit(None)).otherwise(F.col(a)))
    for c in list(out.columns):
        if c not in snap and c not in aux:
            out = out.withColumn(c, F.when(ok, F.col(f"`{c}`")))
    return out.drop("__if_ok", *snap.values())


def _apply_one(df: DataFrame, spec: dict) -> DataFrame:
    (kind, body), = ((k, v) for k, v in spec.items())
    cond = body.get("if")
    if cond is not None and kind not in _COND_NATIVE:
        return _apply_guarded(df, kind, body, cond)

    def put(col: str, expr: Column) -> DataFrame:
        if cond:
            base = F.col(col) if col in df.columns else F.lit(None)
            return df.withColumn(col, F.when(F.expr(cond), expr).otherwise(base))
        return df.withColumn(col, expr)

    f = body.get("field")
    tgt = body.get("target_field", f)
    if kind == "set":
        return put(f, F.lit(body["value"]))
    if kind == "remove":
        flds = f if isinstance(f, list) else [f]
        return df.drop(*flds)
    if kind == "rename":
        return df.withColumnRenamed(f, tgt)
    if kind == "lowercase":
        return put(tgt, F.lower(F.col(f)))
    if kind == "uppercase":
        return put(tgt, F.upper(F.col(f)))
    if kind == "trim":
        return put(tgt, F.trim(F.col(f)))
    if kind == "gsub":
        return put(tgt, F.regexp_replace(F.col(f), body["pattern"], body["replacement"]))
    if kind == "split":
        return put(tgt, F.split(F.col(f), body["separator"]))
    if kind == "join":
        return put(tgt, F.array_join(F.col(f), body["separator"]))
    if kind == "append":
        vals = body["value"] if isinstance(body["value"], list) else [body["value"]]
        return put(f, F.concat(F.coalesce(F.col(f), F.array()), F.array(*[F.lit(v) for v in vals])))
    if kind == "convert":
        t = {"integer": "int", "long": "long", "float": "float", "double": "double",
             "string": "string", "boolean": "boolean"}[body["type"]]
        return put(tgt, F.col(f).cast(t))
    if kind == "date":
        fmt = body.get("formats", ["yyyy-MM-dd'T'HH:mm:ss"])[0]
        tgt2 = body.get("target_field", "@timestamp")
        if fmt in ("UNIX", "UNIX_MS"):
            div = 1 if fmt == "UNIX" else 1000
            return df.withColumn(tgt2, F.timestamp_seconds(F.col(f).cast("double") / div))
        return df.withColumn(tgt2, F.to_timestamp(F.col(f), fmt))
    if kind == "csv":
        tgts = body["target_fields"]
        sep = body.get("separator", ",")
        parts = F.split(F.col(f), re.escape(sep))
        out = df
        for i, t2 in enumerate(tgts):
            out = out.withColumn(t2, parts.getItem(i))
        return out
    if kind == "json":
        return put(tgt, F.from_json(F.col(f), body["schema"]))
    if kind == "kv":
        fs = body.get("field_split", " ")
        vs = body.get("value_split", "=")
        return put(
            tgt,
            F.map_from_entries(
                F.expr(
                    f"transform(split({f}, '{fs}'),"
                    f" p -> struct(split(p, '{vs}')[0] as key, split(p, '{vs}')[1] as value))"
                )
            ),
        )
    if kind == "grok":
        rx, fields = _grok_to_regex(body["patterns"][0])
        out = df
        for i, fld in enumerate(fields, start=1):
            out = out.withColumn(fld, F.regexp_extract(F.col(f), rx, i))
        return out
    if kind == "dissect":
        return dissect_cols(df, f, body["pattern"],
                            body.get("append_separator", ""))
    if kind == "urldecode":
        return put(tgt, F.url_decode(F.col(f)))
    if kind == "html_strip":
        from ..functions.analysis import html_strip_udf

        return put(tgt, html_strip_udf(F.col(f)))
    if kind == "attachment":
        # AttachmentProcessor (plugins/ingest-attachment,
        # ``AttachmentProcessor.java``): base64/binary data →
        # {content, content_type, language, content_length}. The reference
        # delegates extraction to Apache Tika; no extraction engine ships in
        # this environment, so content-type sniffing, HTML/plain-text
        # extraction, and language ID are REAL, while PDF/OOXML/RTF bodies
        # are recognized by magic bytes but their content stays null
        # (engine-gated — documented, same output shape as the reference).
        from ..functions.analysis import html_strip_udf
        from ..functions.textstats import lang_id

        tgt2 = body.get("target_field", "attachment")
        n_chars = int(body.get("indexed_chars", 100_000))
        is_bin = dict(df.dtypes).get(f) == "binary"
        data = F.col(f) if is_bin else F.unbase64(F.col(f))
        txt = F.decode(data, "UTF-8")
        low = F.lower(F.substring(txt, 1, 256))
        ct = (
            F.when(F.substring(data, 1, 4) == F.lit(b"%PDF"), "application/pdf")
            .when(F.substring(data, 1, 4) == F.lit(b"PK\x03\x04"), "application/zip")
            .when(F.substring(data, 1, 5) == F.lit(b"{\\rtf"), "application/rtf")
            .when(
                low.contains("<html") | low.contains("<!doctype html"),
                "text/html",
            )
            .otherwise("text/plain")
        )
        content = (
            F.when(ct == "text/html", html_strip_udf(txt))
            .when(ct == "text/plain", txt)
            .otherwise(F.lit(None).cast("string"))
        )
        df = df.withColumn("__att_ct", ct)
        df = df.withColumn("__att_content", F.substring(content, 1, n_chars))
        fields = {
            "content": F.col("__att_content"),
            "content_type": F.col("__att_ct"),
            "language": F.when(
                F.col("__att_content").isNotNull(), lang_id("__att_content")
            ),
            "content_length": F.length("__att_content").cast("long"),
        }
        props = body.get("properties", list(fields))
        return df.withColumn(
            tgt2,
            F.struct(*[fields[p].alias(p) for p in props if p in fields]),
        ).drop("__att_ct", "__att_content")
    if kind == "fingerprint":
        flds = body["fields"]
        return df.withColumn(
            body.get("target_field", "fingerprint"),
            F.sha2(F.concat_ws("|", *[F.col(x).cast("string") for x in flds]), 256),
        )
    if kind == "bytes":
        # "1kb" → 1024 etc.
        units = "CASE lower(regexp_extract({c}, '([kmgt]?b)$', 1)) WHEN 'b' THEN 1 WHEN 'kb' THEN 1024 WHEN 'mb' THEN 1048576 WHEN 'gb' THEN 1073741824 WHEN 'tb' THEN 1099511627776 END"
        num = "cast(regexp_extract({c}, '^([0-9.]+)', 1) as double)"
        return put(tgt, F.expr(f"cast({num.format(c=f)} * {units.format(c=f)} as long)"))
    if kind == "sort":
        # SortProcessor.java: sort an array field asc/desc in place
        return put(tgt, F.sort_array(F.col(f), asc=body.get("order", "asc") == "asc"))
    if kind == "fail":
        # FailProcessor.java: abort ingestion with a message when reached
        # (meaningful under `if`). Batch analog: the job fails loudly on the
        # first matching doc — raise_error is non-foldable, so the check
        # can't be optimized away; non-matching rows short-circuit the OR.
        msg = body.get("message", "fail processor triggered")
        trip = F.expr(cond) if cond else F.lit(True)
        return df.where(
            (~trip) | (F.raise_error(F.lit(msg)).cast("string") == F.lit(""))
        )
    if kind == "date_index_name":
        # DateIndexNameProcessor.java: route the doc to a time-based index —
        # _index = prefix + date_format(round(ts, date_rounding))
        unit = {"y": "year", "M": "month", "w": "week", "d": "day",
                "h": "hour", "m": "minute", "s": "second"}[body["date_rounding"]]
        ts = F.col(f)
        fmts = body.get("date_formats")
        if fmts and fmts[0] not in ("ISO8601",):
            ts = F.to_timestamp(ts, fmts[0])
        else:
            ts = ts.cast("timestamp")
        return df.withColumn("_index", F.concat(
            F.lit(body.get("index_name_prefix", "")),
            F.date_format(F.date_trunc(unit, ts),
                          body.get("index_name_format", "yyyy-MM-dd")),
        ))
    if kind == "registered_domain":
        # RegisteredDomainProcessor.java: FQDN → domain/registered_domain/
        # top_level_domain/subdomain. Public-suffix handling uses the same
        # documented approximation as textstats.registrable_domain (common
        # two-level suffixes widened; the reference embeds the full PSL).
        host = F.lower(F.col(f))
        two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
        three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
        is_2l = two.rlike(r"^(co|com|org|net|ac|gov|edu)\.[a-z]{2}$")
        reg = F.when(is_2l & (three != ""), three).otherwise(
            F.when(two != "", two).otherwise(host))
        tld = F.when(is_2l, two).otherwise(F.regexp_extract(host, r"([^.]+)$", 1))
        sub = F.when(host == reg, F.lit(None).cast("string")).otherwise(
            host.substr(F.lit(1), F.length(host) - F.length(reg) - 1))
        pre = body.get("target_field", "url")
        return (
            df.withColumn(f"{pre}.domain", host)
            .withColumn(f"{pre}.registered_domain", reg)
            .withColumn(f"{pre}.top_level_domain", tld)
            .withColumn(f"{pre}.subdomain", sub)
        )
    if kind == "network_direction":
        # NetworkDirectionProcessor.java: classify the flow against the
        # internal_networks CIDR/named ranges — IPv4 blocks fold to integer
        # BETWEENs at compile time (no UDF)
        sip = body.get("source_ip", "source_ip")
        dip = body.get("destination_ip", "destination_ip")
        nets = body["internal_networks"]
        s_in = _ip_in_networks(sip, nets)
        d_in = _ip_in_networks(dip, nets)
        direction = (
            F.when(s_in & d_in, "internal")
            .when(s_in, "outbound")
            .when(d_in, "inbound")
            .otherwise("external")
        )
        return df.withColumn(body.get("target_field", "network_direction"), direction)
    if kind == "community_id":
        # CommunityIdProcessor.java (the Zeek/Corelight flow-hash spec):
        # 1:base64(sha1(seed_be16 . min_endpoint . max_endpoint . proto .
        # 0x00 . sport_be16 . dport_be16)) with endpoints ordered so the
        # smaller (ip, port) comes first. Pure expression chain — ints →
        # fixed-width bytes via unhex(lpad(hex(...))), sha1 hex → raw via
        # unhex, then base64. Verified against the published test vectors.
        sip = body.get("source_ip", "source_ip")
        dip = body.get("destination_ip", "destination_ip")
        sp = body.get("source_port", "source_port")
        dp = body.get("destination_port", "destination_port")
        proto = body.get("iana_number", "iana_number")
        seed = int(body.get("seed", 0))
        s_num, d_num = _ip4_num(sip), _ip4_num(dip)
        swap = f"({s_num} > {d_num} OR ({s_num} = {d_num} AND {sp} > {dp}))"
        lo_ip = f"if({swap}, {d_num}, {s_num})"
        hi_ip = f"if({swap}, {s_num}, {d_num})"
        lo_pt = f"if({swap}, {dp}, {sp})"
        hi_pt = f"if({swap}, {sp}, {dp})"
        payload = (
            f"concat(unhex('{seed:04x}'),"
            f" unhex(lpad(hex({lo_ip}), 8, '0')),"
            f" unhex(lpad(hex({hi_ip}), 8, '0')),"
            f" unhex(lpad(hex({proto}), 2, '0')), unhex('00'),"
            f" unhex(lpad(hex({lo_pt}), 4, '0')),"
            f" unhex(lpad(hex({hi_pt}), 4, '0')))"
        )
        cid = F.expr(f"concat('1:', base64(unhex(sha1({payload}))))")
        return df.withColumn(body.get("target_field", "community_id"), cid)
    if kind == "enrich":
        # x-pack enrich processor (EnrichProcessorFactory): lookup against
        # a policy table — the dim side is broadcast (small by contract),
        # so the join adds no shuffle to the ingest plan. The policy frame
        # arrives as `_lookup_df` (the executed enrich index); matched
        # enrich fields land under target_field.<col>.
        lookup = body["_lookup_df"]
        match_field = body["match_field"]
        enrich_fields = body.get("enrich_fields") or [
            c for c in lookup.columns if c != match_field
        ]
        tgt2 = body.get("target_field", "enriched")
        dim = lookup.select(
            F.col(match_field).alias(f),
            *[F.col(c).alias(f"{tgt2}.{c}") for c in enrich_fields],
        )
        return df.join(F.broadcast(dim), f, "left")
    if kind == "user_agent":
        # modules/ingest-user-agent UserAgentProcessor: browser/OS/device
        # extraction from a User-Agent string. The reference walks the
        # uap-core regexes.yaml; this engine compiles the HIGH-TRAFFIC
        # subset of those patterns (ordered exactly like uap-core: vendor
        # forks before the engines they embed) into one CASE-WHEN ladder of
        # regexp_extracts — pure JVM projection, zero Python per row.
        # Long-tail agents fall to "Other", the reference's own fallback.
        tgt = body.get("target_field", "user_agent")
        ua = F.col(f)
        v = lambda pat: F.regexp_extract(ua, pat, 1)  # noqa: E731
        browsers = [
            ("Edge", r"Edge?/(\d+(?:\.\d+)*)", r"\bEdge?/\d"),
            ("Edge", r"Edg[A-Za-z]*/(\d+(?:\.\d+)*)", r"\bEdg[A-Za-z]*/\d"),
            ("Opera", r"OPR/(\d+(?:\.\d+)*)", r"\bOPR/\d"),
            ("Opera", r"Opera[ /](\d+(?:\.\d+)*)", r"\bOpera[ /]\d"),
            ("Chrome Mobile iOS", r"CriOS/(\d+(?:\.\d+)*)", r"\bCriOS/\d"),
            ("Firefox iOS", r"FxiOS/(\d+(?:\.\d+)*)", r"\bFxiOS/\d"),
            ("Chrome Mobile", r"Chrome/(\d+(?:\.\d+)*)", r"\bChrome/\d.*\bMobile\b"),
            ("Chrome", r"Chrome/(\d+(?:\.\d+)*)", r"\bChrome/\d"),
            ("Firefox", r"Firefox/(\d+(?:\.\d+)*)", r"\bFirefox/\d"),
            ("Mobile Safari", r"Version/(\d+(?:\.\d+)*)",
             r"\bVersion/\d.*\bMobile\b.*\bSafari/"),
            ("Safari", r"Version/(\d+(?:\.\d+)*)", r"\bVersion/\d.*\bSafari/"),
            ("IE", r"MSIE (\d+(?:\.\d+)*)", r"\bMSIE \d"),
            ("IE", r"rv:(\d+(?:\.\d+)*)", r"\bTrident/\d"),
            ("curl", r"curl/(\d+(?:\.\d+)*)", r"^curl/\d"),
            ("Python Requests", r"python-requests/(\d+(?:\.\d+)*)",
             r"^python-requests/\d"),
        ]
        name_c, ver_c = F.lit("Other"), F.lit(None).cast("string")
        for bname, vpat, hit in reversed(browsers):
            cond2 = ua.rlike(hit)
            name_c = F.when(cond2, F.lit(bname)).otherwise(name_c)
            ver_c = F.when(cond2, v(vpat)).otherwise(ver_c)
        # NT-version → marketing name map (uap-core os_replacement table)
        nt = v(r"Windows NT (\d+\.\d+)")
        win_ver = (F.when(nt == "10.0", "10").when(nt == "6.3", "8.1")
                   .when(nt == "6.2", "8").when(nt == "6.1", "7")
                   .when(nt == "6.0", "Vista").when(nt == "5.1", "XP")
                   .otherwise(nt))
        oses = [
            ("iOS", F.regexp_replace(
                v(r"(?:iPhone|CPU) OS (\d+(?:_\d+)*)"), "_", ".")),
            ("Android", v(r"Android (\d+(?:\.\d+)*)")),
            ("Windows", win_ver),
            ("Mac OS X", F.regexp_replace(
                v(r"Mac OS X (\d+(?:[._]\d+)*)"), "_", ".")),
            ("Chrome OS", v(r"CrOS [\w]+ (\d+(?:\.\d+)*)")),
            ("Linux", F.lit(None).cast("string")),
        ]
        os_hits = {
            "iOS": r"(?:iPhone|CPU) OS \d", "Android": r"\bAndroid \d",
            "Windows": r"\bWindows NT \d", "Mac OS X": r"\bMac OS X \d",
            "Chrome OS": r"\bCrOS ", "Linux": r"\bLinux\b",
        }
        os_name = F.lit("Other")
        os_ver = F.lit(None).cast("string")
        for oname, over in reversed(oses):
            c2 = ua.rlike(os_hits[oname])
            os_name = F.when(c2, F.lit(oname)).otherwise(os_name)
            os_ver = F.when(c2, over).otherwise(os_ver)
        device = (F.when(ua.rlike(r"\biPhone\b"), "iPhone")
                  .when(ua.rlike(r"\biPad\b"), "iPad")
                  .when(ua.rlike(r"\bMacintosh\b"), "Mac")
                  .when(ua.rlike(r"\bAndroid\b"), "Generic Smartphone")
                  .otherwise("Other"))
        props = body.get("properties") or [
            "name", "version", "os", "device", "original"]
        cols = {}
        if "name" in props:
            cols[f"{tgt}.name"] = name_c
        if "version" in props:
            cols[f"{tgt}.version"] = ver_c
        if "os" in props:
            cols[f"{tgt}.os.name"] = os_name
            cols[f"{tgt}.os.version"] = os_ver
            cols[f"{tgt}.os.full"] = F.when(
                os_ver.isNotNull(), F.concat(os_name, F.lit(" "), os_ver)
            ).otherwise(os_name)
        if "device" in props:
            cols[f"{tgt}.device.name"] = device
        if "original" in props:
            cols[f"{tgt}.original"] = ua
        return df.withColumns(cols)
    if kind == "geoip":
        # modules/ingest-geoip GeoIpProcessor: network-block database
        # lookup as a bucketed broadcast range join (sources/geoip.py).
        # The database arrives as `_database_df` (raw blocks; prepared
        # here) — the mmdb-file stand-in for this embedded engine.
        from .geoip import geoip_lookup, prepare_geoip_blocks

        blocks = prepare_geoip_blocks(body["_database_df"])
        return geoip_lookup(
            df, f, blocks,
            target_field=body.get("target_field", "geoip"),
            properties=body.get("properties"),
        )
    if kind == "drop":
        return df.where(~F.expr(cond)) if cond else df.limit(0)
    if kind == "script":
        # ScriptProcessor (IC/ScriptProcessor.java): Painless-subset
        # sources mutate ``ctx`` in the interpreter (new/changed/removed
        # fields materialize as columns); SQL-expression sources keep the
        # JVM fast path writing target_field
        from ..functions import painless as _P

        if _P.is_painless(body["source"]):
            return _ctx_script(df, body["source"], body.get("params"))
        return df.withColumn(body["target_field"], F.expr(body["source"]))
    if kind == "foreach":
        inner = body["processor"]
        (ik, ib), = inner.items()
        lam = {"lowercase": "x -> lower(x)", "uppercase": "x -> upper(x)", "trim": "x -> trim(x)"}[ik]
        return put(f, F.expr(f"transform({f}, {lam})"))
    if kind == "uri_parts":
        # UriPartsProcessor (ingest-common): decompose a URI into
        # scheme/domain/port/path/query/fragment/extension columns —
        # pure regexp_extract, stays in whole-stage codegen
        tgt2 = body.get("target_field", "url")
        c = F.col(f)
        parts = {
            "scheme": r"^([a-zA-Z][a-zA-Z0-9+.-]*):",
            "domain": r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)",
            "port": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:([0-9]+)",
            "path": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)",
            "query": r"\?([^#]*)",
            "fragment": r"#(.*)$",
        }
        out = df
        for pname, rx in parts.items():
            out = out.withColumn(f"{tgt2}.{pname}", F.regexp_extract(c, rx, 1))
        out = out.withColumn(
            f"{tgt2}.extension",
            F.regexp_extract(F.col(f"`{tgt2}.path`"), r"\.([^./]+)$", 1),
        )
        return out
    if kind == "dot_expander":
        # DotExpanderProcessor: turn a literal "a.b.c" column into nested
        # structs a{b{c}}; merges new fields into an existing top-level
        # struct (a same-named existing sub-field is not deep-merged —
        # documented subset of the reference's recursive merge)
        if "." not in f:
            raise ValueError(f"dot_expander field has no dot: {f!r}")
        parts = f.split(".")
        root = parts[0]
        inner: Column = F.col(f"`{f}`")
        for p in reversed(parts[2:]):
            inner = F.struct(inner.alias(p))
        if root in df.columns:
            new_root = F.struct(F.col(f"{root}.*"), inner.alias(parts[1]))
        else:
            new_root = F.struct(inner.alias(parts[1]))
        return df.withColumn(root, new_root).drop(F.col(f"`{f}`"))
    if kind == "pipeline":
        # PipelineProcessor: invoke another (named) pipeline inline —
        # composition of processor lists
        return run_pipeline(df, body["processors"])
    if kind == "redact":
        # x-pack RedactProcessor (8.7): every %{PATTERN:name} match in the
        # field is replaced by <name> (prefix/suffix configurable);
        # pattern_definitions extend the bank for this processor
        bank = {**_GROK_PATTERNS, **(body.get("pattern_definitions") or {})}
        pre, suf = body.get("prefix", "<"), body.get("suffix", ">")
        col = F.col(f)
        for pat in body["patterns"]:
            m = re.fullmatch(r"%\{(\w+)(?::(\w+))?\}", pat.strip())
            if not m:
                raise ValueError(
                    f"redact: each pattern must be a single %{{NAME[:field]}}, got {pat!r}")
            # Matcher.quoteReplacement: $ and \ are special in java
            # replacement strings — user prefix/suffix stay literal
            repl = f"{pre}{m.group(2) or m.group(1)}{suf}"
            repl = repl.replace("\\", "\\\\").replace("$", "\\$")
            col = F.regexp_replace(col, bank[m.group(1)], repl)
        return put(tgt, col)
    if kind == "inference":
        # x-pack InferenceProcessor (the semantic_text ingest path): run the
        # registered model over each input_field → output_field,
        # Arrow-batched executor-side. A completion-registered model id
        # produces strings; anything else embeds (registered embedder or
        # the deterministic hash_embed default).
        from ..functions.inference import (
            COMPLETION_MODELS, completion_column, embed_column)

        model_id = body.get("model_id") or body.get("inference_id") or ""
        pairs = body.get("input_output") or [{
            "input_field": f, "output_field": tgt or f"{f}__embedding"}]
        out = df
        for p in pairs:
            if model_id in COMPLETION_MODELS:
                out = completion_column(
                    out, p["input_field"], model_id, out_col=p["output_field"])
            else:
                out = embed_column(
                    out, p["input_field"], model_id, out_col=p["output_field"])
        return out
    raise ValueError(f"unsupported processor: {kind}")


def run_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Apply a pipeline (ordered processor list) to a frame — one chained
    declarative plan; Catalyst collapses the projections into a single
    stage over the scan."""
    for spec in processors:
        df = _apply_one(df, spec)
    return df


def _py_spark_type(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, list):
        if v and all(isinstance(x, (int, float)) and not isinstance(x, bool) for x in v):
            return "array<double>"
        return "array<string>"
    return "string"


def _ctx_script(df: DataFrame, src: str, params: dict | None) -> DataFrame:
    """Painless ``ctx``-mutating script processor. mapInPandas needs a FIXED
    output schema, so it is derived row-independently: a static AST scan
    collects every ctx field the script can assign (including inside
    conditionals — a first-row-only trial would silently drop fields the
    first row doesn't exercise), and a bounded multi-row trial (≤50 rows)
    supplies value types for them. A column is dropped only when the script
    removes it UNCONDITIONALLY (a top-level ``ctx.remove('f')`` statement);
    a conditional remove is encoded as null per row (the columnar
    representation of document absence). Statically-found fields no trial
    row exercised default to string."""
    import pandas as pd

    from ..functions import painless as P

    params = dict(params or {})
    prog = P.compile_painless(src)

    # static over-approximation: ctx.f = / ctx['f'] = targets, literal keys
    assigned: list[str] = []

    def scan(n):
        if not isinstance(n, tuple):
            return
        if n[0] == "assign":
            tgt = n[1]
            if (tgt[0] == "field" and tgt[1] == ("var", "ctx")
                    and tgt[2] not in assigned):
                assigned.append(tgt[2])
            elif (tgt[0] == "index" and tgt[1] == ("var", "ctx")
                    and tgt[2][0] == "lit" and tgt[2][1] not in assigned):
                assigned.append(tgt[2][1])
        for child in n[1:] if isinstance(n, tuple) else ():
            if isinstance(child, tuple):
                scan(child)
            elif isinstance(child, list):
                for c in child:
                    scan(c)

    scan(prog)

    # top-level ctx.remove('f') statements run on every row — safe to drop
    removed_always: set[str] = set()
    if prog[0] == "block":
        for stmt in prog[1]:
            if (isinstance(stmt, tuple) and stmt[0] == "expr"
                    and isinstance(stmt[1], tuple) and stmt[1][0] == "call"
                    and stmt[1][1] == ("var", "ctx") and stmt[1][2] == "remove"
                    and stmt[1][3] and stmt[1][3][0][0] == "lit"):
                removed_always.add(stmt[1][3][0][1])

    sample = df.limit(50).collect()
    if not sample:
        return df
    trial_types: dict[str, str] = {}
    for row in sample:
        trial_ctx = {k: P._clean(v) for k, v in row.asDict(recursive=True).items()}
        before = set(trial_ctx)
        P.execute(prog, {"params": params, "ctx": trial_ctx})
        for k, v in trial_ctx.items():
            if k not in before and k not in trial_types and v is not None:
                trial_types[k] = _py_spark_type(v)

    in_types = dict(df.dtypes)
    added = [k for k in dict.fromkeys(list(trial_types) + assigned)
             if k not in in_types and k not in removed_always]
    out_fields = [(c, in_types[c]) for c in df.columns if c not in removed_always]
    out_fields += [(k, trial_types.get(k, "string")) for k in added]
    schema = ", ".join(f"`{c}` {t}" for c, t in out_fields)
    names = [c for c, _ in out_fields]
    roots = {c: t.split("<")[0] for c, t in out_fields}
    prog_src = src

    def _run(batches):
        prog = P.compile_painless(prog_src)
        for pdf in batches:
            arrays = {c: pdf[c].to_numpy(dtype=object) for c in pdf.columns}
            out: dict[str, list] = {c: [] for c in names}
            for i in range(len(pdf)):
                ctx = {c: P._clean(arrays[c][i]) for c in pdf.columns}
                P.execute(prog, {"params": params, "ctx": ctx})
                for c in names:
                    v = ctx.get(c)
                    out[c].append(v if roots[c] == "array"
                                  else P._coerce(v, roots[c]))
            yield pd.DataFrame(out, columns=names)

    return df.mapInPandas(_run, schema=schema)
