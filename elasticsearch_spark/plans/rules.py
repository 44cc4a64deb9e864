"""Query Rules (x-pack/plugin/ent-search query rules API).

The reference stores named rulesets (``x-pack/plugin/ent-search/src/main/
java/org/elasticsearch/xpack/application/rules/QueryRuleset.java``) of
ordered rules; a ``rule`` query (``RuleQueryBuilder.java``) evaluates each
rule's criteria against the request's ``match_criteria`` on the coordinating
node and rewrites itself to a pinned / excluding query around the organic
query. Same shape here: rule evaluation is driver-side metadata work (a
ruleset is a handful of rows), the rewritten query is the distributed plan.

Criteria types (``QueryRuleCriteria.java``): always, exact, fuzzy
(Levenshtein ≤ 2), prefix, suffix, contains, lt, lte, gt, gte.
Rule types: ``pinned`` (actions.ids / actions.docs rank first, rule order =
pin order) and ``exclude`` (actions' ids are removed from the results).
"""

from __future__ import annotations


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def criterion_matches(crit: dict, match_criteria: dict) -> bool:
    ctype = crit.get("type", "always")
    if ctype == "always":
        return True
    meta = crit.get("metadata")
    if meta is None or meta not in match_criteria:
        return False
    val = match_criteria[meta]
    vals = crit.get("values", [])
    if ctype in ("lt", "lte", "gt", "gte"):
        # the reference matches if ANY listed value satisfies the comparison
        try:
            x = float(val)
        except (TypeError, ValueError):
            return False
        for v in vals:
            try:
                y = float(v)
            except (TypeError, ValueError):
                continue
            if {"lt": x < y, "lte": x <= y, "gt": x > y, "gte": x >= y}[ctype]:
                return True
        return False
    sval = str(val)
    svals = [str(v) for v in vals]
    if ctype == "exact":
        return sval in svals
    if ctype == "fuzzy":
        return any(_lev(sval, v) <= 2 for v in svals)
    if ctype == "prefix":
        return any(sval.startswith(v) for v in svals)
    if ctype == "suffix":
        return any(sval.endswith(v) for v in svals)
    if ctype == "contains":
        return any(v in sval for v in svals)
    raise ValueError(f"unknown query-rule criterion type: {ctype!r}")


def _action_ids(rule: dict) -> list[str]:
    acts = rule.get("actions", {})
    if "ids" in acts:
        return [str(i) for i in acts["ids"]]
    return [str(d["_id"]) for d in acts.get("docs", [])]


def apply_query_rules(query: dict, rulesets: dict[str, list[dict]]) -> dict:
    """Rewrite ``{"rule": {...}}`` → the pinned/excluding organic query
    (RuleQueryBuilder.doRewrite). Rule order across the listed rulesets
    defines pin order; first occurrence of an id wins; exclusions trump
    pins (the reference removes a doc that is both pinned and excluded)."""
    body = query["rule"]
    organic = body["organic"]
    mc = body.get("match_criteria", {})
    ruleset_ids = body.get("ruleset_ids") or [body["ruleset_id"]]
    pinned: list[str] = []
    excluded: list[str] = []
    for rs_id in ruleset_ids:
        if rs_id not in rulesets:
            raise ValueError(f"unknown query ruleset: {rs_id!r}")
        for rule in rulesets[rs_id]:
            if not all(criterion_matches(c, mc) for c in rule.get("criteria", [])):
                continue
            bucket = excluded if rule.get("type") == "exclude" else pinned
            for i in _action_ids(rule):
                if i not in bucket:
                    bucket.append(i)
    pinned = [i for i in pinned if i not in excluded]
    out = organic
    if pinned:
        out = {"pinned": {"ids": pinned, "organic": out}}
    if excluded:
        out = {"bool": {"must": [out], "must_not": [{"ids": {"values": excluded}}]}}
    return out
