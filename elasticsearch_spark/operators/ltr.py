"""Learning-to-rank rescoring: re-score the top-``window_size`` hits with a
trained regression-tree-ensemble inference model over per-hit feature columns.

Model format mirrors the reference's ml inference trained models:

- ``Tree`` / ``TreeNode`` (``x-pack/plugin/core/src/main/java/org/
  elasticsearch/xpack/core/ml/inference/trainedmodel/tree/Tree.java``,
  ``TreeNode.java``): flat node array; node ``i`` is a leaf when
  ``left_child < 0`` (then ``leaf_value`` applies), otherwise it routes
  ``feature <= threshold`` → ``left_child`` else ``right_child`` (the
  reference's default ``Operator.LTE``; ``lt`` supported too). A null
  feature follows ``default_left``.
- ``Ensemble`` (``.../trainedmodel/ensemble/Ensemble.java``): a list of
  trees combined by ``weighted_sum`` or ``logistic_regression``
  (sigmoid of the weighted sum).

Window semantics follow the reference's rescore framework
(``server/src/main/java/org/elasticsearch/search/rescore/QueryRescorer.java``):
only the top ``window_size`` hits (by base score, doc-id tie-break) are
re-scored and re-sorted among themselves; hits beyond the window keep their
base score and rank after the window.

Spark-first: a tree is COMPILED to a nested ``CASE WHEN`` SQL expression over
the feature columns, so inference is a pure JVM projection inside
whole-stage codegen — no model broadcast, no Python in the scoring path,
identical cost per row regardless of corpus size. The window split is a
rank-window filter; the rescored window is ≤ ``window_size`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compile_tree(tree: dict) -> str:
    """Compile one Tree (``{"feature_names": [...], "tree_structure":
    [node, ...]}``) into a SQL expression string over the feature columns.

    Nodes reference features by index into ``feature_names`` (the reference's
    ``split_feature``) and children by ``node_index``. Null feature values
    route per ``default_left`` (default true, matching ``TreeNode.java``).
    """
    names = tree["feature_names"]
    nodes = {n.get("node_index", i): n for i, n in enumerate(tree["tree_structure"])}

    def emit(idx: int) -> str:
        n = nodes[idx]
        if n.get("left_child", -1) < 0:
            return repr(float(n["leaf_value"]))
        feat = names[n["split_feature"]]
        op = "<" if n.get("decision_type") == "lt" else "<="
        left, right = emit(n["left_child"]), emit(n["right_child"])
        null_side = left if n.get("default_left", True) else right
        return (
            f"(CASE WHEN {feat} IS NULL THEN {null_side} "
            f"WHEN {feat} {op} {n['threshold']!r} THEN {left} "
            f"ELSE {right} END)"
        )

    root = min(nodes)
    return emit(root)


def ensemble_sql(model: dict) -> str:
    """Compile an Ensemble model dict into one SQL expression string.

    ``model`` = ``{"trained_models": [tree, ...], "aggregate_output":
    {"weighted_sum": {"weights": [...]}} | {"logistic_regression":
    {"weights": [...]}}}``. Weights default to 1.0.
    """
    trees = model["trained_models"]
    (kind, body), = model.get(
        "aggregate_output", {"weighted_sum": {}}
    ).items()
    weights = body.get("weights") or [1.0] * len(trees)
    if len(weights) != len(trees):
        raise ValueError("aggregate_output weights length != number of trees")
    total = " + ".join(
        f"({w!r} * {compile_tree(t)})" for w, t in zip(weights, trees)
    )
    if kind == "weighted_sum":
        return f"({total})"
    if kind == "logistic_regression":
        return f"(1.0 / (1.0 + exp(-({total}))))"
    raise ValueError(f"unsupported aggregate_output: {kind}")


def ensemble_col(model: dict) -> Column:
    return F.expr(ensemble_sql(model))


# trained-model registry (PUT _ml/trained_models/{model_id} analog,
# ``x-pack/plugin/core/.../ml/inference/TrainedModelConfig.java``): model_id
# → {"ensemble": {...}} (or a bare ensemble dict). Persisted by Engine when
# registered through the API layer; this dict is the in-process cache.
TRAINED_MODELS: dict[str, dict] = {}


def put_trained_model(model_id: str, definition: dict) -> None:
    TRAINED_MODELS[model_id] = definition


def resolve_trained_model(model: str | dict) -> dict:
    """Accept a model_id (registry lookup) or an inline definition; unwrap
    the ``{"ensemble": ...}`` envelope the reference's definition uses."""
    if isinstance(model, str):
        if model not in TRAINED_MODELS:
            raise KeyError(f"unknown trained model: {model}")
        model = TRAINED_MODELS[model]
    if "ensemble" in model:
        model = model["ensemble"]
    return model


def safe_feature_model(model: dict) -> tuple[dict, dict[str, str]]:
    """Rewrite feature names to SQL-safe placeholders.

    ``compile_tree`` splices feature names verbatim into SQL, so a feature
    like ``load.avg`` would parse as a struct access. Returns a deep-rewritten
    model plus {placeholder: original_feature} to bind columns with."""
    import copy

    model = copy.deepcopy(model)
    mapping: dict[str, str] = {}
    rev: dict[str, str] = {}
    for tree in model["trained_models"]:
        names = tree["feature_names"]
        for i, n in enumerate(names):
            if n not in rev:
                ph = f"__feat{len(rev)}"
                rev[n] = ph
                mapping[ph] = n
            names[i] = rev[n]
    return model, mapping


def ltr_rescore(
    hits: DataFrame,
    model: dict,
    *,
    id_col: str,
    base_score_col: str = "_score",
    window_size: int = 10,
) -> DataFrame:
    """Rescore the top-``window_size`` hits with the ensemble model.

    ``hits`` must already carry the model's feature columns. Returns the
    frame with ``_rescored`` (new score inside the window, base score
    outside) and a deterministic ``_rank``: window rows ordered by model
    score (desc, id asc) ahead of the remaining rows in base order —
    ``QueryRescorer.java``'s contract that rescoring never promotes a hit
    from outside the window.
    """
    # same resolution as the other two inference callers (api.infer /
    # pipeline agg): accept a registered model_id or the {"ensemble": ...}
    # envelope, and rewrite dotted feature names to safe placeholders so
    # "load.avg" doesn't parse as a struct access in the compiled SQL
    model, feat_map = safe_feature_model(resolve_trained_model(model))
    w = Window.orderBy(F.desc(base_score_col), F.asc(id_col))
    ranked = hits.withColumn("_base_rank", F.row_number().over(w))
    for ph, feat in feat_map.items():
        ranked = ranked.withColumn(ph, F.col(f"`{feat}`"))
    in_win = F.col("_base_rank") <= window_size
    scored = ranked.withColumn(
        "_rescored",
        F.when(in_win, ensemble_col(model)).otherwise(
            F.col(base_score_col).cast("double")
        ),
    ).drop(*feat_map)
    w2 = Window.orderBy(
        in_win.cast("int").desc(),
        F.when(in_win, F.col("_rescored")).otherwise(F.lit(None)).desc_nulls_last(),
        F.when(~in_win, F.col("_base_rank")).otherwise(F.lit(None)).asc_nulls_first(),
        F.asc(id_col),
    )
    return scored.withColumn("_rank", F.row_number().over(w2)).drop("_base_rank")
