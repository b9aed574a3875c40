"""lmms-eval task-YAML compatibility loader.

Loads a reference-format task YAML (lmms_eval/api/task.py:605
ConfigurableTask's config surface: `task`, `dataset_path`, `include`,
`doc_to_visual` / `doc_to_text` / `doc_to_target` with `!function`
references, `metric_list`, `generation_kwargs`, `output_type`,
`lmms_eval_specific_kwargs`) and registers it as a native TaskConfig —
so a reference user's custom task directory ports without rewriting
(round-3 VERDICT missing #3).

Semantics honored:
  * `include:` merges a sibling template YAML (child keys win) — the
    reference's `_default_template_*_yaml` pattern.
  * `!function utils.fn` loads `utils.py` NEXT TO the YAML (the
    reference resolves function refs relative to the task dir,
    task.py config loading). Before executing it, minimal compat
    shims for the `lmms_eval` internals task utils commonly import
    (`EvalAIAnswerProcessor` → our byte-parity vqa_norm tables,
    `file_utils.generate_submission_file`, `loguru.logger`) are
    installed into sys.modules IF ABSENT, so self-contained reference
    task dirs import cleanly without the reference package.
  * `doc_to_text`/`doc_to_target` strings: jinja2 templates when they
    contain "{{", else column names (lmms-eval's doc_to_text string
    semantics).
  * `lmms_eval_specific_kwargs.default` (and its older spelling
    `model_specific_prompt_kwargs`) is bound into doc_to_text when the
    function accepts it — reference prompt affixes render identically.
  * `metric_list` → metric_aggregations; process_results output is
    filtered to DECLARED metrics (undeclared keys like `submission`
    become "_"-prefixed bookkeeping, which the evaluator excludes from
    aggregation but keeps in --log_samples).
  * `generation_kwargs.until` → the native `stop` key.
  * `output_type`: generate_until → "generate"; multiple_choice /
    loglikelihood → "loglikelihood" (scored via
    model.loglikelihood_choices).

Dataset resolution: reference YAMLs name HF-hub datasets
(`lmms-lab/VQAv2`) which require egress; pass `dataset_path=` (or set
AURORA_TASK_DATA_<TASKNAME>) to point at local jsonl/json/tsv/HF-dir
data in the native loader's format.
"""

from __future__ import annotations

import importlib.util
import inspect
import os
import sys
import types
from typing import Any, Dict, Optional

from aurora_tpu.eval.api import TaskConfig, register_task


class _FnRef:
    """Marker for a `!function module.attr` YAML value."""

    def __init__(self, spec: str):
        self.spec = spec

    def __repr__(self):
        return f"!function {self.spec}"


def _yaml_loader():
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    _Loader.add_constructor(
        "!function",
        lambda loader, node: _FnRef(loader.construct_scalar(node)))
    return _Loader


# ---------------------------------------------------------------------------
# Compat shims for reference task utils.py imports
# ---------------------------------------------------------------------------

def _install_compat_shims() -> None:
    """sys.modules entries for the lmms_eval internals reference task
    dirs import — only when the real packages are absent."""
    if "loguru" not in sys.modules:
        try:
            import loguru  # noqa: F401
        except ImportError:
            import logging
            m = types.ModuleType("loguru")
            m.logger = logging.getLogger("lmms_compat")
            sys.modules["loguru"] = m
    if "lmms_eval" in sys.modules:
        return
    try:
        import lmms_eval  # noqa: F401
        return
    except ImportError:
        pass
    from aurora_tpu.eval.tasks import vqa_norm

    class EvalAIAnswerProcessor:
        """Reference-compatible processor backed by the byte-parity
        tables in vqa_norm (vqa_eval_metric.py:12-213)."""

        CONTRACTIONS = vqa_norm.CONTRACTIONS
        NUMBER_MAP = vqa_norm.NUMBER_MAP
        ARTICLES = vqa_norm.ARTICLES
        PERIOD_STRIP = vqa_norm.PERIOD_STRIP
        COMMA_STRIP = vqa_norm.COMMA_STRIP
        PUNCTUATIONS = vqa_norm.PUNCTUATIONS

        def __init__(self, *args, **kwargs):
            pass

        word_tokenize = staticmethod(vqa_norm.word_tokenize)
        process_punctuation = staticmethod(vqa_norm.process_punctuation)
        process_digit_article = staticmethod(
            vqa_norm.process_digit_article)

        def __call__(self, item):
            return vqa_norm.eval_ai_process(item)

    def generate_submission_file(file_name, args, subpath="submissions"):
        base = getattr(args, "output_path", None) or os.environ.get(
            "AURORA_EVAL_OUTPUT", ".")
        path = os.path.join(str(base), subpath)
        os.makedirs(path, exist_ok=True)
        return os.path.join(path, file_name)

    root = types.ModuleType("lmms_eval")
    tasks_mod = types.ModuleType("lmms_eval.tasks")
    tu = types.ModuleType("lmms_eval.tasks._task_utils")
    veq = types.ModuleType("lmms_eval.tasks._task_utils.vqa_eval_metric")
    veq.EvalAIAnswerProcessor = EvalAIAnswerProcessor
    fu = types.ModuleType("lmms_eval.tasks._task_utils.file_utils")
    fu.generate_submission_file = generate_submission_file
    root.tasks = tasks_mod
    tasks_mod._task_utils = tu
    tu.vqa_eval_metric = veq
    tu.file_utils = fu
    for name, mod in (("lmms_eval", root), ("lmms_eval.tasks", tasks_mod),
                      ("lmms_eval.tasks._task_utils", tu),
                      ("lmms_eval.tasks._task_utils.vqa_eval_metric", veq),
                      ("lmms_eval.tasks._task_utils.file_utils", fu)):
        sys.modules[name] = mod


_UTILS_CACHE: Dict[str, Any] = {}


def _resolve_fnref(ref: _FnRef, yaml_dir: str):
    """`utils.fn` → attribute of `<yaml_dir>/utils.py` (reference
    semantics); dotted specs resolve left-to-right through the file's
    namespace."""
    parts = ref.spec.split(".")
    path = os.path.join(yaml_dir, parts[0] + ".py")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"!function {ref.spec}: no {parts[0]}.py next to the task "
            f"YAML in {yaml_dir}")
    key = os.path.abspath(path)
    if key not in _UTILS_CACHE:
        _install_compat_shims()
        modname = "aurora_yaml_task_utils_" + str(len(_UTILS_CACHE))
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        _UTILS_CACHE[key] = mod
    obj: Any = _UTILS_CACHE[key]
    for p in parts[1:]:
        obj = getattr(obj, p)
    return obj


# ---------------------------------------------------------------------------
# Field wrappers
# ---------------------------------------------------------------------------

def _materialize_visuals(doc: dict) -> dict:
    """Local-jsonl docs carry PATHS where hub datasets carry PIL images;
    reference doc_to_visual fns call `.convert("RGB")` — load paths into
    PIL first. Video paths stay strings (the native adapters decode
    them host-side)."""
    out = dict(doc)
    root = doc.get("_root", "")
    _IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp")
    for key, val in list(out.items()):
        def _load(v):
            if isinstance(v, str) and v.lower().endswith(_IMG_EXT):
                from PIL import Image
                return Image.open(os.path.join(root, v))
            return v
        if isinstance(val, list):
            out[key] = [_load(v) for v in val]
        else:
            out[key] = _load(val)
    return out


def _visual_out(v):
    import numpy as np
    if v is None or isinstance(v, (str, np.ndarray)):
        return v
    if hasattr(v, "convert"):      # PIL image → frame array
        return np.asarray(v.convert("RGB"))
    return v


def _wrap_visual(fn):
    def w(doc, **_):
        out = fn(_materialize_visuals(doc))
        return [_visual_out(v) for v in out]
    return w


def _wrap_text(fn, spec_kwargs: Optional[dict]):
    params = inspect.signature(fn).parameters
    kw_name = next((n for n in ("lmms_eval_specific_kwargs",
                                "model_specific_prompt_kwargs",
                                "model_specific_kwargs") if n in params),
                   None)

    def w(doc, **_):
        if kw_name and spec_kwargs is not None:
            return fn(doc, **{kw_name: spec_kwargs})
        return fn(doc)
    return w


def _wrap_process_results(fn, declared):
    def w(doc, results):
        out = fn(_materialize_visuals(doc), results)
        keep = {}
        for k, v in out.items():
            if k in declared:
                keep[k] = v
            else:  # bookkeeping (e.g. `submission`) — excluded from
                # aggregation, preserved for --log_samples
                keep["_" + k] = v
        return keep
    return w


def _string_field(s: str):
    if "{{" in s:
        import jinja2
        tmpl = jinja2.Environment(
            undefined=jinja2.Undefined).from_string(s)
        return lambda doc, **_: tmpl.render(**doc)
    return lambda doc, **_: doc[s]


def _read_yaml(path: str) -> dict:
    import yaml
    with open(path) as f:
        raw = yaml.load(f, Loader=_yaml_loader())
    if not isinstance(raw, dict):
        raise ValueError(f"{path}: task YAML must be a mapping")
    inc = raw.pop("include", None)
    if inc:
        base = _read_yaml(os.path.join(os.path.dirname(path), str(inc)))
        base.update(raw)
        raw = base
    return raw


def load_task_yaml(path: str, *, dataset_path: Optional[str] = None,
                   name: Optional[str] = None,
                   register: bool = True) -> TaskConfig:
    """Load one lmms-eval-format task YAML → native TaskConfig.

    dataset_path: local data in the native loader's formats
    (json/jsonl/tsv/HF dir); overrides the YAML's hub reference.
    Falls back to $AURORA_TASK_DATA_<TASK> then the YAML value."""
    path = os.path.abspath(path)
    yaml_dir = os.path.dirname(path)
    raw = _read_yaml(path)

    task_name = name or raw.get("task")
    if not isinstance(task_name, str):
        raise ValueError(
            f"{path}: `task` must be a string (group YAMLs listing "
            "sub-tasks are not runnable directly — load a leaf YAML)")

    data = (dataset_path
            or os.environ.get(
                "AURORA_TASK_DATA_" + task_name.upper().replace("-", "_"))
            or raw.get("dataset_path", ""))

    spec_kwargs = None
    for k in ("lmms_eval_specific_kwargs", "model_specific_prompt_kwargs"):
        if isinstance(raw.get(k), dict):
            spec_kwargs = raw[k].get("default", raw[k])
            break

    def field(key):
        v = raw.get(key)
        if isinstance(v, _FnRef):
            return _resolve_fnref(v, yaml_dir)
        return v

    dtv = field("doc_to_visual")
    dtt = field("doc_to_text")
    dtg = field("doc_to_target")
    dtc = field("doc_to_choice")
    pr = field("process_results")

    metric_aggs: Dict[str, Any] = {}
    for m in raw.get("metric_list", ()) or ():
        agg = m.get("aggregation", "mean")
        if isinstance(agg, _FnRef):
            agg_fn = _resolve_fnref(agg, yaml_dir)

            def agg_wrapped(vals, _fn=agg_fn):
                try:
                    return _fn(vals)
                except TypeError:  # reference (results, args) signature
                    return _fn(vals, None)
            agg = agg_wrapped
        metric_aggs[m["metric"]] = agg

    gen_kwargs = dict(raw.get("generation_kwargs") or {})
    if "until" in gen_kwargs:
        gen_kwargs["stop"] = tuple(gen_kwargs.pop("until") or ())

    out_type = raw.get("output_type", "generate_until")
    output_type = ("loglikelihood"
                   if out_type in ("multiple_choice", "loglikelihood",
                                   "loglikelihood_rolling")
                   else "generate")

    cfg_obj_target = (_string_field(dtg) if isinstance(dtg, str)
                      else (dtg if dtg is not None else lambda d, **_: d))

    if pr is None and metric_aggs:
        # metric_list without process_results: exact_match vs target
        # (lmms-eval's default exact_match path for generate_until)
        def pr_default(doc, results, _aggs=tuple(metric_aggs)):
            pred = str(results[0]).strip().lower()
            tgt = cfg_obj_target(doc)
            tgts = tgt if isinstance(tgt, list) else [tgt]
            hit = float(any(pred == str(t).strip().lower()
                            for t in tgts))
            return {m: hit for m in _aggs}
        pr_wrapped = pr_default
    else:
        pr_wrapped = (_wrap_process_results(pr, set(metric_aggs))
                      if pr is not None else None)

    cfg = TaskConfig(
        name=task_name,
        dataset_path=data,
        doc_to_visual=_wrap_visual(dtv) if callable(dtv) else dtv,
        doc_to_text=(_wrap_text(dtt, spec_kwargs) if callable(dtt)
                     else _string_field(dtt) if isinstance(dtt, str)
                     else dtt),
        doc_to_target=cfg_obj_target,
        doc_to_choice=(dtc if callable(dtc)
                       else _string_field(dtc) if isinstance(dtc, str)
                       else dtc),
        process_results=pr_wrapped,
        metric_aggregations=metric_aggs,
        generation_kwargs=gen_kwargs,
        output_type=output_type,
    )
    if register:
        register_task(cfg)
    return cfg
