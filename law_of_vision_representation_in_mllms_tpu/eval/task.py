"""YAML-configured tasks.

Keeps lmms-eval's task contract (`lmms_eval/api/task.py ConfigurableTask`,
`tasks/__init__.py` registry): a YAML file names the dataset, the
doc->text/visual/target hooks (dotted python paths registered in
`FUNCTION_REGISTRY`, replacing the `!function utils.fn` YAML tag), the
generation kwargs, and the metric/aggregation pair.

Dataset backends are pluggable and hermetic: "json" (local file; list of
dicts, image paths relative to `image_root`) by default, "hf" when the
datasets library + local cache are available. The reference hard-depends on
HF hub downloads (`tasks/mme/mme.yaml:1`), which cannot work offline.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import os
from typing import Any, Callable, Dict, List, Optional

import yaml

from .api import Instance

FUNCTION_REGISTRY: Dict[str, Callable] = {}


def register_function(name: str):
    def deco(fn):
        FUNCTION_REGISTRY[name] = fn
        return fn
    return deco


def _resolve(name_or_path: Optional[str]) -> Optional[Callable]:
    if name_or_path is None:
        return None
    if name_or_path in FUNCTION_REGISTRY:
        return FUNCTION_REGISTRY[name_or_path]
    mod, _, attr = name_or_path.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


@dataclasses.dataclass
class TaskConfig:
    task: str
    dataset_path: str
    dataset_backend: str = "json"
    image_root: str = ""
    split: str = "test"
    output_type: str = "generate_until"         # | loglikelihood
    doc_to_text: Optional[str] = None
    doc_to_visual: Optional[str] = None
    doc_to_target: Optional[str] = None
    process_results: Optional[str] = None
    generation_kwargs: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"max_new_tokens": 16})
    metric: str = "exact_match"
    aggregation: str = "mean"
    limit: Optional[int] = None


class Task:
    def __init__(self, cfg: TaskConfig):
        self.cfg = cfg
        self.name = cfg.task
        self._doc_to_text = _resolve(cfg.doc_to_text)
        self._doc_to_visual = _resolve(cfg.doc_to_visual)
        self._doc_to_target = _resolve(cfg.doc_to_target)
        self._process_results = _resolve(cfg.process_results)
        self.docs = self._load_docs()

    def _load_docs(self) -> List[Dict]:
        cfg = self.cfg
        if cfg.dataset_backend == "json":
            with open(cfg.dataset_path) as f:
                docs = json.load(f)
        elif cfg.dataset_backend == "jsonl":
            with open(cfg.dataset_path) as f:
                docs = [json.loads(line) for line in f if line.strip()]
        elif cfg.dataset_backend == "hf":
            import datasets
            docs = list(datasets.load_dataset(cfg.dataset_path,
                                              split=cfg.split))
        else:
            raise ValueError(cfg.dataset_backend)
        if cfg.limit:
            docs = docs[:cfg.limit]
        return docs

    # ---- document hooks --------------------------------------------------

    def doc_to_text(self, doc: Dict) -> str:
        if self._doc_to_text:
            return self._doc_to_text(doc)
        return doc["question"]

    def doc_to_visual(self, doc: Dict) -> List:
        if self._doc_to_visual:
            return self._doc_to_visual(doc, self.cfg.image_root)
        if "image" in doc:
            from PIL import Image
            return [Image.open(os.path.join(self.cfg.image_root,
                                            doc["image"]))]
        return []

    def doc_to_target(self, doc: Dict) -> Any:
        if self._doc_to_target:
            return self._doc_to_target(doc)
        return doc["answer"]

    def build_requests(self, doc_ids: List[int]) -> List[Instance]:
        out = []
        for i in doc_ids:
            doc = self.docs[i]
            out.append(Instance(
                request_type=self.cfg.output_type, doc=doc, doc_id=i,
                task_name=self.name,
                args=(self.doc_to_text(doc), self.cfg.generation_kwargs),
                visual=self.doc_to_visual(doc)))
        return out

    def process_results(self, doc: Dict, prediction: str) -> Dict:
        """-> {'score': float, ...extra fields for custom aggregation}"""
        if self._process_results:
            return self._process_results(doc, prediction, self)
        from .metrics import METRICS
        metric = METRICS[self.cfg.metric]
        target = self.doc_to_target(doc)
        if isinstance(target, list):
            score = metric(prediction, target)
        else:
            score = metric(prediction, str(target))
        return {"score": score}


def load_task(path_or_cfg, **overrides) -> Task:
    """Load a task from a YAML file path or a dict."""
    if isinstance(path_or_cfg, str):
        with open(path_or_cfg) as f:
            raw = yaml.safe_load(f)
    else:
        raw = dict(path_or_cfg)
    raw.update(overrides)
    fields = {f.name for f in dataclasses.fields(TaskConfig)}
    raw = {k: v for k, v in raw.items() if k in fields}
    return Task(TaskConfig(**raw))
