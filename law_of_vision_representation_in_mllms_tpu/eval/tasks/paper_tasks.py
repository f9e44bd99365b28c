"""Doc hooks for the 8 paper benchmarks (README.md Table / SURVEY §6.1).

Each benchmark's prompt format and scoring follows the lmms-eval task
implementations the reference forks (`lmms_eval/tasks/<name>/{*.yaml,
utils.py}`):

- mme: yes/no questions, "Answer the question using a single word or
  phrase."; per-category acc + acc+ summed (utils.mme_aggregate_results).
- mmbench_en / scienceqa_img / seed_image / mmmu_val: multiple choice with
  lettered options, "Answer with the option's letter from the given choices
  directly."
- ok_vqa / vizwiz_vqa_val / textvqa_val: open VQA with the VQA-v2 soft
  accuracy over 10 annotator answers; vizwiz adds the 'Unanswerable' hint.

Datasets are local JSON (see Task docstring) with fields noted per hook.
"""

from __future__ import annotations

import os
from typing import Dict, List

from ..metrics import (exact_match, parse_multi_choice, vqa_accuracy)
from ..task import register_function

MC_SUFFIX = ("Answer with the option's letter from the given choices "
             "directly.")
WORD_SUFFIX = "Answer the question using a single word or phrase."
LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _image_loader(doc: Dict, image_root: str) -> List:
    if not doc.get("image"):
        return []
    from PIL import Image
    return [Image.open(os.path.join(image_root, doc["image"]))]


register_function("common.doc_to_visual")(_image_loader)


# ---- MME -------------------------------------------------------------------

@register_function("mme.doc_to_text")
def mme_doc_to_text(doc):
    # mme questions already end with the instruction in the source data;
    # add it when absent (lmms_eval/tasks/mme/utils.py doc_to_text)
    q = doc["question"].strip()
    if WORD_SUFFIX not in q:
        q = f"{q}\n{WORD_SUFFIX}"
    return q


@register_function("mme.process_results")
def mme_process_results(doc, prediction, task):
    pred = prediction.strip().lower().rstrip(".")
    ans = doc["answer"].strip().lower()
    if pred.startswith("yes"):
        pred = "yes"
    elif pred.startswith("no"):
        pred = "no"
    correct = pred == ans
    return {"score": float(correct), "correct": correct,
            "category": doc["category"],
            "image_id": doc.get("image_id", doc.get("image", ""))}


# ---- multiple choice --------------------------------------------------------

def _mc_text(doc):
    opts = doc["options"]
    lines = [doc["question"].strip()]
    if doc.get("hint"):
        lines.insert(0, doc["hint"].strip())
    for i, o in enumerate(opts):
        lines.append(f"{LETTERS[i]}. {o}")
    lines.append(MC_SUFFIX)
    return "\n".join(lines)


def _mc_results(doc, prediction, task):
    letter = parse_multi_choice(prediction, doc["options"],
                                LETTERS[:len(doc["options"])])
    target = doc["answer"].strip().upper()
    if target not in LETTERS[:len(doc["options"])]:
        # answer given as option text
        target = LETTERS[doc["options"].index(doc["answer"])]
    return {"score": float(letter == target), "parsed": letter,
            "target": target}


for _name in ("mmbench_en", "mmmu_val", "scienceqa_img", "seed_image"):
    register_function(f"{_name}.doc_to_text")(_mc_text)
    register_function(f"{_name}.process_results")(_mc_results)


# ---- open VQA ---------------------------------------------------------------

@register_function("vqa.doc_to_text")
def vqa_doc_to_text(doc):
    return f"{doc['question'].strip()}\n{WORD_SUFFIX}"


@register_function("vizwiz.doc_to_text")
def vizwiz_doc_to_text(doc):
    return (f"{doc['question'].strip()}\nWhen the provided information is "
            "insufficient, respond with 'Unanswerable'.\n" + WORD_SUFFIX)


@register_function("vqa.process_results")
def vqa_process_results(doc, prediction, task):
    answers = doc["answers"]
    return {"score": vqa_accuracy(prediction, answers)}


@register_function("gqa.process_results")
def gqa_process_results(doc, prediction, task):
    # GQA: single ground-truth answer, exact match after the m4c
    # normalization (`lmms_eval/tasks/gqa/utils.py`)
    from ..metrics import vqa_normalize
    pred = vqa_normalize(prediction)
    ans = vqa_normalize(str(doc["answer"]))
    return {"score": float(pred == ans)}


# ---- POPE (object-hallucination probing; `llava/eval/model_pope_dist.py`,
# `eval_pope.py` + lmms_eval/tasks/pope) ----------------------------------

@register_function("pope.doc_to_text")
def pope_doc_to_text(doc):
    return f"{doc['question'].strip()}\n{WORD_SUFFIX}"


@register_function("pope.process_results")
def pope_process_results(doc, prediction, task):
    pred = prediction.strip().lower().rstrip(".")
    pred = "yes" if pred.startswith("yes") else (
        "no" if pred.startswith("no") else pred)
    ans = doc["answer"].strip().lower()
    return {"score": float(pred == ans), "pred_yes": pred == "yes",
            "gt_yes": ans == "yes"}


@register_function("pope.aggregate")
def pope_aggregate(records):
    """accuracy/precision/recall/F1/yes-ratio (`eval_pope.py` semantics);
    the scalar value reported is the F1 score."""
    tp = sum(r["pred_yes"] and r["gt_yes"] for r in records)
    fp = sum(r["pred_yes"] and not r["gt_yes"] for r in records)
    fn = sum(not r["pred_yes"] and r["gt_yes"] for r in records)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return f1
