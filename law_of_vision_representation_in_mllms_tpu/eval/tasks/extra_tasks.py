"""Remaining lmms-eval fork families: CMMMU, MMUPD, MathVerse.

These three use elaborate parsing/judging in the reference; here each is a
compact rule-first port of the deciding logic, with the protocol cited:

- **cmmmu** (`lmms_eval/tasks/cmmmu/utils.py`): Chinese MMMU. Three
  question types — 选择 (multiple choice, lettered (A)-(D)), 判断
  (true/false: 对/错), and fill-in-the-blank — all scored by rule-based
  parsing (the reference uses no GPT here).
- **mmupd** (`lmms_eval/tasks/mmupd/utils.py`): unsolvable-problem
  detection. MC where some questions have NO correct option; credit
  requires answering the masked questions with a refusal / none-of-the-
  above. The reference grades refusals with GPT; here a refusal phrase
  list stands in (documented divergence).
- **mathverse** (`lmms_eval/tasks/mathverse/utils.py`): math with visual
  variants; the reference scores with a GPT extract-then-judge chain
  (`mathverse_evals.py`); here the mathvista rule-first extractor is
  reused with exact/numeric comparison.
"""

from __future__ import annotations

import re

from ..task import register_function
from .mathvista_tasks import extract_answer, normalize_answer

# ---- cmmmu ------------------------------------------------------------------

_CMMMU_LETTERS = "ABCD"


@register_function("cmmmu.doc_to_text")
def cmmmu_doc_to_text(doc):
    """`cmmmu/utils.py:24-52` construct_prompt: options formatted
    (A)-(D) for 选择; bare statement for 判断 / fill-in-blank."""
    q = doc["question"].strip()
    qtype = doc.get("type", "填空")
    if qtype == "选择":
        opts = "".join(f"({c}) {doc[f'option{i}']}\n"
                       for i, c in enumerate(_CMMMU_LETTERS, 1)
                       if doc.get(f"option{i}"))
        return (f"问题: {q}\n选项:\n{opts}"
                "请直接回答选项字母。")
    if qtype == "判断":
        return f"判断题: {q}\n请回答“对”或“错”。"
    return f"问题: {q}\n请直接给出答案。"


@register_function("cmmmu.process_results")
def cmmmu_process_results(doc, prediction, task):
    """Compact port of the deciding rules (`cmmmu/utils.py:219-376`):
    letter extraction (or option-text match) for 选择; 对/错 keyword for
    判断; normalized containment / numeric equality for fill-in-blank."""
    pred = prediction.strip()
    qtype = doc.get("type", "填空")
    answer = str(doc.get("answer", "")).strip()
    if qtype == "选择":
        # parenthesised letter first, then a standalone letter (word
        # boundaries keep 'Based'/'Answer' from matching)
        letters = re.findall(r"\(([A-D])\)", pred) or \
            re.findall(r"\b([A-D])\b", pred)
        got = letters[0] if letters else ""
        if not got:
            for i, c in enumerate(_CMMMU_LETTERS, 1):
                opt = str(doc.get(f"option{i}", "")).strip()
                if opt and opt in pred:
                    got = c
                    break
        return {"score": float(got == answer),
                "category": doc.get("category", "")}
    if qtype == "判断":
        yes = any(k in pred for k in ("对", "正确", "是", "√"))
        no = any(k in pred for k in ("错", "不正确", "不对", "否", "×"))
        got = "对" if yes and not no else ("错" if no else "")
        return {"score": float(got == answer),
                "category": doc.get("category", "")}
    norm = pred.replace(" ", "").replace("。", "").lower()
    ans = answer.replace(" ", "").lower()
    hit = bool(ans) and ans in norm
    if not hit:
        nums_p = re.findall(r"-?\d+(?:\.\d+)?", pred)
        nums_a = re.findall(r"-?\d+(?:\.\d+)?", answer)
        hit = bool(nums_a) and bool(nums_p) and \
            abs(float(nums_p[-1]) - float(nums_a[-1])) < 1e-6
    return {"score": float(hit), "category": doc.get("category", "")}


# ---- mmupd ------------------------------------------------------------------

_REFUSALS = ("none of the above", "no correct answer", "cannot answer",
             "cannot be determined", "not enough information",
             "unanswerable", "no answer", "i don't know",
             "the answer is not", "missing")


@register_function("mmupd.doc_to_text")
def mmupd_doc_to_text(doc):
    """`mmupd/utils.py:43-65`: hint + question + lettered options."""
    opts = "".join(f"{c}. {doc[c]}\n" for c in "ABCDE"
                   if doc.get(c) not in (None, "", "nan"))
    hint = doc.get("hint") or ""
    head = f"{hint}\n{doc['question']}\n" if hint and hint != "nan" \
        else f"{doc['question']}\n"
    return head + opts + \
        "Answer with the option's letter from the given choices directly."


@register_function("mmupd.process_results")
def mmupd_process_results(doc, prediction, task):
    """Dual accuracy: standard questions need the right letter; masked
    (unsolvable — `masked_answer` names the removed option) questions
    need a refusal or the explicit none-of-the-above option. The
    reference delegates refusal detection to GPT
    (`mmupd/utils.py:103-160`); here a phrase list decides."""
    pred = prediction.strip()
    low = pred.lower()
    letters = re.findall(r"\b([A-E])\b", pred)
    got = letters[0] if letters else ""
    answer = str(doc.get("answer", "")).strip()
    masked = str(doc.get("masked_answer", "") or "")
    if masked and masked != "nan":
        # unsolvable variant: credit = refusal, or picking an offered
        # "none of the above" style option
        noa_letter = next(
            (c for c in "ABCDE"
             if any(r in str(doc.get(c, "")).lower() for r in _REFUSALS)),
            "")
        ok = any(r in low for r in _REFUSALS) or \
            (bool(noa_letter) and got == noa_letter)
        return {"score": float(ok), "split": "masked",
                "upd_type": doc.get("type", "")}
    return {"score": float(got == answer), "split": "standard",
            "upd_type": doc.get("type", "")}


def mmupd_dual_accuracy(records):
    """Per-split accuracies + the dual accuracy the benchmark reports
    (a model must handle both the standard and masked variants)."""
    import numpy as np
    out = {}
    for split in ("standard", "masked"):
        vals = [r["score"] for r in records if r["split"] == split]
        out[split] = float(np.mean(vals)) if vals else 0.0
    out["dual"] = min(out["standard"], out["masked"])
    return out


# ---- mathverse --------------------------------------------------------------

@register_function("mathverse.doc_to_text")
def mathverse_doc_to_text(doc):
    # the dataset ships a query_cot / query_wo prompt per problem version
    return doc.get("query_cot") or doc.get("query_wo") or doc["question"]


@register_function("mathverse.process_results")
def mathverse_process_results(doc, prediction, task):
    """Rule-first stand-in for the GPT extract+judge chain
    (`mathverse/mathverse_evals.py`): reuse the mathvista extractor, then
    exact / numeric comparison against `answer`."""
    extraction = extract_answer(prediction, doc)
    # mathverse docs carry no `precision` field, so compare the raw
    # extraction numerically BEFORE mathvista's precision-rounding
    # normalization (round(x, 0) would turn 2.5 into 2)
    answer = str(doc.get("answer", "")).strip()
    ok = str(extraction).strip().lower() == answer.lower()
    if not ok:
        try:
            ok = abs(float(extraction) - float(answer)) < 1e-6
        except (TypeError, ValueError):
            pass
    if not ok and doc.get("precision") is not None:
        norm = normalize_answer(extraction, doc)
        ok = str(norm).strip().lower() == answer.lower()
    return {"score": float(ok), "extraction": extraction,
            "problem_version": doc.get("problem_version", "")}


# ---- olympiadbench ----------------------------------------------------------

@register_function("olympiadbench.doc_to_text")
def olympiadbench_doc_to_text(doc):
    """`olympiadbench/en_utils.py:22-48`: competition preamble + answer-
    type instruction + the \\boxed{} ending convention."""
    subject = doc.get("subfield", "Mathematics")
    mul = bool(doc.get("is_multiple_answer"))
    ans_type = doc.get("answer_type") or "a numeric value"
    if ans_type == "Need_human_evaluate":
        ans_type = "proof based"
    pre = (f"The following is a question from an International {subject} "
           "competition.\n")
    post = (f"The question has multiple answers, each of them should be "
            f"{ans_type}.\n" if mul else
            f"The answer of the question should be {ans_type}.\n")
    post += ("Please calculate the answer according to the given "
             "requirements and the information provided. Please use LaTeX "
             "format to represent the variables and formulas used in the "
             "solution process and results. Please end your solution with ")
    # NOTE: the reference quotes the single-answer ending but NOT the
    # multi-answer one (`en_utils.py:42-45`) — match exactly
    post += ('So the final answer is \\boxed{multiple answers connected '
             'with commas}.\n' if mul else
             '"So the final answer is \\boxed{answer}."\n')
    return pre + doc["question"] + "\n" + post


@register_function("olympiadbench.process_results")
def olympiadbench_process_results(doc, prediction, task):
    """`en_utils.py:51-66`: strip to the segment after 'final answer is',
    then sympy-backed equivalence vs final_answer within the per-problem
    error bound. Proof questions (source contains 'TP') are submission-
    only in the reference; scored 0 here with a flag."""
    from ..math_equivalence import judge
    if "TP" in str(doc.get("source", "")):
        # submission-only in the reference (`en_utils.py:58-60`): no
        # score key, so the mean aggregation excludes it
        return {"proof_only": True}
    pred = prediction.split("final answer is")[-1]
    pred = pred.replace('"', "").replace("\n", "").replace(" ", "") \
               .strip(".").strip("。")
    ans = doc.get("final_answer")
    ans = ans[0] if isinstance(ans, list) else str(ans)
    precision = doc.get("error") or 1e-8
    if isinstance(precision, str):
        try:
            precision = float(precision)
        except ValueError:
            precision = 1e-8
    return {"score": float(judge(pred, ans, precision)),
            "proof_only": False}
