"""Eval model registry (`lmms_eval/api/registry.py` + the per-model adapter
zoo `lmms_eval/models/`).

Our LMM interface is pluggable like lmms-eval's: `register_lmm` adds a
builder keyed by name; `build_lmm_by_name("llava", ...)` resolves it. The
"llava" entry is this framework's model; "hf-vision2seq" wraps any local HF
vision2seq checkpoint via torch (host CPU) — the generic stand-in for the
reference's fuyu/idefics2/instructblip/qwen_vl adapters, all of which
evaluate THIRD-PARTY torch models rather than anything reference-built.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from .api import Instance, LMM

LMM_REGISTRY: Dict[str, Callable] = {}


def register_lmm(name: str):
    def deco(builder):
        LMM_REGISTRY[name] = builder
        return builder
    return deco


def build_lmm_by_name(name: str, **kwargs) -> LMM:
    if name not in LMM_REGISTRY:
        raise KeyError(f"unknown LMM '{name}'; have {sorted(LMM_REGISTRY)}")
    return LMM_REGISTRY[name](**kwargs)


@register_lmm("llava")
def _build_llava(**kwargs) -> LMM:
    from .llava_adapter import LlavaLMM
    return LlavaLMM(**kwargs)


@register_lmm("hf-vision2seq")
class HFVision2SeqLMM(LMM):
    """Generic HF adapter: local AutoModelForVision2Seq + AutoProcessor
    (torch CPU). Network-free: pass a local snapshot path."""

    def __init__(self, pretrained: str, max_new_tokens: int = 16, **_):
        import torch
        from transformers import AutoModelForVision2Seq, AutoProcessor
        self.processor = AutoProcessor.from_pretrained(pretrained)
        self.model = AutoModelForVision2Seq.from_pretrained(
            pretrained, torch_dtype=torch.float32).eval()
        self.max_new_tokens = max_new_tokens

    def generate_until(self, requests: List[Instance]) -> List[str]:
        import torch
        out = []
        for r in requests:
            inputs = self.processor(
                text=r.args[0], images=r.visual[0] if r.visual else None,
                return_tensors="pt")
            with torch.no_grad():
                ids = self.model.generate(
                    **inputs,
                    max_new_tokens=r.args[1].get("max_new_tokens",
                                                 self.max_new_tokens))
            text = self.processor.batch_decode(
                ids[:, inputs["input_ids"].shape[1]:],
                skip_special_tokens=True)[0]
            out.append(text.strip())
        return out

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """Continuation logprob + greedy-match flag, lm-eval convention:
        the continuation tokens are `enc(ctx+cont)[len(enc(ctx)):]` — the
        SUFFIX of the joint encoding, not an independent `enc(cont)`
        (BPE can merge across the boundary; the reference slices the same
        way, `lmms_eval/models/llava.py:217-283`)."""
        import torch
        tok = getattr(self.processor, "tokenizer", self.processor)
        out = []
        for r in requests:
            ctx, cont = r.args[0], r.args[1]
            ctx_ids = tok(ctx)["input_ids"]
            full_ids = tok(ctx + cont)["input_ids"]
            cont_ids = full_ids[len(ctx_ids):]
            inputs = self.processor(
                text=ctx + cont,
                images=r.visual[0] if r.visual else None,
                return_tensors="pt")
            k = len(cont_ids)
            with torch.no_grad():
                logits = self.model(**inputs).logits
            lp = torch.log_softmax(logits[0, -k - 1:-1].float(), dim=-1)
            tgt = torch.tensor(cont_ids, dtype=torch.long)
            token_lp = lp.gather(1, tgt[:, None])[:, 0]
            greedy = bool((lp.argmax(-1) == tgt).all())
            out.append((float(token_lp.sum()), greedy))
        return out
