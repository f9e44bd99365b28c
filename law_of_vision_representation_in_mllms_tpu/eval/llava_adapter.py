"""Our LLaVA model as an evaluation LMM (`lmms_eval/models/llava.py:54-447`).

- `generate_until`: template-rendered prompts with '<image>' splicing,
  per-tower image preprocessing, shape-bucketed jitted greedy decode.
- `loglikelihood`: continuation logprob + greedy-match flag
  (`models/llava.py:217-283`).
- `dump_image_embeds_for_docs`: the A-score hook as a first-class method —
  saves the post-projector [seq, D_llm] embedding of each doc's image as
  tensor_{i}.npy (the reference requires uncommenting `llava_arch.py:475-476`
  and re-running eval; here it's a flag).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, DEFAULT_PRECISION
from ..data.conversation import Conversation, IMAGE_PLACEHOLDER
from ..data.image_processing import preprocess_image, processor_for_tower
from ..data.preprocess import tokenizer_image_token
from ..models import llama as L
from ..models import llava as M
from ..models.splice import IGNORE_INDEX
from .api import Instance, LMM


def _bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class LlavaLMM(LMM):
    def __init__(self, params, cfg: M.LlavaConfig, tokenizer,
                 template: Conversation, *,
                 precision: Precision = DEFAULT_PRECISION,
                 diffusion_apply=None, batch_size: int = 8,
                 pad_square: bool = False, gen_backend: str = "greedy",
                 decode_chunk: int = 16, draft_len: int = 8,
                 negotiate_layouts: bool = False, sample_seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.template = template
        self.precision = precision
        self.diffusion_apply = diffusion_apply
        self.batch_size = batch_size
        self.pad_square = pad_square
        # decode backend — all three are greedy-equivalent (parity tests
        # in test_chunked_decode.py / test_speculative.py; the eval-score
        # identity is asserted in test_eval_harness.py):
        #   greedy: full-length in-program scan, best at small models
        #   chunked: N-step scan chunks + host EOS early-exit — compiles
        #     at 7B (the full scan exceeds this env's compile helper) and
        #     stops early on short answers
        #   speculative: prompt-lookup drafts, >1 token per weight pass
        if gen_backend not in ("greedy", "chunked", "speculative"):
            raise ValueError(f"unknown gen_backend '{gen_backend}'")
        self.gen_backend = gen_backend
        self.decode_chunk = decode_chunk
        self.draft_len = draft_len
        self.negotiate_layouts = negotiate_layouts
        self._chunked_dec = None
        for e in cfg.tower_spec.entries:
            if e.kind == "feature":
                raise ValueError(
                    "precomputed-feature towers are train-only (the eval "
                    "harness feeds images); evaluate with the real tower "
                    f"instead of {e.name}")
        self.processors = [processor_for_tower(e.name, e.img_size)
                           for e in cfg.tower_spec.entries]
        self._gen_fns: Dict[Tuple, callable] = {}
        # host-side sampling stream (gen_kwargs temperature/top_p — the
        # reference's do_sample routing, lmms_eval/models/llava.py:415-417)
        self._sample_rng = jax.random.PRNGKey(sample_seed)
        self._clamp_checked = False

    # ------------------------------------------------------------------

    def _prompt(self, context: str) -> str:
        """Prepend the image marker ONLY when the context doesn't carry
        one already (`lmms_eval/models/llava.py` image_tokens handling):
        serve-path contexts place '<image>' themselves (one per image
        part), and a second marker would splice garbage — one -200
        sentinel must match one pixel batch."""
        if IMAGE_PLACEHOLDER in context:
            text = context
        else:
            text = IMAGE_PLACEHOLDER + "\n" + context
        return self.template.prompt_for_generation([("human", text)])

    def _pixels(self, requests: List[Instance], pad_to: int = 0):
        """Per-tower preprocessed pixel batches; rows beyond len(requests)
        are zero padding (keeps the jitted batch shape fixed)."""
        b = max(pad_to, len(requests))
        pixels = []
        for proc in self.processors:
            arrs = []
            for r in requests:
                if r.visual:
                    arrs.append(preprocess_image(r.visual[0], proc,
                                                 pad_square=self.pad_square))
                else:
                    arrs.append(np.zeros((proc.crop, proc.crop, 3),
                                         np.float32))
            while len(arrs) < b:
                arrs.append(np.zeros((proc.crop, proc.crop, 3), np.float32))
            pixels.append(jnp.asarray(np.stack(arrs)))
        for r in requests:
            release = getattr(r.visual, "release", None)
            if release:
                release()          # drop decoded PIL data (task.LazyVisual)
        return pixels

    def _encode_batch(self, requests: List[Instance]):
        ids_list = [tokenizer_image_token(self._prompt(r.args[0]), self.tok)
                    for r in requests]
        n = _bucket(max(len(x) for x in ids_list))
        b = len(requests)
        ids = np.zeros((b, n), np.int32)
        mask = np.zeros((b, n), bool)
        for i, x in enumerate(ids_list):
            ids[i, :len(x)] = x
            mask[i, :len(x)] = True
        pixels = self._pixels(requests)
        self._maybe_clamp_guard(pixels)
        return jnp.asarray(ids), jnp.asarray(mask), pixels

    def _uses_expclamp(self) -> bool:
        from ..models.diffusion_blocks import current_attn_impl
        for e in self.cfg.tower_spec.entries:
            vc = getattr(e, "vit_config", None)
            if vc is not None and \
                    str(vc.attn_impl).startswith("xla_expclamp"):
                return True
        if self.diffusion_apply is not None:
            di = current_attn_impl() or ""
            # "auto" routes short-seq diffusion attention to the fused
            # no-max softmax too (models/diffusion_blocks._attn)
            if di.startswith("xla_expclamp") or di == "auto":
                return True
        return False

    def _maybe_clamp_guard(self, pixels):
        """First-batch logit-headroom check for the fused no-max softmax
        production defaults (ops/clamp_guard.py, VERDICT r3 #5): one
        extra tower-only forward per process validates this checkpoint's
        attention logits stay clear of the expclamp clamp. Raises for
        out-of-range checkpoints; LVR_CLAMP_GUARD=0 bypasses."""
        if self._clamp_checked:
            return
        self._clamp_checked = True
        from ..ops import clamp_guard
        if not (clamp_guard.guard_enabled() and self._uses_expclamp()):
            return
        clamp_guard.check_clamp_headroom(
            lambda *px: M.encode_images(self.params, self.cfg, list(px),
                                        self.precision,
                                        self.diffusion_apply),
            *pixels, label="tower encode (first batch)")

    def _gen_fn(self, seq_len: int, max_new: int,
                sampling: bool = False, num_beams: int = 1):
        # cache key is STRUCTURAL only (backend, shapes, sampling-bool,
        # beams): temperature/top_p enter the sampling program as traced
        # scalars, so a client sweeping temperature reuses one compiled
        # program instead of paying a remote compile per value (5-10 min
        # worst case through the axon relay, CLAUDE.md)
        key = (self.gen_backend, seq_len, max_new, sampling, num_beams)
        if key not in self._gen_fns:
            if num_beams > 1:
                # deterministic beam search (HF's beam-sample hybrid is
                # out of scope — beams win over temperature, documented)
                def fn(params, ids, mask, pixels):
                    return M.generate_beam(
                        params, self.cfg, ids, mask, pixels,
                        max_new_tokens=max_new,
                        eos_id=self.tok.eos_token_id,
                        num_beams=num_beams, precision=self.precision,
                        diffusion_apply=self.diffusion_apply)
                self._gen_fns[key] = jax.jit(fn)
            elif sampling:
                # sampling rides the full-graph generate regardless of
                # gen_backend (chunked/speculative are greedy machinery;
                # the reference likewise switches on do_sample —
                # lmms_eval/models/llava.py:415); temperature/top_p are
                # traced operands (sampling.sample_token handles them)
                def fn(params, ids, mask, pixels, rng, temperature, top_p):
                    return M.generate_sample(
                        params, self.cfg, ids, mask, pixels,
                        max_new_tokens=max_new,
                        eos_id=self.tok.eos_token_id, rng=rng,
                        temperature=temperature, top_p=top_p,
                        precision=self.precision,
                        diffusion_apply=self.diffusion_apply)
                self._gen_fns[key] = jax.jit(fn)
            elif self.gen_backend == "chunked":
                if self._chunked_dec is None:
                    from ..models.decode import ChunkedGreedyDecoder
                    self._chunked_dec = ChunkedGreedyDecoder(
                        self.params, self.cfg,
                        eos_id=self.tok.eos_token_id,
                        precision=self.precision,
                        chunk=self.decode_chunk,
                        diffusion_apply=self.diffusion_apply,
                        negotiate_layouts=self.negotiate_layouts)
                dec = self._chunked_dec

                def fn(params, ids, mask, pixels):
                    out = dec.generate(ids, mask, pixels,
                                       max_new_tokens=max_new)
                    if dec.params is not self.params:
                        # negotiated relayout consumed the old buffers;
                        # every other path must use the relaid tree
                        self.params = dec.params
                    return out
                self._gen_fns[key] = fn          # host loop — not jitted
            elif self.gen_backend == "speculative":
                def fn(params, ids, mask, pixels):
                    toks, _rounds = M.generate_speculative(
                        params, self.cfg, ids, mask, pixels,
                        max_new_tokens=max_new,
                        eos_id=self.tok.eos_token_id,
                        draft_len=self.draft_len,
                        precision=self.precision,
                        diffusion_apply=self.diffusion_apply)
                    return toks
                self._gen_fns[key] = jax.jit(fn)
            else:
                def fn(params, ids, mask, pixels):
                    return M.generate_greedy(
                        params, self.cfg, ids, mask, pixels,
                        max_new_tokens=max_new,
                        eos_id=self.tok.eos_token_id,
                        precision=self.precision,
                        diffusion_apply=self.diffusion_apply)
                self._gen_fns[key] = jax.jit(fn)
        return self._gen_fns[key]

    def generate_until(self, requests: List[Instance]) -> List[str]:
        out: List[str] = []
        for s in range(0, len(requests), self.batch_size):
            chunk = requests[s:s + self.batch_size]
            n_real = len(chunk)
            # pad the tail chunk to the jitted batch size (a smaller final
            # batch would trigger one extra compilation)
            chunk = chunk + [chunk[-1]] * (self.batch_size - n_real)
            ids, mask, pixels = self._encode_batch(chunk)
            kwargs = chunk[0].args[1]
            max_new = kwargs.get("max_new_tokens", 16)
            # reference contract: do_sample iff temperature > 0
            # (lmms_eval/models/llava.py:391-417); top_p None = 1.0
            temperature = float(kwargs.get("temperature", 0) or 0)
            if not kwargs.get("do_sample", True):
                temperature = 0.0
            # top_p None -> 1.0, but an explicit 0.0 is honored
            # (near-greedy nucleus: top_p_mask keeps the top token only)
            top_p = (1.0 if kwargs.get("top_p") is None
                     else float(kwargs["top_p"]))
            num_beams = int(kwargs.get("num_beams", 1) or 1)
            if num_beams > 1:
                temperature = 0.0      # beam search is deterministic here
            fn = self._gen_fn(ids.shape[1], max_new, temperature > 0,
                              num_beams)
            if temperature > 0:
                self._sample_rng, k = jax.random.split(self._sample_rng)
                toks = fn(self.params, ids, mask, pixels, k,
                          temperature, top_p)
            else:
                toks = fn(self.params, ids, mask, pixels)
            toks = np.asarray(toks)[:n_real]
            until = chunk[0].args[1].get("until", [])
            for row in toks:
                row = row.tolist()
                if self.tok.eos_token_id in row:
                    row = row[:row.index(self.tok.eos_token_id)]
                text = self.tok.decode(row).strip()
                # stop-string truncation (KeywordsStoppingCriteria /
                # lmms-eval "until" semantics, `mm_utils.py:122-156`)
                for stop in until:
                    if stop and stop in text:
                        text = text.split(stop)[0]
                out.append(text.strip())
        return out

    def _ll_fn(self, seq_len: int, k_max: int):
        """Jitted batched loglikelihood for one (total-length, cont-length)
        bucket. The round-1 path ran one UN-jitted full forward per request
        with a fresh shape every time — every distinct (ctx+cont) length
        recompiled the decoder (VERDICT r1). The reference batches
        (`lmms_eval/models/llava.py:217-283`); here requests additionally
        bucket to power-of-two shapes so a mixed-length MC run compiles a
        handful of programs, not hundreds."""
        key = ("ll", seq_len, k_max)
        if key not in self._gen_fns:
            from ..models.splice import splice_plan, splice_embeds

            def fn(params, ids, mask, tgt, klen, pixels):
                plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX),
                                   mask, self.cfg.num_patches)
                img = M.encode_images(params, self.cfg, pixels,
                                      self.precision, self.diffusion_apply)
                txt = L.embed_tokens(params["decoder"], ids, self.precision)
                embeds = splice_embeds(plan, txt, img)
                h, _ = L.forward(params["decoder"], self.cfg.decoder,
                                 embeds, plan.positions,
                                 attn_mask=plan.attn_mask,
                                 precision=self.precision)
                # continuation tokens are the LAST klen valid positions of
                # each (right-padded) row; their logits sit one position
                # earlier (next-token convention). Gather hidden states
                # BEFORE the lm_head: full-sequence fp32 logits would be
                # [B, L_out, 32000] (~400 MB at 7B eval shapes) for k_max
                # useful rows
                n_valid = jnp.sum(plan.attn_mask, axis=1)
                base = n_valid - klen - 1
                idx = jnp.clip(base[:, None] + jnp.arange(k_max)[None],
                               0, h.shape[1] - 1)
                h_sel = jnp.take_along_axis(h, idx[..., None], axis=1)
                logits = L.logits_fn(params["decoder"], h_sel,
                                     self.precision)
                rows = jax.nn.log_softmax(logits, axis=-1)   # [B,k_max,V]
                tok_lp = jnp.take_along_axis(rows, tgt[..., None],
                                             axis=-1)[..., 0]
                jmask = jnp.arange(k_max)[None] < klen[:, None]
                sum_lp = jnp.sum(jnp.where(jmask, tok_lp, 0.0), axis=1)
                greedy = jnp.all(
                    jnp.where(jmask, jnp.argmax(rows, axis=-1) == tgt, True),
                    axis=1)
                return sum_lp, greedy
            self._gen_fns[key] = jax.jit(fn)
        return self._gen_fns[key]

    def loglikelihood(self, requests: List[Instance]
                      ) -> List[Tuple[float, bool]]:
        n = len(requests)
        enc = []
        for r in requests:
            ctx_ids = tokenizer_image_token(self._prompt(r.args[0]),
                                            self.tok)
            cont_ids = list(self.tok.encode(r.args[1],
                                            add_special_tokens=False))
            enc.append((ctx_ids, cont_ids))
        # sort by total length so same-bucket requests batch together
        order = sorted(range(n),
                       key=lambda i: len(enc[i][0]) + len(enc[i][1]))
        out: List[Optional[Tuple[float, bool]]] = [None] * n
        bs = self.batch_size
        for s in range(0, n, bs):
            sel = order[s:s + bs]
            tot = _bucket(max(len(enc[i][0]) + len(enc[i][1])
                              for i in sel))
            kmax = _bucket(max(len(enc[i][1]) for i in sel), minimum=8)
            ids = np.zeros((bs, tot), np.int32)
            mask = np.zeros((bs, tot), bool)
            tgt = np.zeros((bs, kmax), np.int32)
            klen = np.zeros((bs,), np.int32)
            for row, i in enumerate(sel):
                full = enc[i][0] + enc[i][1]
                ids[row, :len(full)] = full
                mask[row, :len(full)] = True
                tgt[row, :len(enc[i][1])] = enc[i][1]
                klen[row] = len(enc[i][1])
            pixels = self._pixels([requests[i] for i in sel], pad_to=bs)
            sum_lp, greedy = self._ll_fn(tot, kmax)(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(tgt), jnp.asarray(klen), pixels)
            sum_lp, greedy = np.asarray(sum_lp), np.asarray(greedy)
            for row, i in enumerate(sel):
                out[i] = (float(sum_lp[row]), bool(greedy[row]))
        return out

    # ------------------------------------------------------------------

    def dump_image_embeds_for_docs(self, requests: List[Instance],
                                   out_dir: str, limit: int = 100) -> int:
        """A-score embedding dump (`A_score/compute.py` protocol: first
        `limit` docs, post-projector embeddings, 1-indexed files)."""
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for r in requests[:limit]:
            _, _, pixels = self._encode_batch([r])
            emb = M.dump_image_embeds(self.params, self.cfg, pixels,
                                      self.precision, self.diffusion_apply)
            np.save(os.path.join(out_dir, f"tensor_{n + 1}.npy"),
                    np.asarray(emb[0], np.float32))
            n += 1
        return n
