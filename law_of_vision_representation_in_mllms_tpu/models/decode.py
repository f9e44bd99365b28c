"""Chunked greedy decoding: fixed-size in-program scan chunks driven by a
host loop with EOS early exit.

Why a third decode path (alongside `llava.generate_greedy`'s full-length
in-program scan and the benchmarks' per-step host loop):

- At 7B, the full-length scan-over-tokens program exceeds this
  environment's remote compile helper, and a per-step host loop pays the
  axon relay's ~30 ms dispatch latency PER TOKEN (36.4 tok/s measured —
  30% of the param-read roofline, benchmarks/README.md). A chunk of N
  steps compiles like a single step (the scan body is compiled once) while
  amortizing the dispatch latency over N tokens.
- The full-length scan always runs `max_new_tokens` steps even when every
  row hit EOS after five — the host loop here checks an `all(done)` scalar
  between chunks and stops early, which is where most eval wall-clock goes
  (free-form answers are typically 1-30 tokens against max_new=1024
  defaults). The reference's HF `generate` host loop stops early the same
  way (`lmms_eval/models/llava.py:291-440`); this keeps that property
  without paying per-token dispatch.

Numerics are identical to `generate_greedy` by construction: the chunk
scan body is the same embed → forward(cache) → argmax step, split at chunk
boundaries (parity asserted in tests/test_chunked_decode.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.precision import Precision, DEFAULT_PRECISION
from . import layouts as LY
from . import llama as L
from . import llava as M
from .splice import IGNORE_INDEX, splice_plan, splice_embeds


class ChunkedGreedyDecoder:
    """Greedy decode via `chunk`-step jitted scans + a host early-exit loop.

    One instance caches its compiled programs keyed by
    (batch, text_len, gen_cap); reuse it across batches of the same shape
    (the eval adapter holds one per run).
    """

    def __init__(self, params, cfg: M.LlavaConfig, *, eos_id: int,
                 precision: Precision = DEFAULT_PRECISION,
                 chunk: int = 16, diffusion_apply=None,
                 use_flash: Optional[bool] = None,
                 negotiate_layouts: bool = False):
        """With ``negotiate_layouts=True`` the chunk program is compiled
        with AUTO boundary layouts and the params are relaid out ONCE
        into XLA's negotiated formats (consuming the source buffers —
        REQUIRED at 7B, where in-program layout-conversion copies of the
        stacked attention weights otherwise OOM the chip; see
        models/layouts.py). Callers sharing the param tree must re-read
        ``self.params`` after the first generate() call."""
        self.params = params
        self.cfg = cfg
        self.eos_id = eos_id
        self.precision = precision
        self.chunk = chunk
        self.diffusion_apply = diffusion_apply
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        self.use_flash = use_flash
        self.negotiate_layouts = negotiate_layouts
        self._param_formats = None
        self._relaid = False
        self._fns: Dict[Tuple[int, int, int], Tuple] = {}

    # ------------------------------------------------------------------

    def _build(self, b: int, l: int, gen_cap: int):
        cfg, prec = self.cfg, self.precision
        chunk, eos_id = self.chunk, self.eos_id
        l_out = l + cfg.num_patches - 1          # splice.py static length
        diffusion_apply = self.diffusion_apply
        use_flash = self.use_flash

        def prefill(params, ids, mask, pixels):
            plan = splice_plan(ids, jnp.full_like(ids, IGNORE_INDEX), mask,
                               cfg.num_patches)
            img = M.encode_images(params, cfg, pixels, prec,
                                  diffusion_apply)
            txt = L.embed_tokens(params["decoder"], ids, prec)
            embeds = splice_embeds(plan, txt, img)
            cache = L.init_cache(cfg.decoder, b, l_out + gen_cap,
                                 prec.compute_dtype,
                                 quant=cfg.kv_quant)
            slot_valid = jnp.concatenate(
                [plan.attn_mask, jnp.zeros((b, gen_cap), bool)], axis=1)
            h, cache = L.forward(params["decoder"], cfg.decoder, embeds,
                                 plan.positions, attn_mask=slot_valid,
                                 cache=cache, cache_index=0, precision=prec,
                                 use_flash=use_flash)
            n_valid = jnp.sum(plan.attn_mask, axis=1)
            last_idx = jnp.maximum(n_valid - 1, 0)
            h_last = jnp.take_along_axis(h, last_idx[:, None, None],
                                         axis=1)[:, 0]
            logits = L.logits_fn(params["decoder"], h_last[:, None], prec)
            first_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return cache, first_tok, n_valid, plan.attn_mask

        def decode_chunk(params, cache, tok, done, pos, prompt_mask, t0):
            # t0 is TRACED (the chunk's first global decode step): each
            # chunk dispatch differs by value, so the axon relay never
            # serves one from cache (CLAUDE.md bench rule).
            def step(carry, i):
                cache, tok, done, pos = carry
                t = t0 + i
                emb = L.embed_tokens(params["decoder"], tok[:, None], prec)
                gen_slots = jnp.arange(gen_cap) <= t
                sv = jnp.concatenate(
                    [prompt_mask,
                     jnp.broadcast_to(gen_slots, (b, gen_cap))], axis=1)
                h, cache = L.forward(params["decoder"], cfg.decoder, emb,
                                     pos[:, None], attn_mask=sv,
                                     cache=cache, cache_index=l_out + t,
                                     precision=prec)
                logits = L.logits_fn(params["decoder"], h, prec)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                done = done | (tok == eos_id)
                nxt = jnp.where(done, eos_id, nxt)
                return (cache, nxt, done, pos + 1), tok

            (cache, tok, done, pos), toks = lax.scan(
                step, (cache, tok, done, pos), jnp.arange(chunk))
            all_done = jnp.all(done | (tok == eos_id))
            return cache, tok, done, pos, jnp.transpose(toks), all_done

        if not self.negotiate_layouts:
            return (jax.jit(prefill),
                    jax.jit(decode_chunk, donate_argnums=(1,)))

        # AOT with explicit boundary layouts (models/layouts.py): AUTO on
        # the first build, pinned to the negotiated formats thereafter so
        # every shape's programs agree on the one live param layout.
        from jax.experimental.layout import Format, Layout
        p_shapes = LY.shape_spec(self.params)
        cache_s = jax.eval_shape(
            lambda: L.init_cache(cfg.decoder, b, l_out + gen_cap,
                                 prec.compute_dtype,
                                 quant=cfg.kv_quant))
        sds = jax.ShapeDtypeStruct
        tok_s, pos_s = sds((b,), jnp.int32), sds((b,), jnp.int32)
        done_s, pmask_s = sds((b,), jnp.bool_), sds((b, l_out), jnp.bool_)
        t0_s = sds((), jnp.int32)
        p_spec = (self._param_formats if self._param_formats is not None
                  else LY.auto_spec(p_shapes))
        chunk_c = jax.jit(
            decode_chunk, donate_argnums=(1,),
            in_shardings=(p_spec, Format(Layout.AUTO),
                          None, None, None, None, None),
            out_shardings=(Format(Layout.AUTO),
                           None, None, None, None, None),
        ).lower(p_shapes, cache_s, tok_s, done_s, pos_s, pmask_s,
                t0_s).compile()
        p_fmts = chunk_c.input_formats[0][0]
        c_fmts = chunk_c.input_formats[0][1]
        self._param_formats = p_fmts
        ids_s, mask_s = sds((b, l), jnp.int32), sds((b, l), jnp.bool_)
        px_s = list(self._px_spec)
        pre_c = jax.jit(
            prefill,
            in_shardings=(p_fmts, None, None, None),
            out_shardings=(c_fmts, None, None, None),
        ).lower(p_shapes, ids_s, mask_s, px_s).compile()
        return pre_c, chunk_c

    def _get(self, b: int, l: int, gen_cap: int):
        key = (b, l, gen_cap)
        if key not in self._fns:
            self._fns[key] = self._build(b, l, gen_cap)
        return self._fns[key]

    # ------------------------------------------------------------------

    def generate(self, input_ids, text_mask, pixel_values, *,
                 max_new_tokens: int) -> np.ndarray:
        """Returns [B, max_new_tokens] int32 token ids, eos-padded —
        the same contract as `llava.generate_greedy`."""
        b, l = input_ids.shape
        n_chunks = -(-max_new_tokens // self.chunk)
        gen_cap = n_chunks * self.chunk
        input_ids = jnp.asarray(input_ids, jnp.int32)
        text_mask = jnp.asarray(text_mask, bool)
        # per-tower pixel LIST, same contract as generate_greedy — towers
        # may differ in resolution, so never stack into one array
        if not isinstance(pixel_values, (list, tuple)):
            pixel_values = [pixel_values]
        pixel_values = [jnp.asarray(p) for p in pixel_values]
        self._px_spec = [jax.ShapeDtypeStruct(p.shape, p.dtype)
                         for p in pixel_values]
        prefill, decode_chunk = self._get(b, l, gen_cap)
        if self.negotiate_layouts and not self._relaid:
            # one-time: move the live params into the negotiated layouts,
            # consuming the source buffers (peak HBM grows by one leaf)
            self.params = LY.relayout(self.params, self._param_formats,
                                      consume=True)
            self._relaid = True
        cache, tok, n_valid, prompt_mask = prefill(
            self.params, input_ids, text_mask, pixel_values)
        done = jnp.zeros((b,), bool)
        pos = n_valid
        pieces = []
        for c in range(n_chunks):
            cache, tok, done, pos, toks, all_done = decode_chunk(
                self.params, cache, tok, done, pos, prompt_mask,
                jnp.full((), c * self.chunk, jnp.int32))
            pieces.append(toks)
            if bool(all_done):               # scalar fetch; forces execution
                break
        out = np.concatenate([np.asarray(p) for p in pieces], axis=1)
        if out.shape[1] < max_new_tokens:
            pad = np.full((b, max_new_tokens - out.shape[1]), self.eos_id,
                          np.int32)
            out = np.concatenate([out, pad], axis=1)
        return out[:, :max_new_tokens]
